"""Faceted search counts over a planted attributed corpus."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import facet_counts_index


def test_facet_counts(ray_session, tmp_path):
    rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "apple banana", "lang": "en"},
        {"conv_id": "c1", "turn_idx": 0, "text": "apple cherry", "lang": "de"},
        {"conv_id": "c2", "turn_idx": 0, "text": "banana cherry", "lang": "en"},
        {"conv_id": "c3", "turn_idx": 0, "text": "cherry durian", "lang": "fr"},
        {"conv_id": "c4", "turn_idx": 0, "text": "apple apple", "lang": "en"},
    ]
    idx = str(tmp_path / "facet_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG,
                attribute_cols=["lang"])

    res = facet_counts_index(idx, [
        {"query_id": 0, "query_text": "apple"},         # c0 c1 c4
        {"query_id": 1, "query_text": "banana durian"},  # c0 c2 c3
        {"query_id": 2, "query_text": "zzz"},            # none
    ], "lang")
    got = {(r["query_id"], r["facet"]): r["n"] for r in res.to_pylist()}
    assert got == {(0, "en"): 2, (0, "de"): 1,
                   (1, "en"): 2, (1, "fr"): 1}

    # predicate composes: only en docs counted
    res2 = facet_counts_index(idx, [{"query_id": 0, "query_text": "apple"}],
                              "lang", predicates=["lang == en"])
    assert {(r["query_id"], r["facet"]): r["n"] for r in res2.to_pylist()} \
        == {(0, "en"): 2}
