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


def test_facet_ranges_and_service_parity(ray_session, tmp_path):
    """Range facets: doc-length bins over the match set; hand-checked
    counts and one-shot == service."""
    import ray.data

    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import QueryService, facet_ranges_index

    rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "apple"},            # dl 1
        {"conv_id": "c1", "turn_idx": 0, "text": "apple b c d"},      # dl 4
        {"conv_id": "c2", "turn_idx": 0, "text": "apple b c d e"},    # dl 5
        {"conv_id": "c3", "turn_idx": 0, "text": "cherry x"},         # dl 2
    ]
    idx = str(tmp_path / "franges_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "apple"},
          {"query_id": 1, "query_text": "cherry zzz"}]
    got = facet_ranges_index(idx, qs, bin_width=4)
    assert got.to_pylist() == [
        {"query_id": 0, "bin_lo": 0, "n": 1},   # dl 1
        {"query_id": 0, "bin_lo": 4, "n": 2},   # dl 4, 5
        {"query_id": 1, "bin_lo": 0, "n": 1},   # dl 2
    ]
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.facet_ranges(qs, bin_width=4).to_pylist() == \
            got.to_pylist()
    finally:
        svc.shutdown()


def test_facet_stats_and_service_parity(ray_session, tmp_path):
    """count + mean doc length per facet over the full match set; the
    served path returns the identical table."""
    from vframe_ray.index.query import QueryService, facet_stats_index
    rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "apple banana",
         "lang": "en"},                                   # dl 2
        {"conv_id": "c1", "turn_idx": 0, "text": "apple cherry kiwi",
         "lang": "de"},                                   # dl 3
        {"conv_id": "c2", "turn_idx": 0, "text": "banana", "lang": "en"},
        {"conv_id": "c3", "turn_idx": 0, "text": "apple a b c d e",
         "lang": "en"},                                   # dl 6
    ]
    idx = str(tmp_path / "fstats_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG,
                attribute_cols=["lang"])
    qs = [{"query_id": 0, "query_text": "apple"},
          {"query_id": 1, "query_text": "banana"},
          {"query_id": 2, "query_text": "zzz"}]
    got = facet_stats_index(idx, qs, "lang")
    rowso = {(r["query_id"], r["facet"]): (r["n"], r["avg_dl"])
             for r in got.to_pylist()}
    # apple: en -> c0(2) + c3(6) = n2 avg4; de -> c1(3)
    assert rowso == {(0, "en"): (2, 4.0), (0, "de"): (1, 3.0),
                     (1, "en"): (2, (2 + 1) / 2)}
    svc = QueryService(idx)
    try:
        assert svc.facet_stats(qs, "lang").to_pylist() == got.to_pylist()
    finally:
        svc.shutdown()
