"""Tombstone deletes: query-time masking, service refresh, and the
compaction purge (physical removal + stats rebuild)."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index, delete_docs
from vframe_ray.index.compact import compact_index
from vframe_ray.index.query import (QueryService, facet_counts_index,
                                    match_counts_index,
                                    phrase_search_index, search_index)

ROWS = [
    {"conv_id": "c0", "turn_idx": 0, "text": "apple banana apple", "lang": "en"},
    {"conv_id": "c1", "turn_idx": 0, "text": "apple cherry", "lang": "de"},
    {"conv_id": "c2", "turn_idx": 0, "text": "banana cherry apple", "lang": "en"},
    {"conv_id": "c3", "turn_idx": 0, "text": "cherry durian", "lang": "fr"},
    {"conv_id": "c4", "turn_idx": 0, "text": "apple banana", "lang": "en"},
]


def _build(tmp_path, name, rows=ROWS):
    idx = str(tmp_path / name)
    build_index(ray.data.from_items(rows), idx, SMALL_CFG,
                attribute_cols=["lang"])
    return idx


def test_tombstones_mask_every_query_path(ray_session, tmp_path):
    idx = _build(tmp_path, "del_idx")
    q = [{"query_id": 0, "query_text": "apple banana", "k": 10}]
    before = search_index(idx, q)
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search(q).to_pylist() == before.to_pylist()

        delete_docs(idx, ["c0", "c2"])
        after = search_index(idx, q)
        hit_convs = {r["conv_id"] for r in after.to_pylist()}
        assert hit_convs == {"c1", "c4"}
        # stats stay pre-delete: surviving docs keep their old scores
        before_scores = {r["conv_id"]: r["score"]
                         for r in before.to_pylist()}
        for r in after.to_pylist():
            assert r["score"] == before_scores[r["conv_id"]]

        # phrase / facets / counts also mask
        ph = phrase_search_index(idx, [{"query_id": 0,
                                        "phrase": "banana cherry"}])
        assert ph.num_rows == 0                 # only c2 had the phrase
        fc = facet_counts_index(idx, [{"query_id": 0,
                                       "query_text": "apple"}], "lang")
        assert {(r["facet"], r["n"]) for r in fc.to_pylist()} == \
            {("de", 1), ("en", 1)}
        mc = match_counts_index(idx, [{"query_id": 0,
                                       "query_text": "apple"}])
        assert mc.to_pylist() == [{"query_id": 0, "n": 2}]

        # resident service still sees pre-delete state until refreshed
        assert {r["conv_id"] for r in svc.search(q).to_pylist()} \
            >= {"c0", "c2"}
        assert svc.refresh_deletes() == 2
        assert svc.search(q).to_pylist() == after.to_pylist()
    finally:
        svc.shutdown()

    # idempotent re-delete
    assert delete_docs(idx, ["c0"])["n_deleted_docs"] == 0


def test_compaction_purges_and_rebuilds_stats(ray_session, tmp_path):
    idx = _build(tmp_path, "purge_idx")
    delete_docs(idx, ["c0", "c3"])
    out = str(tmp_path / "purge_out")
    compact_index(idx, out, target_segments=2)

    fresh = _build(tmp_path, "fresh_idx",
                   [r for r in ROWS if r["conv_id"] not in ("c0", "c3")])
    for qt in ("apple banana", "cherry", "apple", "durian"):
        q = [{"query_id": 0, "query_text": qt, "k": 10}]
        got = search_index(out, q)
        want = search_index(fresh, q)
        assert got.to_pylist() == want.to_pylist(), qt
    # facet counts over the purged index match the fresh build too
    fq = [{"query_id": 0, "query_text": "apple banana cherry"}]
    assert facet_counts_index(out, fq, "lang").to_pylist() == \
        facet_counts_index(fresh, fq, "lang").to_pylist()
