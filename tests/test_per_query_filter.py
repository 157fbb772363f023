"""Per-query attribute filters (filter-context-per-request): each
query's "filter" list must behave exactly like running that query alone
with a global predicate, without disturbing unfiltered batch-mates;
service and mixed-batch parity; composition with a global predicate."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import QueryService, search_index

ROWS = [
    {"conv_id": "c0", "turn_idx": 0, "text": "alpha beta", "lang": "en"},
    {"conv_id": "c1", "turn_idx": 0, "text": "alpha beta beta",
     "lang": "de"},
    {"conv_id": "c2", "turn_idx": 0, "text": "alpha gamma", "lang": "en"},
    {"conv_id": "c3", "turn_idx": 0, "text": "alpha", "lang": "fr"},
    {"conv_id": "c4", "turn_idx": 0, "text": "beta beta", "lang": "de"},
]


def _mk(tmp_path, name):
    idx = str(tmp_path / name)
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG,
                attribute_cols=["lang"])
    return idx


def test_per_query_filter_equals_global_predicate(ray_session,
                                                  tmp_path):
    idx = _mk(tmp_path, "pqf_idx")
    batch = search_index(idx, [
        {"query_id": 0, "query_text": "alpha beta", "k": 10,
         "filter": ["lang == en"]},
        {"query_id": 1, "query_text": "alpha beta", "k": 10,
         "filter": ["lang == de"]},
        {"query_id": 2, "query_text": "alpha beta", "k": 10},
    ]).to_pandas()
    for qid, preds in ((0, ["lang == en"]), (1, ["lang == de"]),
                       (2, None)):
        alone = search_index(
            idx, [{"query_id": qid, "query_text": "alpha beta",
                   "k": 10}], predicates=preds).to_pandas()
        got = batch[batch["query_id"] == qid].reset_index(drop=True)
        assert got.to_dict("records") == alone.to_dict("records"), qid
    # the filters actually bit: en hits exclude de conversations
    assert set(batch.loc[batch["query_id"] == 0, "conv_id"]) \
        <= {"c0", "c2"}
    assert set(batch.loc[batch["query_id"] == 1, "conv_id"]) \
        <= {"c1", "c4"}


def test_per_query_filter_ands_with_global(ray_session, tmp_path):
    """A per-query filter composes (AND) with a call-level predicate."""
    idx = _mk(tmp_path, "pqf_and")
    got = search_index(idx, [
        {"query_id": 0, "query_text": "alpha beta", "k": 10,
         "filter": ["lang == de"]}],
        predicates=["lang == de or lang == en"]).to_pandas()
    assert set(got["conv_id"]) <= {"c1", "c4"}
    contradictory = search_index(idx, [
        {"query_id": 0, "query_text": "alpha beta", "k": 10,
         "filter": ["lang == fr"]}],
        predicates=["lang == de"]).to_pandas()
    assert len(contradictory) == 0


def test_per_query_filter_service_and_mixed_parity(ray_session,
                                                   tmp_path):
    idx = _mk(tmp_path, "pqf_svc")
    qs = [{"query_id": 0, "query_text": "alpha beta", "k": 10,
           "filter": ["lang == en"]},
          {"query_id": 1, "query_text": "beta", "k": 5}]
    one_shot = search_index(idx, qs).to_pylist()
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search(qs).to_pylist() == one_shot
        mixed = svc.search_mixed([{"mode": "search", "queries": qs}])
        assert mixed[0].to_pylist() == one_shot
    finally:
        svc.shutdown()


def test_sort_by_attr_matches_brute(ray_session, tmp_path):
    """Sort-by-field: matching docs ordered by attr desc (ties by conv
    id), score column carries the attribute value."""
    from vframe_ray.index.query import sort_by_attr_index
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": "needle common" if i % 2 == 0 else "common",
             "size": (i * 7) % 5}                 # planted attr ties
            for i in range(10)]
    idx = str(tmp_path / "sba_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG,
                attribute_cols=["size"])
    got = sort_by_attr_index(idx, [{"query_id": 0,
                                    "query_text": "needle", "k": 10}],
                             attr="size").to_pandas()
    want = sorted([(r["size"], r["conv_id"]) for r in rows
                   if "needle" in r["text"]],
                  key=lambda x: (-x[0], x[1]))
    assert list(zip(got["score"].astype(int), got["conv_id"])) == want
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_empty_predicate_mask_skips_postings_read(ray_session, tmp_path):
    """A call-level predicate no doc in a segment satisfies returns
    empty WITHOUT reading postings (zone-style segment skip) — and the
    result equals the unskipped path's."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import search_index
    from vframe_ray.index.searcher import SegmentSearcher

    idx = str(tmp_path / "zskip")
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": "alpha beta gamma", "lang": "en" if i % 2 else "de"}
            for i in range(10)]
    build_index(ray.data.from_items(rows), idx, SMALL_CFG,
                attribute_cols=["lang"])
    q = [{"query_id": 0, "query_text": "alpha", "k": 10}]
    # impossible predicate: no doc matches anywhere
    out = search_index(idx, q, predicates=["lang == 'zz'"])
    assert out.num_rows == 0
    # per-segment: the skip path must not populate the postings cache
    from vframe_ray.config import EngineConfig
    from vframe_ray.index.build import load_index_meta
    from vframe_ray.index.entrypoints import _global_df_for_terms
    cfg_dict, stats, seg_dirs = load_index_meta(idx)
    cfg = EngineConfig.from_dict(cfg_dict)
    gdf = _global_df_for_terms(idx, {"alpha"})
    s = SegmentSearcher(seg_dirs[0], cfg.bm25, stats["n_docs"],
                        stats["avgdl"], gdf, cfg.index.block_size)
    t = s.search([(0, ["alpha"], 10)], predicates=["lang == 'zz'"])
    assert t.num_rows == 0 and not s._postings_cache
    # sanity: without the impossible predicate the same segment scores
    # normally and the postings read happens
    t2 = s.search([(0, ["alpha"], 10)])
    assert t2.num_rows > 0 and s._postings_cache
