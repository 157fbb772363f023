"""QueryService request cache: identical calls short-circuit, the LRU
is bounded, and refresh_deletes() invalidates (no stale serving)."""

import pyarrow as pa
import pytest

import ray.data


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    d = str(tmp_path_factory.mktemp("reqcache") / "idx")
    rows = [("c0", 0, "alpha beta gamma"), ("c1", 0, "alpha beta"),
            ("c2", 0, "alpha delta"), ("c3", 0, "beta epsilon")]
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows])})
    build_index(ray.data.from_arrow(tbl), d,
                EngineConfig(index=IndexConfig(num_segments=2)))
    return d


def test_cache_hit_identical_and_bounded(idx):
    from vframe_ray.index.service import QueryService
    svc = QueryService(idx, n_actors=2)
    try:
        q = [{"query_id": 0, "query_text": "alpha", "k": 10}]
        r1 = svc.search(q)
        assert svc._req_cache_misses == 1 and svc._req_cache_hits == 0
        r2 = svc.search(q)
        assert svc._req_cache_hits == 1
        assert r1.to_pylist() == r2.to_pylist()
        # k participates in the key
        svc.search([{"query_id": 0, "query_text": "alpha", "k": 2}])
        assert svc._req_cache_misses == 2
        # LRU bound: flood past capacity, cache stays bounded and the
        # flooded-out entry re-misses
        svc.request_cache_size = 4
        for i in range(8):
            svc.search([{"query_id": 0, "query_text": f"alpha x{i}",
                         "k": 3}])
        assert len(svc._req_cache) <= 4
    finally:
        svc.shutdown()


def test_refresh_deletes_invalidates(idx):
    from vframe_ray.index.build import delete_docs
    from vframe_ray.index.service import QueryService
    svc = QueryService(idx, n_actors=2)
    try:
        q = [{"query_id": 0, "query_text": "alpha", "k": 10}]
        before = svc.search(q)
        assert "c0" in set(before["conv_id"].to_pylist())
        delete_docs(svc.index_dir, ["c0"])
        # stale until refresh — documented visibility contract
        assert svc.search(q).to_pylist() == before.to_pylist()
        svc.refresh_deletes()
        after = svc.search(q)
        assert "c0" not in set(after["conv_id"].to_pylist())
        assert len(after) == len(before) - 1
    finally:
        svc.shutdown()
