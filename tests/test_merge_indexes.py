"""merge_indexes: two disjoint indexes == one fresh build."""

import pytest
import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.compact import merge_indexes
from vframe_ray.index.query import search_index


def test_merge_two_indexes_equals_fresh_build(ray_session, tmp_path):
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": f"alpha beta w{i % 5} gamma w{i % 3}"}
            for i in range(40)]
    a = [r for r in rows if int(r["conv_id"][1:]) % 2 == 0]
    b = [r for r in rows if int(r["conv_id"][1:]) % 2 == 1]

    ia, ib, iu = (str(tmp_path / n) for n in ("ia", "ib", "iu"))
    build_index(ray.data.from_items(a), ia, SMALL_CFG)
    build_index(ray.data.from_items(b), ib, SMALL_CFG)
    build_index(ray.data.from_items(rows), iu, SMALL_CFG)

    out = str(tmp_path / "merged")
    merge_indexes([ia, ib], out, target_segments=3)

    for qt in ("alpha w1", "gamma", "w2 w4 beta"):
        q = [{"query_id": 0, "query_text": qt, "k": 40}]
        assert search_index(out, q).to_pylist() == \
            search_index(iu, q).to_pylist(), qt


def test_merge_rejects_config_mismatch(ray_session, tmp_path):
    from vframe_ray.config import EngineConfig, IndexConfig
    rows = [{"conv_id": "c0", "turn_idx": 0, "text": "alpha"}]
    ia, ib = str(tmp_path / "ma"), str(tmp_path / "mb")
    build_index(ray.data.from_items(rows), ia, SMALL_CFG)
    build_index(ray.data.from_items(rows), ib,
                EngineConfig(index=IndexConfig(num_segments=1,
                                               block_size=64)))
    with pytest.raises(ValueError, match="config mismatch"):
        merge_indexes([ia, ib], str(tmp_path / "mo"))


def test_federated_equals_single_index(ray_session, tmp_path):
    """search_federated over two partition indexes is bit-identical to
    the single full-corpus index — combined N/avgdl/df are exact."""
    from vframe_ray.index.query import search_federated
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": f"alpha beta w{i % 5} gamma w{i % 3}"}
            for i in range(40)]
    a = [r for r in rows if int(r["conv_id"][1:]) % 2 == 0]
    b = [r for r in rows if int(r["conv_id"][1:]) % 2 == 1]
    ia, ib, iu = (str(tmp_path / n) for n in ("fa", "fb", "fu"))
    build_index(ray.data.from_items(a), ia, SMALL_CFG)
    build_index(ray.data.from_items(b), ib, SMALL_CFG)
    build_index(ray.data.from_items(rows), iu, SMALL_CFG)
    for qt in ("alpha w1", "gamma", "w2 w4 beta", "zzzabsent"):
        q = [{"query_id": 0, "query_text": qt, "k": 40}]
        assert search_federated([ia, ib], q).to_pylist() == \
            search_index(iu, q).to_pylist(), qt
    # pagination composes: page 2 of the federation == page 2 of iu
    q = [{"query_id": 0, "query_text": "alpha", "k": 10, "offset": 10}]
    assert search_federated([ia, ib], q).to_pylist() == \
        search_index(iu, q).to_pylist()


def test_federated_rejects_config_mismatch(ray_session, tmp_path):
    from vframe_ray.config import AnalyzerConfig, EngineConfig, IndexConfig
    from vframe_ray.index.query import search_federated
    rows = [{"conv_id": "c0", "turn_idx": 0, "text": "alpha"}]
    ia, ib = str(tmp_path / "fma"), str(tmp_path / "fmb")
    build_index(ray.data.from_items(rows), ia, SMALL_CFG)
    build_index(ray.data.from_items(rows), ib,
                EngineConfig(analyzer=AnalyzerConfig(stem="s"),
                             index=IndexConfig(num_segments=1,
                                               block_size=64)))
    with pytest.raises(ValueError, match="incompatible"):
        search_federated([ia, ib], [{"query_id": 0,
                                     "query_text": "alpha", "k": 5}])
    with pytest.raises(ValueError, match="at least one"):
        search_federated([], [{"query_id": 0, "query_text": "alpha",
                               "k": 5}])


def one_svc_suggest(index_dir, prefixes, k):
    from vframe_ray.index.query import suggest_terms
    return suggest_terms(index_dir, prefixes, k).to_pylist()


def test_federated_query_service_parity(ray_session, tmp_path):
    """A QueryService over two partition indexes serves results
    bit-identical to the single union-corpus index; dictionary
    expansion modes raise the documented NotImplementedError."""
    from vframe_ray.index.service import QueryService
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": f"alpha beta w{i % 5} gamma w{i % 3}"}
            for i in range(40)]
    a = [r for r in rows if int(r["conv_id"][1:]) % 2 == 0]
    b = [r for r in rows if int(r["conv_id"][1:]) % 2 == 1]
    ia, ib, iu = (str(tmp_path / n) for n in ("sfa", "sfb", "sfu"))
    build_index(ray.data.from_items(a), ia, SMALL_CFG)
    build_index(ray.data.from_items(b), ib, SMALL_CFG)
    build_index(ray.data.from_items(rows), iu, SMALL_CFG)
    fed = QueryService([ia, ib], n_actors=2)
    try:
        for qt in ("alpha w1", "gamma", "w2 w4 beta", "zzzabsent"):
            q = [{"query_id": 0, "query_text": qt, "k": 40}]
            assert fed.search(q).to_pylist() == \
                search_index(iu, q).to_pylist(), qt
        bq = [{"query_id": 0, "must": "alpha", "should": "w1 w2",
               "must_not": "w4", "k": 40, "minimum_should_match": 1}]
        from vframe_ray.index.query import search_boolean_index
        assert fed.search_boolean(bq).to_pylist() == \
            search_boolean_index(iu, bq).to_pylist()
        # wildcard expansion unions the per-index dictionaries, so
        # federated prefix search equals the single-index result
        pq_ = [{"query_id": 0, "query_text": "w* alpha", "k": 40}]
        assert fed.search_prefix(pq_).to_pylist() == \
            search_index(iu, [{"query_id": 0, "k": 40,
                               "query_text":
                               "alpha w0 w1 w2 w3 w4"}]).to_pylist()
        # fuzzy expansion unions the per-index dictionaries
        fz = [{"query_id": 0, "query_text": "alphq", "k": 40}]
        from vframe_ray.index.query import search_fuzzy_index
        assert fed.search_fuzzy(fz).to_pylist() == \
            search_fuzzy_index(iu, fz).to_pylist()
        # did-you-mean ranks union candidates by SUMMED df
        dym = fed.suggest_corrections(["alphq"], max_edits=1).to_pylist()
        one = QueryService(iu, n_actors=1)
        try:
            assert dym == one.suggest_corrections(
                ["alphq"], max_edits=1).to_pylist()
            assert dym and dym[0]["suggestion"] == "alpha"
        finally:
            one.shutdown()
        # autocomplete sums df across indexes before the top-k cut:
        # federated suggestions equal the union index's (same summed
        # df per term, same tie rule)
        assert fed.suggest(["al", "w"], k=3).to_pylist() == \
            one_svc_suggest(iu, ["al", "w"], k=3)
    finally:
        fed.shutdown()
