"""Weighted multi-field search semantics."""

import pytest
import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import search_fields_index, search_index


def test_single_field_weight_one_equals_plain(ray_session, tmp_path):
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": f"alpha w{i % 4} beta w{i % 3}"} for i in range(20)]
    idx = str(tmp_path / "f_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    q = [{"query_id": 0, "query_text": "alpha w1", "k": 20}]
    assert search_fields_index([(idx, 1.0)], q).to_pylist() == \
        search_index(idx, q).to_pylist()


def test_title_boost_reorders(ray_session, tmp_path):
    # 'needle' in c0's TITLE field, in c1's BODY field; with a large
    # title boost c0 must outrank c1 even though body-idf is equal
    title_rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "needle intro"},
        {"conv_id": "c1", "turn_idx": 0, "text": "plain intro"},
        {"conv_id": "c2", "turn_idx": 0, "text": "other title"},
    ]
    body_rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "filler words here"},
        {"conv_id": "c1", "turn_idx": 0, "text": "needle filler words"},
        {"conv_id": "c2", "turn_idx": 0, "text": "irrelevant body"},
    ]
    it, ib = str(tmp_path / "ft"), str(tmp_path / "fb")
    build_index(ray.data.from_items(title_rows), it, SMALL_CFG)
    build_index(ray.data.from_items(body_rows), ib, SMALL_CFG)

    q = [{"query_id": 0, "query_text": "needle", "k": 3}]
    res = search_fields_index([(it, 5.0), (ib, 1.0)], q).to_pylist()
    assert [r["conv_id"] for r in res] == ["c0", "c1"]
    # flipped boosts flip the order
    res2 = search_fields_index([(it, 1.0), (ib, 5.0)], q).to_pylist()
    assert [r["conv_id"] for r in res2] == ["c1", "c0"]


def test_fields_reject_misaligned_indexes(ray_session, tmp_path):
    from vframe_ray.config import EngineConfig, IndexConfig
    rows = [{"conv_id": "c0", "turn_idx": 0, "text": "alpha"}]
    ia, ib = str(tmp_path / "fa"), str(tmp_path / "fb2")
    build_index(ray.data.from_items(rows), ia, SMALL_CFG)
    build_index(ray.data.from_items(rows), ib,
                EngineConfig(index=IndexConfig(num_segments=1,
                                               block_size=64)))
    with pytest.raises(ValueError, match="config differs"):
        search_fields_index([(ia, 1.0), (ib, 1.0)],
                            [{"query_id": 0, "query_text": "alpha",
                              "k": 1}])


def _two_field_indexes(tmp_path):
    title_rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "needle intro"},
        {"conv_id": "c1", "turn_idx": 0, "text": "plain intro"},
        {"conv_id": "c2", "turn_idx": 0, "text": "needle needle"},
        {"conv_id": "c3", "turn_idx": 0, "text": "other title"},
    ]
    body_rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "needle filler words"},
        {"conv_id": "c1", "turn_idx": 0, "text": "needle filler here"},
        {"conv_id": "c2", "turn_idx": 0, "text": "clean body text"},
        {"conv_id": "c3", "turn_idx": 0, "text": "irrelevant body"},
    ]
    it, ib = str(tmp_path / "dmt"), str(tmp_path / "dmb")
    build_index(ray.data.from_items(title_rows), it, SMALL_CFG)
    build_index(ray.data.from_items(body_rows), ib, SMALL_CFG)
    return it, ib


def test_dismax_zero_tiebreaker_is_pure_max(ray_session, tmp_path):
    """tb=0: the fused score equals the per-doc MAX of the weighted
    single-field scores, bit-exactly (recomputed from full single-field
    rankings)."""
    it, ib = _two_field_indexes(tmp_path)
    q = [{"query_id": 0, "query_text": "needle", "k": 10}]
    # weight is applied INSIDE the engine; recompute from weight-1 legs
    st = {r["conv_id"]: 2.0 * r["score"] for r in
          search_fields_index([(it, 1.0)], q).to_pylist()}
    sb = {r["conv_id"]: 1.0 * r["score"] for r in
          search_fields_index([(ib, 1.0)], q).to_pylist()}
    got = search_fields_index([(it, 2.0), (ib, 1.0)], q,
                              combine="dismax", tie_breaker=0.0)
    for r in got.to_pylist():
        want = max(st.get(r["conv_id"], 0.0), sb.get(r["conv_id"], 0.0))
        assert r["score"] == want


def test_dismax_single_field_doc_equals_sum(ray_session, tmp_path):
    """A doc matching in exactly one field scores identically under
    sum and dismax (the other leg is a true zero)."""
    it, ib = _two_field_indexes(tmp_path)
    q = [{"query_id": 0, "query_text": "needle", "k": 10}]
    s = {r["conv_id"]: r["score"] for r in search_fields_index(
        [(it, 2.0), (ib, 1.0)], q).to_pylist()}
    d = {r["conv_id"]: r["score"] for r in search_fields_index(
        [(it, 2.0), (ib, 1.0)], q, combine="dismax",
        tie_breaker=0.3).to_pylist()}
    # c2 matches only in title; c1 only in body
    assert d["c2"] == s["c2"] and d["c1"] == s["c1"]
    # c0 matches both: dismax strictly below the sum for tb < 1
    assert d["c0"] < s["c0"]


def test_dismax_formula_recompute(ray_session, tmp_path):
    """Fused = max + tb*(sum - max) in exactly that float order."""
    it, ib = _two_field_indexes(tmp_path)
    q = [{"query_id": 0, "query_text": "needle intro", "k": 10}]
    st = {r["conv_id"]: 2.0 * r["score"] for r in
          search_fields_index([(it, 1.0)], q).to_pylist()}
    sb = {r["conv_id"]: 1.0 * r["score"] for r in
          search_fields_index([(ib, 1.0)], q).to_pylist()}
    got = search_fields_index([(it, 2.0), (ib, 1.0)], q,
                              combine="dismax", tie_breaker=0.3)
    assert got.num_rows > 0
    for r in got.to_pylist():
        a = st.get(r["conv_id"], 0.0)
        b = sb.get(r["conv_id"], 0.0)
        mx = max(a, b)
        assert r["score"] == mx + 0.3 * ((a + b) - mx)


def test_dismax_rejects_unknown_combine(ray_session, tmp_path):
    it, ib = _two_field_indexes(tmp_path)
    with pytest.raises(ValueError, match="combine"):
        search_fields_index([(it, 1.0), (ib, 1.0)],
                            [{"query_id": 0, "query_text": "needle",
                              "k": 1}], combine="avg")
