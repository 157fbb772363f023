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
