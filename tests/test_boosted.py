"""Per-term query boosts: parse rules, boost=1 reduction to plain
search, monotone rank effect, service parity."""

import pytest
import ray.data

from tests.util import SMALL_CFG
from vframe_ray.analyze import Tokenizer
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (QueryService, parse_boosted_query,
                                    search_boosted_index, search_index)

ROWS = [
    {"conv_id": "c0", "turn_idx": 0, "text": "apple apple banana"},
    {"conv_id": "c1", "turn_idx": 0, "text": "banana banana apple"},
    {"conv_id": "c2", "turn_idx": 0, "text": "apple cherry"},
    {"conv_id": "c3", "turn_idx": 0, "text": "banana cherry cherry"},
    {"conv_id": "c4", "turn_idx": 0, "text": "apple banana cherry"},
]


def test_parse_boosted_query():
    tok = Tokenizer()
    assert parse_boosted_query(tok, "apple^2.5 banana") == \
        [("apple", 2.5), ("banana", 1.0)]
    # boost applies to every analyzed token of the chunk; last wins
    assert parse_boosted_query(tok, "Foo-Bar^3 foo^2") == \
        [("bar", 3.0), ("foo", 2.0)]
    with pytest.raises(ValueError):
        parse_boosted_query(tok, "apple^0")
    with pytest.raises(ValueError):
        parse_boosted_query(tok, "apple^-1.5")
    # a bare caret chunk with no numeric suffix is a literal token
    assert parse_boosted_query(tok, "a^b") == [("a", 1.0), ("b", 1.0)]


def test_boost_one_is_plain_search(ray_session, tmp_path):
    idx = str(tmp_path / "boost_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    plain = search_index(idx, [{"query_id": 0,
                                "query_text": "apple banana", "k": 10}])
    boosted = search_boosted_index(idx, [{
        "query_id": 0, "query_text": "apple^1 banana", "k": 10}])
    assert plain.to_pylist() == boosted.to_pylist()   # bit-exact scores


def test_boost_changes_ranking(ray_session, tmp_path):
    idx = str(tmp_path / "boost_idx2")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    up = search_boosted_index(idx, [{
        "query_id": 0, "query_text": "apple^5 banana", "k": 1}])
    down = search_boosted_index(idx, [{
        "query_id": 0, "query_text": "apple banana^5", "k": 1}])
    assert up["conv_id"][0].as_py() == "c0"    # apple-heavy doc wins
    assert down["conv_id"][0].as_py() == "c1"  # banana-heavy doc wins


def test_boosted_service_parity(ray_session, tmp_path):
    idx = str(tmp_path / "boost_idx3")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "apple^2.5 cherry", "k": 5},
          {"query_id": 1, "query_text": "banana^0.25 cherry^4", "k": 3},
          {"query_id": 2, "query_text": "zzz^2", "k": 5}]
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search_boosted(qs).to_pylist() == \
            search_boosted_index(idx, qs).to_pylist()
    finally:
        svc.shutdown()
