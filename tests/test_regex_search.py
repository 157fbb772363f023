"""Regex term search: full-match semantics, leading-literal pushdown
with the quantifier-drop rule, expansion == manual union, service
parity, and malformed-pattern rejection."""

import pytest
import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (QueryService, expand_regex_patterns,
                                    search_index, search_regex_index)


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    docs = {
        "c0": "apple apricot banana ap",
        "c1": "apple banana berry verify",
        "c2": "apricot cherry ver verrry",
        "c3": "banana berry cherry sort",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    d = str(tmp_path_factory.mktemp("regex_idx") / "idx")
    build_index(ds, d, SMALL_CFG)
    return d


def test_full_match_not_substring(idx):
    exp = expand_regex_patterns(idx, ["app", "appl.", "a.*"])
    assert exp["app"] == []                  # 'apple' is NOT a full match
    assert exp["appl."] == ["apple"]
    assert exp["a.*"] == ["ap", "apple", "apricot"]


def test_quantifier_after_literal_prefix(idx):
    """'ver*' = 've' + zero-or-more 'r': the prune prefix must drop to
    've' or 'ver'/'verrry'/'ve...' terms outside ['ver','ver{') would
    be missed; 'verify' must NOT match (full-match, no trailing 'ify')."""
    exp = expand_regex_patterns(idx, ["ver*", "ver.*", "verr+y"])
    assert exp["ver*"] == ["ver"]            # verrry has a trailing y
    assert exp["ver.*"] == ["ver", "verify", "verrry"]
    assert exp["verr+y"] == ["verrry"]


def test_alternation_and_scan(idx):
    exp = expand_regex_patterns(idx, ["(ban|che).*", ".*rry"])
    assert exp["(ban|che).*"] == ["banana", "cherry"]
    assert exp[".*rry"] == ["berry", "cherry", "verrry"]


def test_regex_query_equals_manual_union(idx):
    got = search_regex_index(
        idx, [{"query_id": 0, "query_text": "ap.* cherry", "k": 10}])
    want = search_index(
        idx, [{"query_id": 0, "query_text": "ap apple apricot cherry",
               "k": 10}])
    assert got.to_pylist() == want.to_pylist()


def test_service_parity(idx):
    qs = [{"query_id": 0, "query_text": "ap.* cherry", "k": 10},
          {"query_id": 1, "query_text": ".*rry", "k": 10}]
    svc = QueryService(idx)
    try:
        want = search_regex_index(idx, qs).to_pylist()
        assert svc.search_regex(qs).to_pylist() == want
        # regex mode inside a heterogeneous search_mixed batch
        mixed = svc.search_mixed([
            {"mode": "regex", "queries": qs},
            {"mode": "search",
             "queries": [{"query_id": 0, "query_text": "cherry",
                          "k": 5}]},
        ])
        assert mixed[0].to_pylist() == want
    finally:
        svc.shutdown()


def test_malformed_and_hostile_patterns(idx):
    with pytest.raises(Exception):
        search_regex_index(idx, [{"query_id": 0, "query_text": "a(b",
                                  "k": 5}])
    with pytest.raises(ValueError):
        search_regex_index(idx, [{"query_id": 0, "query_text": "a'b",
                                  "k": 5}])
    # no-match regex: zero rows, not an error
    assert search_regex_index(
        idx, [{"query_id": 0, "query_text": "zz+", "k": 5}]).num_rows == 0
