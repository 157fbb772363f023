"""Wildcard/prefix query expansion semantics."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (expand_prefix_terms, search_index,
                                    search_prefix_index)


def _planted_index(tmp_path):
    docs = {
        "c0": "apple apricot banana",
        "c1": "apple banana berry",
        "c2": "apricot cherry",
        "c3": "banana berry cherry",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "prefix_idx")
    build_index(ds, idx, SMALL_CFG)
    return idx


def test_expansion_against_global_dictionary(ray_session, tmp_path):
    idx = _planted_index(tmp_path)
    exp = expand_prefix_terms(idx, ["ap", "b", "zzz"])
    assert exp["ap"] == ["apple", "apricot"]
    assert exp["b"] == ["banana", "berry"]
    assert exp["zzz"] == []


def test_prefix_query_equals_manual_union(ray_session, tmp_path):
    """'ap*' must score identically to the literal query of its
    expansion — expansion is pure term-set rewriting."""
    idx = _planted_index(tmp_path)
    got = search_prefix_index(
        idx, [{"query_id": 0, "query_text": "ap* cherry", "k": 10}])
    want = search_index(
        idx, [{"query_id": 0, "query_text": "apple apricot cherry",
               "k": 10}])
    assert got.to_pylist() == want.to_pylist()


def test_prefix_no_expansion_no_rows(ray_session, tmp_path):
    idx = _planted_index(tmp_path)
    got = search_prefix_index(
        idx, [{"query_id": 0, "query_text": "zzz*", "k": 10}])
    assert got.num_rows == 0


def test_suggest_terms_df_ordering(ray_session, tmp_path):
    """Autocomplete: df-desc, term-asc per prefix, k-capped; service
    delegate returns the identical table."""
    from vframe_ray.index.query import QueryService, suggest_terms
    idx = _planted_index(tmp_path)
    # df: banana=3, apple=2, apricot=2, berry=2, cherry=2
    got = suggest_terms(idx, ["b", "ap", "zzz"], k=1)
    assert got.to_pylist() == [
        {"prefix": "ap", "term": "apple", "df": 2},   # tie: term asc
        {"prefix": "b", "term": "banana", "df": 3},
    ]
    allb = suggest_terms(idx, ["b"], k=10)
    assert allb.to_pylist() == [
        {"prefix": "b", "term": "banana", "df": 3},
        {"prefix": "b", "term": "berry", "df": 2},
    ]
    svc = QueryService(idx, n_actors=1)
    try:
        assert svc.suggest(["b", "ap", "zzz"], k=1).to_pylist() == \
            got.to_pylist()
    finally:
        svc.shutdown()
