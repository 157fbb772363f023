"""span-first retrieval (Lucene SpanFirstQuery applied conjunctively):
brute-force hit oracle, the limit->infinity reduction to boolean AND,
service/one-shot/mixed parity, and the positional edges (term exactly
AT the limit, term only beyond it)."""

import numpy as np

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.analyze import Tokenizer
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (QueryService, search_boolean_index,
                                    search_index,
                                    span_first_search_index)

ROWS = [
    {"conv_id": "c0", "turn_idx": 0,
     "text": "alpha beta gamma delta alpha omega"},
    {"conv_id": "c1", "turn_idx": 0,
     "text": "omega omega alpha beta zeta"},
    {"conv_id": "c2", "turn_idx": 0,
     "text": "gamma delta epsilon zeta eta theta alpha beta"},
    {"conv_id": "c3", "turn_idx": 0, "text": "beta alpha"},
    {"conv_id": "c4", "turn_idx": 0,
     "text": "zeta eta theta iota kappa alpha"},
]


def _brute_hits(query, limit):
    tok = Tokenizer()
    terms = sorted(set(tok.tokenize(query)))
    hits = []
    for r in ROWS:
        toks = tok.tokenize(r["text"])
        if all(t in toks[:limit] for t in terms):
            hits.append(r["conv_id"])
    return sorted(hits)


def test_span_first_vs_brute(ray_session, tmp_path):
    idx = str(tmp_path / "sf_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    cases = [("alpha beta", 2), ("alpha beta", 3), ("alpha", 1),
             ("alpha", 6), ("gamma delta", 2), ("theta", 3),
             ("nosuchterm alpha", 99)]
    qs = [{"query_id": i, "query_text": q, "limit": lim, "k": 10}
          for i, (q, lim) in enumerate(cases)]
    res = span_first_search_index(idx, qs).to_pandas()
    for i, (q, lim) in enumerate(cases):
        got = sorted(res.loc[res["query_id"] == i, "conv_id"])
        assert got == _brute_hits(q, lim), (q, lim)


def test_span_first_limit_edges(ray_session, tmp_path):
    """pos < limit is strict: a term whose FIRST occurrence is exactly
    at position `limit` does not hit; position 0 hits at limit 1."""
    idx = str(tmp_path / "sf_edge")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    # c4: 'alpha' first occurs at position 5
    r5 = span_first_search_index(
        idx, [{"query_id": 0, "query_text": "kappa alpha",
               "limit": 5, "k": 10}]).to_pandas()
    assert "c4" not in set(r5["conv_id"])
    r6 = span_first_search_index(
        idx, [{"query_id": 0, "query_text": "kappa alpha",
               "limit": 6, "k": 10}]).to_pandas()
    assert set(r6["conv_id"]) == {"c4"}


def test_span_first_reduces_to_boolean_and(ray_session, tmp_path):
    """limit >= max doc length makes the filter vacuous: ranking equals
    the boolean must-AND of the terms, scores bit-identical."""
    idx = str(tmp_path / "sf_red")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    got = span_first_search_index(
        idx, [{"query_id": 0, "query_text": "alpha beta",
               "limit": 1000, "k": 10}]).to_pylist()
    want = search_boolean_index(
        idx, [{"query_id": 0, "must": "alpha beta", "should": "",
               "must_not": "", "k": 10}]).to_pylist()
    assert got == want


def test_span_first_service_and_mixed_parity(ray_session, tmp_path):
    idx = str(tmp_path / "sf_svc")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "alpha beta", "limit": 3,
           "k": 10},
          {"query_id": 1, "query_text": "gamma", "limit": 1, "k": 5}]
    one_shot = span_first_search_index(idx, qs).to_pylist()
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search_span_first(qs).to_pylist() == one_shot
        mixed = svc.search_mixed(
            [{"mode": "span_first", "queries": qs},
             {"mode": "search",
              "queries": [{"query_id": 0, "query_text": "alpha",
                           "k": 3}]}])
        assert mixed[0].to_pylist() == one_shot
        assert mixed[1].to_pylist() == search_index(
            idx, [{"query_id": 0, "query_text": "alpha",
                   "k": 3}]).to_pylist()
    finally:
        svc.shutdown()
