"""Proximity (NEAR/W) search: brute-force parity, semantic reductions
(window=inf == boolean AND; phrase hits ⊆ proximity hits), service
parity with the one-shot path."""

import pytest

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.analyze import Tokenizer
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (QueryService, phrase_rank_index,
                                    proximity_rank_index,
                                    search_boolean_index)

ROWS = [
    {"conv_id": "c0", "turn_idx": 0,
     "text": "alpha beta gamma delta alpha"},
    {"conv_id": "c1", "turn_idx": 0,
     "text": "alpha x x x x x x beta"},
    {"conv_id": "c2", "turn_idx": 0,
     "text": "beta alpha gamma"},
    {"conv_id": "c3", "turn_idx": 0,
     "text": "gamma delta epsilon alpha x beta"},
    {"conv_id": "c4", "turn_idx": 0, "text": "beta beta beta"},
    {"conv_id": "c5", "turn_idx": 0,
     "text": "alpha x beta x alpha gamma x x delta"},
]


def brute_hits(terms: list[str], window: int) -> set[str]:
    """Reference NEAR/W: one position per distinct term, span <= window-1."""
    from itertools import product
    tok = Tokenizer()
    terms = sorted(set(terms))
    out = set()
    for r in ROWS:
        toks = tok.tokenize(r["text"])
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
        if any(not p for p in pos.values()):
            continue
        if any(max(c) - min(c) <= window - 1
               for c in product(*pos.values())):
            out.add(r["conv_id"])
    return out


def test_proximity_vs_bruteforce(ray_session, tmp_path):
    idx = str(tmp_path / "prox_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    cases = [
        (["alpha", "beta"], 2), (["alpha", "beta"], 3),
        (["alpha", "beta"], 8), (["alpha", "beta", "gamma"], 3),
        (["alpha", "beta", "gamma"], 5), (["alpha", "delta"], 4),
        (["beta"], 1), (["alpha", "zzz"], 10),
        (["alpha", "beta", "gamma", "delta"], 9),
    ]
    for i, (terms, w) in enumerate(cases):
        res = proximity_rank_index(idx, [{
            "query_id": 0, "query_text": " ".join(terms),
            "window": w, "k": 100}])
        got = set(res["conv_id"].to_pylist())
        assert got == brute_hits(terms, w), (terms, w)


def test_proximity_window_inf_is_boolean_and(ray_session, tmp_path):
    idx = str(tmp_path / "prox_idx2")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    q = "alpha beta gamma"
    prox = proximity_rank_index(idx, [{
        "query_id": 0, "query_text": q, "window": 10_000, "k": 50}])
    boolean = search_boolean_index(idx, [{
        "query_id": 0, "must": q, "should": "", "must_not": "", "k": 50}])
    assert prox.to_pylist() == boolean.to_pylist()


def test_phrase_hits_subset_of_proximity(ray_session, tmp_path):
    idx = str(tmp_path / "prox_idx3")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    phrase = phrase_rank_index(idx, [{
        "query_id": 0, "phrase": "alpha beta", "k": 50}])
    prox = proximity_rank_index(idx, [{
        "query_id": 0, "query_text": "alpha beta", "window": 2, "k": 50}])
    assert set(phrase["conv_id"].to_pylist()) <= \
        set(prox["conv_id"].to_pylist())
    # unordered: c2 ("beta alpha") is a proximity hit but not a phrase hit
    assert "c2" in set(prox["conv_id"].to_pylist())
    assert "c2" not in set(phrase["conv_id"].to_pylist())


def test_proximity_service_parity(ray_session, tmp_path):
    idx = str(tmp_path / "prox_idx4")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "alpha beta", "window": 2, "k": 10},
          {"query_id": 1, "query_text": "gamma delta alpha", "window": 6,
           "k": 5},
          {"query_id": 2, "query_text": "zzz beta", "window": 4, "k": 10}]
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search_proximity(qs).to_pylist() == \
            proximity_rank_index(idx, qs).to_pylist()
    finally:
        svc.shutdown()


def brute_hits_ordered(terms: list[str], window: int) -> set[str]:
    """Reference ordered span-near: strictly increasing positions in the
    GIVEN term order, span <= window-1."""
    from itertools import product
    tok = Tokenizer()
    out = set()
    for r in ROWS:
        toks = tok.tokenize(r["text"])
        pos = [[i for i, x in enumerate(toks) if x == t] for t in terms]
        if any(not p for p in pos):
            continue
        for combo in product(*pos):
            if all(b > a for a, b in zip(combo, combo[1:])) \
                    and combo[-1] - combo[0] <= window - 1:
                out.add(r["conv_id"])
                break
    return out


def test_ordered_proximity_vs_bruteforce(ray_session, tmp_path):
    idx = str(tmp_path / "oprox_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    cases = [
        (["alpha", "beta"], 2), (["beta", "alpha"], 2),
        (["alpha", "beta"], 8), (["beta", "alpha"], 8),
        (["alpha", "beta", "gamma"], 6), (["gamma", "beta", "alpha"], 6),
        (["alpha", "alpha"], 5),          # duplicate term, ordered
        (["alpha", "delta"], 4), (["alpha", "zzz"], 10),
    ]
    for terms, w in cases:
        res = proximity_rank_index(idx, [{
            "query_id": 0, "query_text": " ".join(terms),
            "window": w, "k": 100, "ordered": True}])
        got = set(res["conv_id"].to_pylist())
        want = brute_hits_ordered(terms, w)
        assert got == want, (terms, w)
        # ordered hits are a subset of unordered hits over the same set
        uno = proximity_rank_index(idx, [{
            "query_id": 0, "query_text": " ".join(terms),
            "window": w, "k": 100}])
        assert got <= set(uno["conv_id"].to_pylist())


def test_ordered_proximity_service_parity(ray_session, tmp_path):
    idx = str(tmp_path / "oprox_idx2")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "beta alpha", "window": 3,
           "k": 10, "ordered": True},
          {"query_id": 1, "query_text": "alpha beta", "window": 3,
           "k": 10}]
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search_proximity(qs).to_pylist() == \
            proximity_rank_index(idx, qs).to_pylist()
    finally:
        svc.shutdown()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_proximity_randomized_vs_bruteforce(ray_session, tmp_path, seed):
    """Fuzz both proximity implementations (vectorized 2-term fast path
    and k-way sweep; ordered and unordered) against a positions-level
    brute force on a random corpus."""
    import numpy as np
    from itertools import product

    rng = np.random.default_rng(seed)
    words = ["pa", "qo", "ru", "sv"]
    rows = []
    for i in range(12):
        n = int(rng.integers(1, 15))
        rows.append({"conv_id": f"c{i:02d}", "turn_idx": 0,
                     "text": " ".join(rng.choice(words, size=n))})
    idx = str(tmp_path / f"fuzz_idx{seed}")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    tok = Tokenizer()
    toks_by_doc = {r["conv_id"]: tok.tokenize(r["text"]) for r in rows}

    def brute(terms, w, ordered):
        out = set()
        for cid, toks in toks_by_doc.items():
            pos = [[i for i, x in enumerate(toks) if x == t]
                   for t in (terms if ordered else sorted(set(terms)))]
            if any(not p for p in pos):
                continue
            for combo in product(*pos):
                if ordered and not all(b > a for a, b in
                                       zip(combo, combo[1:])):
                    continue
                if max(combo) - min(combo) <= w - 1:
                    out.add(cid)
                    break
        return out

    for _ in range(25):
        m = int(rng.integers(1, 5))
        terms = list(rng.choice(words, size=m))
        w = int(rng.integers(1, 13))
        ordered = bool(rng.integers(0, 2))
        res = proximity_rank_index(idx, [{
            "query_id": 0, "query_text": " ".join(terms), "window": w,
            "k": 100, "ordered": ordered}])
        got = set(res["conv_id"].to_pylist())
        assert got == brute(terms, w, ordered), (terms, w, ordered)
