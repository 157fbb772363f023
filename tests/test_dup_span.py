"""dup_span_coverage — positional exact-substring duplication (the
Lee-et-al span-coverage dedup metric) against a plain-Python oracle,
with planted full/partial copies and repartition invariance."""

import re

import numpy as np
import pandas as pd
import pytest

import ray.data


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute(docs, L):
    toks = {d["doc_id"]: _toks(d["text"]) for d in docs}
    grams = {}                      # gram -> set(doc_id)
    for i, tk in toks.items():
        for p in range(len(tk) - L + 1):
            grams.setdefault(" ".join(tk[p:p + L]), set()).add(i)
    rows = []
    for i, tk in sorted(toks.items()):
        n = len(tk)
        if n < L:
            continue
        pos = [p for p in range(n - L + 1)
               if len(grams[" ".join(tk[p:p + L])]) >= 2]
        covered = np.zeros(n, bool)
        for p in pos:
            covered[p:p + L] = True
        rows.append((i, n, len(pos), int(covered.sum()),
                     covered.sum() / n))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens",
                                       "n_dup_grams", "covered_tokens",
                                       "dup_span_frac"])


DOCS = [
    # 0 and 1: exact copies -> frac 1.0 for both
    {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog "
                          "and runs far away tonight"},
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog "
                          "and runs far away tonight"},
    # 2: embeds an 8+-token passage of 0 mid-document (partial coverage,
    # straddling any chunk boundary)
    {"doc_id": 2, "text": "unrelated start words here quick brown fox "
                          "jumps over the lazy dog and then something "
                          "else entirely different follows now"},
    # 3: shorter than L -> emits no row
    {"doc_id": 3, "text": "too few tokens here"},
    # 4: long doc with zero duplicated spans
    {"doc_id": 4, "text": " ".join(f"uniq{i}" for i in range(40))},
    # 5: empty
    {"doc_id": 5, "text": ""},
    # 6: internal repetition only (same gram twice in ONE doc) must NOT
    # count — dup needs >= 2 distinct docs
    {"doc_id": 6, "text": "solo run alpha beta gamma delta epsilon zeta "
                          "eta theta filler solo run alpha beta gamma "
                          "delta epsilon zeta eta theta"},
]


def test_dup_span_coverage_vs_brute_and_repartition(ray_session):
    from vframe_ray.stages.chunking import dup_span_coverage
    L = 8
    want = _brute(DOCS, L)
    assert want.loc[want.doc_id == 0, "dup_span_frac"].iloc[0] == 1.0
    assert 0 < want.loc[want.doc_id == 2, "dup_span_frac"].iloc[0] < 1
    assert 3 not in set(want.doc_id)          # < L tokens: no row
    assert want.loc[want.doc_id == 4, "n_dup_grams"].iloc[0] == 0
    # internal-only repetition is not cross-doc duplication
    assert want.loc[want.doc_id == 6, "n_dup_grams"].iloc[0] == 0

    for parts in (1, 5):
        ds = ray.data.from_items(DOCS).repartition(parts)
        got = dup_span_coverage(ds, size=L).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dup_span_coverage_interval_union(ray_session):
    """Overlapping dup grams must union, not double-count: two docs
    sharing a 10-token passage have 3 duplicated 8-grams covering
    exactly 10 positions, not 24."""
    from vframe_ray.stages.chunking import dup_span_coverage
    shared = "one two three four five six seven eight nine ten"
    docs = [{"doc_id": 0, "text": shared + " tailA tailB tailC"},
            {"doc_id": 1, "text": "headX headY " + shared}]
    got = dup_span_coverage(ray.data.from_items(docs), size=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["n_dup_grams"].tolist() == [3, 3]
    assert got["covered_tokens"].tolist() == [10, 10]
    assert got["n_tokens"].tolist() == [13, 12]
