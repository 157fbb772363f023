"""Fuzzy (Levenshtein) and synonym expansion semantics."""

import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (_levenshtein_within, expand_fuzzy_terms,
                                    search_fuzzy_index, search_index,
                                    search_synonym_index)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc", max_size=8),
       st.text(alphabet="abc", max_size=8),
       st.integers(min_value=0, max_value=3))
def test_banded_levenshtein_matches_reference(a, b, d):
    assert _levenshtein_within(a, b, d) == (_ref_lev(a, b) <= d)


def _planted_index(tmp_path):
    docs = {
        "c0": "vector stream",
        "c1": "vector vectors",
        "c2": "victor stream",
        "c3": "stream merge",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "fz_idx")
    build_index(ds, idx, SMALL_CFG)
    return idx


def test_fuzzy_expansion_and_search(ray_session, tmp_path):
    idx = _planted_index(tmp_path)
    exp = expand_fuzzy_terms(idx, ["vektor", "zzzzz"], max_edits=1)
    assert exp["vektor"] == ["vector"]     # victor is 2 edits from vektor
    assert exp["zzzzz"] == []
    got = search_fuzzy_index(idx, [
        {"query_id": 0, "query_text": "vektor", "k": 10}], max_edits=1)
    want = search_index(idx, [
        {"query_id": 0, "query_text": "vector", "k": 10}])
    assert got.to_pylist() == want.to_pylist()
    # distance 2 reaches victor and vectors as well
    exp2 = expand_fuzzy_terms(idx, ["vektor"], max_edits=2)
    assert exp2["vektor"] == ["vector", "vectors", "victor"]


def _fake_dictionary(tmp_path, vocab):
    """Write a bare global/terms dictionary (what both expansion paths
    read) without building a whole index."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    gdir = tmp_path / "global" / "terms"
    os.makedirs(gdir)
    pq.write_table(
        pa.table({"term": pa.array(sorted(set(vocab)), pa.string()),
                  "df": pa.array([1] * len(set(vocab)), pa.int64())}),
        str(gdir / "part-0.parquet"))
    return str(tmp_path)


def test_symspell_equals_linear_scan_random_vocab(ray_session, tmp_path):
    """Property: the SymSpell deletion-table path returns EXACTLY the
    linear banded-DP scan's expansion on a random vocabulary, for d=1
    and d=2, including terms at the length-pruning boundary (VERDICT r3
    next #3)."""
    import random

    from vframe_ray.index.fuzzy import (expand_fuzzy_terms,
                                        expand_fuzzy_terms_scan)
    rng = random.Random(42)
    alpha = "abcdef"
    vocab = {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
             for _ in range(400)}
    idx = _fake_dictionary(tmp_path, vocab)
    queries = [ "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
                for _ in range(25)] + ["", "a", "abcdefgh"]
    for d in (1, 2):
        got = expand_fuzzy_terms(idx, sorted(set(queries)), max_edits=d)
        want = expand_fuzzy_terms_scan(idx, sorted(set(queries)),
                                       max_edits=d)
        assert got == want


def test_symspell_sidecar_invalidates_on_dictionary_change(ray_session,
                                                           tmp_path):
    """The sidecar is fingerprinted by the dictionary files: rewriting
    global/terms (what extend_index does) forces a rebuild and sweeps
    the stale table."""
    import os

    from vframe_ray.index import fuzzy
    idx = _fake_dictionary(tmp_path, ["alpha", "alphax", "beta"])
    d1 = fuzzy.build_deletion_table(idx, max_edits=1)
    assert expand_fuzzy_terms(idx, ["alphaz"], max_edits=1) == {
        "alphaz": ["alpha", "alphax"]}
    # rewrite the dictionary with a new term
    import pyarrow as pa
    import pyarrow.parquet as pq
    gdir = os.path.join(idx, "global", "terms")
    pq.write_table(
        pa.table({"term": pa.array(["alpha", "alphax", "alphaq", "beta"]),
                  "df": pa.array([1, 1, 1, 1], pa.int64())}),
        os.path.join(gdir, "part-0.parquet"))
    assert expand_fuzzy_terms(idx, ["alphaz"], max_edits=1) == {
        "alphaz": ["alpha", "alphaq", "alphax"]}
    d2 = fuzzy.deletion_table_dir(idx, max_edits=1)
    assert d1 != d2 and not os.path.exists(d1)   # stale table swept


def test_synonym_expansion(ray_session, tmp_path):
    idx = _planted_index(tmp_path)
    got = search_synonym_index(idx, [
        {"query_id": 0, "query_text": "merge", "k": 10}],
        {"merge": ["stream", "absentword"]})
    want = search_index(idx, [
        {"query_id": 0, "query_text": "merge stream", "k": 10}])
    assert got.to_pylist() == want.to_pylist()


def test_like_patterns_and_wildcard_search(ray_session, tmp_path):
    """Mid-pattern wildcard expansion + search ≡ the expanded plain
    query; leading wildcards scan; charset is validated."""
    import pytest

    from vframe_ray.index.query import expand_like_patterns, \
        search_like_index
    idx = _planted_index(tmp_path)
    exp = expand_like_patterns(idx, ["v?ctor", "v*", "*or", "me?ge",
                                     "x*z"])
    assert exp["v?ctor"] == ["vector", "victor"]
    assert exp["v*"] == ["vector", "vectors", "victor"]
    assert exp["*or"] == ["vector", "victor"]        # leading wildcard
    assert exp["me?ge"] == ["merge"]
    assert exp["x*z"] == []
    got = search_like_index(idx, [
        {"query_id": 0, "query_text": "v?ctor stream", "k": 10}])
    want = search_index(idx, [
        {"query_id": 0, "query_text": "vector victor stream", "k": 10}])
    assert got.to_pylist() == want.to_pylist()
    with pytest.raises(ValueError):
        search_like_index(idx, [
            {"query_id": 0, "query_text": "bad%token*", "k": 5}])


def test_suggest_corrections_df_ranking(ray_session, tmp_path):
    """did-you-mean picks the max-df edit-1 candidate; ties break to
    the lexicographically smallest term; no-candidate terms emit no
    row."""
    from vframe_ray.index.query import suggest_corrections
    idx = _planted_index(tmp_path)
    # df: vector=2 (c0,c1), victor=1, stream=3, merge=1, vectors=1
    got = suggest_corrections(idx, ["vektor", "stream", "zzzzz"],
                              max_edits=1).to_pylist()
    assert got == [
        {"query_term": "stream", "suggestion": "stream", "df": 3},
        {"query_term": "vektor", "suggestion": "vector", "df": 2},
    ]
    # distance-2 expansion reaches victor too, but vector's df wins
    got2 = suggest_corrections(idx, ["vektor"], max_edits=2).to_pylist()
    assert got2 == [{"query_term": "vektor", "suggestion": "vector",
                     "df": 2}]


def test_trigram_sidecar_prunes_leading_wildcard(ray_session, tmp_path):
    """Leading-wildcard patterns with a 3+-char literal run resolve via
    the trigram sidecar (pg_trgm scheme) — identical results to the
    dictionary scan, sidecar invalidated when the dictionary changes."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vframe_ray.index import fuzzy
    from vframe_ray.index.query import expand_like_patterns
    idx = _planted_index(tmp_path)
    # trigram path: run "ctor" -> grams {cto, tor}
    exp = expand_like_patterns(idx, ["*ctor", "*ector?", "*tream"])
    assert exp["*ctor"] == ["vector", "victor"]
    assert exp["*ector?"] == ["vectors"]
    assert exp["*tream"] == ["stream"]
    t1 = fuzzy.trigram_table_dir(idx)
    assert os.path.isdir(t1)             # sidecar was built on demand
    # candidates are a verified superset: "*ctors" shares grams with
    # vector/victor but only vectors matches
    assert expand_like_patterns(idx, ["*ctors"])["*ctors"] == ["vectors"]
    # no 3-char literal run -> scan fallback, still correct
    assert expand_like_patterns(idx, ["*or"])["*or"] == \
        ["vector", "victor"]
    # property: sidecar path == brute regex over the dictionary
    import re
    gdir = os.path.join(idx, "global", "terms")
    files = [os.path.join(gdir, f) for f in sorted(os.listdir(gdir))
             if f.endswith(".parquet")]
    vocab = sorted(set(pq.ParquetDataset(files).read(
        columns=["term"])["term"].to_pylist()))
    rng = np.random.default_rng(11)
    pats = []
    for _ in range(25):
        t = vocab[int(rng.integers(0, len(vocab)))]
        i = int(rng.integers(0, max(1, len(t) - 3)))
        pats.append("*" + t[i:i + 4] + ("*" if rng.random() < 0.5
                                        else ""))
    got = expand_like_patterns(idx, pats)
    for p in pats:
        rx = re.compile("^" + p.replace("*", ".*").replace("?", ".")
                        + "$")
        assert got[p] == sorted(v for v in vocab if rx.match(v)), p
    # dictionary rewrite invalidates the sidecar fingerprint
    extra = pa.table({"term": pa.array(["zzzctor"]),
                      "df": pa.array([1], pa.int64()),
                      "cf": pa.array([1], pa.int64())})
    pq.write_table(extra, os.path.join(gdir, "part-zz.parquet"))
    assert fuzzy.trigram_table_dir(idx) != t1
    exp2 = expand_like_patterns(idx, ["*ctor"])
    assert exp2["*ctor"] == ["vector", "victor", "zzzctor"]
    assert not os.path.exists(t1)        # stale sidecar swept
