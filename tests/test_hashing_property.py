"""Property tests: vectorized hash/shingle kernels vs scalar oracles on
arbitrary text (hypothesis drives unicode, whitespace runs, punctuation,
empty strings — the shapes ADVICE.md round 1 flagged as oracle-divergent
for ad-hoc implementations)."""

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from vframe_ray.analyze import Tokenizer
from vframe_ray.stages import hashing as H
from vframe_ray.stages.dedup import SimHashStage, _shingle_set

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs"),
            whitelist_characters=" \t\n-_.,!?éßñ中"),
        max_size=60),
    min_size=1, max_size=12)

tok = Tokenizer()


def th64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


@settings(max_examples=30, deadline=None)
@given(texts_strategy)
def test_flat_tokens_matches_scalar(texts):
    arr = pa.array(texts, pa.string())
    parents, flat, counts = H.flat_tokens(tok, arr)
    toks = flat.to_pylist()
    off = 0
    for i, t in enumerate(texts):
        want = tok.tokenize(t)
        assert toks[off:off + counts[i]] == want
        off += counts[i]


@settings(max_examples=30, deadline=None)
@given(texts_strategy, st.integers(min_value=1, max_value=4))
def test_shingle_rows_matches_scalar(texts, n):
    arr = pa.array(texts, pa.string())
    ps, ss, _sz = H.shingle_rows(tok, arr, n)
    got = {}
    for p, s in zip(ps, ss.to_pylist()):
        got.setdefault(int(p), set()).add(s)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _shingle_set(tok.tokenize(t), n)


@settings(max_examples=20, deadline=None)
@given(texts_strategy)
def test_fingerprint_matches_scalar(texts):
    from vframe_ray.stages.textquality import FingerprintStage
    stage = FingerprintStage()
    out = stage(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())}))
    fps = out["fingerprint"].to_pylist()
    for i, t in enumerate(texts):
        acc = np.uint64(0)
        for pos, w in enumerate(tok.tokenize(t)):
            with np.errstate(over="ignore"):
                acc ^= np.uint64(th64(w)) * np.uint64(2 * pos + 1)
        assert fps[i] == int(acc.astype(np.int64))


@settings(max_examples=20, deadline=None)
@given(texts_strategy)
def test_simhash_matches_scalar(texts):
    stage = SimHashStage()
    out = stage(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())}))
    hs = out["simhash"].to_pylist()
    for i, t in enumerate(texts):
        want = int(np.uint64(SimHashStage.simhash64(tok.tokenize(t)))
                   .astype(np.int64))
        assert hs[i] == want
