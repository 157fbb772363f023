import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from vframe_ray.index.codec import (decode_all, decode_block, decode_varint,
                                    encode_postings, encode_varint)


def test_varint_roundtrip_edges():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63,
                  2**64 - 1], dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


def test_varint_empty():
    assert encode_varint(np.empty(0, dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=500))
def test_varint_roundtrip_random(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


@pytest.mark.parametrize("block_size", [4, 16, 128])
@pytest.mark.parametrize("n", [1, 7, 128, 129, 1000])
def test_postings_roundtrip(n, block_size):
    rng = np.random.default_rng(n * block_size)
    docs = np.sort(rng.choice(10 ** 6, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 20, n).astype(np.int64)
    dls = rng.integers(1, 400, n).astype(np.int64)
    pos = np.concatenate([np.sort(rng.choice(500, t, replace=False))
                          for t in tfs])
    tp = encode_postings(docs, tfs, dls, pos, block_size)
    d, t = decode_all(tp, block_size)
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)
    d, t, p = decode_all(tp, block_size, with_positions=True)
    assert np.array_equal(p, pos)
    # per-block decode matches slices; block metadata is exact
    nblocks = (n + block_size - 1) // block_size
    assert tp.n_blocks == nblocks
    for bi in range(nblocks):
        db, tb = decode_block(tp, bi, block_size)
        lo, hi = bi * block_size, min((bi + 1) * block_size, n)
        assert np.array_equal(db, docs[lo:hi])
        assert np.array_equal(tb, tfs[lo:hi])
        assert tp.block_last_doc[bi] == docs[hi - 1]
        assert tp.block_max_tf[bi] == tfs[lo:hi].max()
        assert tp.block_min_dl[bi] == dls[lo:hi].min()


def test_postings_compression_is_effective():
    docs = np.arange(0, 100_000, 7, dtype=np.int64)   # small deltas
    tfs = np.ones(len(docs), dtype=np.int64)
    dls = np.full(len(docs), 100, dtype=np.int64)
    tp = encode_postings(docs, tfs, dls, None, 128)
    # delta+varint: ~1 byte per doc delta + 1 per tf (vs 16 raw)
    assert len(tp.blob) < len(docs) * 3
