"""Posting-list codec: delta + LEB128 varint, block-structured.

The reference has no columnar state; its nearest analog is the binary
mask blobs inside ``SegmentResult`` (reference:
src/vframe/models/cvmodels.py:126-141) and the 64-bit perceptual hashes
(im_utils.py:37-47).  Here the custom columnar state is the posting
list: per term, doc ids sorted ascending are delta-encoded and
varint-compressed in blocks of ``block_size`` docs; each block stores
``(last_doc, max_tf, min_dl, byte offsets)`` so

- a query can *skip decode* straight to a block (delta encoding restarts
  at every block boundary with an absolute first doc id), and
- a BM25 score upper bound per block is computable at query time from
  (max_tf, min_dl) and the *global* avgdl — the build never needs global
  stats (block-max WAND, SURVEY.md §7.1 step 5).

All encode/decode paths are numpy-vectorized (no per-int Python loops):
encode scatters byte ``j`` of every value in one fancy-indexed store
(≤10 passes for uint64); decode reconstructs 7-bit groups with one
``np.add.reduceat`` over value boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: one pass per byte position."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    # nbytes[i] = 1 + number of thresholds 2^(7k) that v[i] reaches
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    starts = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=starts[1:])
    out = np.zeros(starts[-1], dtype=np.uint8)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        idx = starts[:-1][sel] + j
        byte = (v[sel] >> _U64(7 * j)) & _MASK7
        byte = byte.astype(np.uint8)
        cont = (nbytes[sel] - 1 > j)
        out[idx] = byte | np.where(cont, _CONT, np.uint8(0))
    return out.tobytes()


def decode_varint(buf: bytes | memoryview | np.ndarray, count: int | None = None
                  ) -> np.ndarray:
    """Decode LEB128 bytes back to uint64. Vectorized via reduceat."""
    arr = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if arr.size == 0:
        return np.empty(0, dtype=_U64)
    is_end = arr < _CONT
    # value start = 0 or position right after an end byte
    starts = np.empty(arr.size, dtype=bool)
    starts[0] = True
    np.logical_not(is_end[:-1], out=starts[1:])
    np.logical_not(starts[1:], out=starts[1:])  # starts[1:] = is_end[:-1]
    start_idx = np.flatnonzero(starts)
    # byte position within its value
    vid = np.cumsum(starts) - 1
    pos = np.arange(arr.size, dtype=np.int64) - start_idx[vid]
    contrib = (arr.astype(_U64) & _MASK7) << (_SEVEN * pos.astype(_U64))
    vals = np.add.reduceat(contrib, start_idx)
    if count is not None and vals.size != count:
        raise ValueError(f"decoded {vals.size} varints, expected {count}")
    return vals


@dataclass
class TermPostings:
    """Encoded postings for one term within one segment."""

    n_docs: int
    blob: bytes                     # [docs varints][tfs varints][pos varints]
    block_last_doc: np.ndarray      # int64 per block — max doc id in block
    block_max_tf: np.ndarray        # int32 per block
    block_min_dl: np.ndarray        # int32 per block
    block_doc_off: np.ndarray       # int64 byte offset of block's doc deltas
    block_tf_off: np.ndarray        # int64 byte offset of block's tfs
    tf_section_off: int             # blob offset where tf section starts
    pos_section_off: int            # blob offset where positions section starts

    @property
    def n_blocks(self) -> int:
        return len(self.block_last_doc)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray,
                    positions: np.ndarray | None, block_size: int) -> TermPostings:
    """Encode one term's postings.

    ``doc_ids`` strictly ascending int64; ``tfs`` int; ``doclens`` doc length
    of each posting's doc; ``positions`` concatenated token positions
    (sum(tfs) entries, each doc's positions ascending) or None.
    Delta encoding restarts at each block boundary (first doc absolute).
    """
    n = len(doc_ids)
    assert n > 0
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    nblocks = (n + block_size - 1) // block_size
    bounds = np.arange(0, nblocks * block_size, block_size)

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    deltas[bounds] = doc_ids[bounds]          # restart: absolute first-doc

    doc_chunks, doc_offs = [], np.zeros(nblocks, dtype=np.int64)
    off = 0
    for bi in range(nblocks):
        enc = encode_varint(deltas[bounds[bi]:bounds[bi] + block_size])
        doc_offs[bi] = off
        off += len(enc)
        doc_chunks.append(enc)
    docs_section = b"".join(doc_chunks)

    tf_chunks, tf_offs = [], np.zeros(nblocks, dtype=np.int64)
    toff = 0
    for bi in range(nblocks):
        enc = encode_varint(tfs[bounds[bi]:bounds[bi] + block_size])
        tf_offs[bi] = toff
        toff += len(enc)
        tf_chunks.append(enc)
    tfs_section = b"".join(tf_chunks)

    if positions is not None and len(positions):
        pos = np.ascontiguousarray(positions, dtype=np.int64)
        # delta within each doc's run (first position absolute per doc)
        pdel = np.empty(len(pos), dtype=np.int64)
        pdel[0] = pos[0]
        np.subtract(pos[1:], pos[:-1], out=pdel[1:])
        run_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(tfs[:-1], out=run_starts[1:])
        pdel[run_starts] = pos[run_starts]
        pos_section = encode_varint(pdel)
    else:
        pos_section = b""

    ends = np.minimum(bounds + block_size, n) - 1
    last_doc = doc_ids[ends]
    max_tf = np.maximum.reduceat(tfs, bounds).astype(np.int32)
    min_dl = np.minimum.reduceat(
        np.ascontiguousarray(doclens, dtype=np.int64), bounds).astype(np.int32)

    return TermPostings(
        n_docs=n,
        blob=docs_section + tfs_section + pos_section,
        block_last_doc=last_doc,
        block_max_tf=max_tf,
        block_min_dl=min_dl,
        block_doc_off=doc_offs,
        block_tf_off=tf_offs,
        tf_section_off=len(docs_section),
        pos_section_off=len(docs_section) + len(tfs_section),
    )


def decode_block(tp: TermPostings, block_idx: int, block_size: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids int64, tfs int64) without touching
    other blocks (the skip path WAND relies on)."""
    lo = block_idx * block_size
    cnt = min(block_size, tp.n_docs - lo)
    dstart = int(tp.block_doc_off[block_idx])
    dend = int(tp.block_doc_off[block_idx + 1]) if block_idx + 1 < tp.n_blocks \
        else tp.tf_section_off
    deltas = decode_varint(memoryview(tp.blob)[dstart:dend], cnt).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tstart = tp.tf_section_off + int(tp.block_tf_off[block_idx])
    tend = tp.tf_section_off + (int(tp.block_tf_off[block_idx + 1])
                                if block_idx + 1 < tp.n_blocks
                                else tp.pos_section_off - tp.tf_section_off)
    tfs = decode_varint(memoryview(tp.blob)[tstart:tend], cnt).astype(np.int64)
    return doc_ids, tfs


def decode_all(tp: TermPostings, block_size: int,
               with_positions: bool = False):
    """Decode full postings -> (doc_ids, tfs[, positions list-offsets + flat])."""
    parts_d, parts_t = [], []
    for bi in range(tp.n_blocks):
        d, t = decode_block(tp, bi, block_size)
        parts_d.append(d)
        parts_t.append(t)
    doc_ids = np.concatenate(parts_d)
    tfs = np.concatenate(parts_t)
    if not with_positions:
        return doc_ids, tfs
    pdel = decode_varint(memoryview(tp.blob)[tp.pos_section_off:]).astype(np.int64)
    if pdel.size:
        run_starts = np.zeros(tp.n_docs, dtype=np.int64)
        np.cumsum(tfs[:-1], out=run_starts[1:])
        pos = np.cumsum(pdel)
        # undo cross-run cumsum leakage: subtract carry at run starts
        carry = pos[run_starts] - pdel[run_starts]
        pos -= np.repeat(carry, tfs)
    else:
        pos = pdel
    return doc_ids, tfs, pos
