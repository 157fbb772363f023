"""Shared oracle-portable hashing kernels (vectorized) + SQL fragments.

Every content hash in the dedup / text-analysis family derives from ONE
primitive so the DuckDB correctness oracle can recompute it exactly:

    token_hash64(s) = first 8 bytes of md5(s), big-endian
                    = ('0x' || substr(md5(s), 1, 16))::UBIGINT   (DuckDB)

The engine never hashes token-by-token in Python: a batch's flattened
token stream is dictionary-encoded (C++ hash table), md5 runs once per
*unique* string (hashlib releases the GIL and vocabularies are tiny
relative to token streams), and the codes gather the per-token hashes.

The reference's equivalent primitive is its per-file sha256 identity
(reference: src/vframe/utils/file_utils.py:50-60) and 64-bit perceptual
hash (im_utils.py:37-47); here both are recast over normalized tokens.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE31 = (1 << 31) - 1          # modulus for MinHash universal hashing
U64 = np.uint64


def md5_u64(strings) -> np.ndarray:
    """64-bit md5 prefix per string (uint64).  Call on *unique* values
    (a dictionary), never on a raw token stream.

    For Arrow string arrays the hash runs over memoryview slices of the
    value buffer directly — no per-element Python str materialization or
    re-encode (~2× over a to_pylist loop)."""
    md5 = hashlib.md5
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array) and pa.types.is_string(strings.type) \
            and strings.null_count == 0:
        bufs = strings.buffers()          # [validity, offsets, data]
        offs = np.frombuffer(bufs[1], dtype=np.int32,
                             count=len(strings) + 1 + strings.offset)
        offs = offs[strings.offset:]
        data = memoryview(bufs[2])
        return np.fromiter(
            (int.from_bytes(md5(data[offs[i]:offs[i + 1]]).digest()[:8],
                            "big") for i in range(len(strings))),
            dtype=np.uint64, count=len(strings))
    if isinstance(strings, pa.Array):
        strings = strings.to_pylist()
    return np.array(
        [int.from_bytes(md5((s or "").encode()).digest()[:8], "big")
         for s in strings],
        dtype=np.uint64)


SQL_TOKEN_HASH = "('0x' || substr(md5({col}), 1, 16))::UBIGINT"


def sql_u64_to_i64(expr: str) -> str:
    """SQL: reinterpret an UBIGINT value as signed int64 (two's complement),
    the numpy ``.astype(np.int64)`` view equivalent."""
    return (f"CASE WHEN ({expr}) >= 9223372036854775808 "
            f"THEN (({expr})::HUGEINT - 18446744073709551616)::BIGINT "
            f"ELSE ({expr})::BIGINT END")


# ------------------------------------------------------------ token streams

def flat_tokens(tokenizer, texts) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Tokenize a batch column -> (parents, flat_tokens, counts).

    parents: int64 row index per token (non-decreasing, row order);
    flat:    string array of tokens in (row, position) order;
    counts:  tokens per row (int64, len = n_rows).
    """
    toks = tokenizer.tokenize_array(texts)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return parents, flat, counts


def dict_hash_u64(flat: pa.Array) -> np.ndarray:
    """Per-element token_hash64 of a string array, md5 run once per
    unique value via dictionary encoding."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    vocab_hash = md5_u64(denc.dictionary)
    return vocab_hash[codes]


def row_starts_nz(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts_of_nonempty_rows, nonempty_mask) for ``ufunc.reduceat``
    segment reduction over a flattened row-major stream."""
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    nz = counts > 0
    return starts[nz], nz


def segment_reduce(ufunc, values: np.ndarray, counts: np.ndarray,
                   empty=0) -> np.ndarray:
    """Per-row ``ufunc`` reduction of a flattened stream; ``empty`` fills
    rows with zero tokens.  (np.add/bitwise_xor/minimum).reduceat over the
    starts of nonempty rows — dropping empty rows' duplicate start offsets
    yields exactly the nonempty segments."""
    out = np.full(len(counts), empty, dtype=values.dtype)
    if len(values):
        starts, nz = row_starts_nz(counts)
        if starts.size:
            out[nz] = ufunc.reduceat(values, starts)
    return out


# --------------------------------------------------------------- shingles

def shingle_rows(tokenizer, texts, n: int,
                 ) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Distinct n-token shingles per row, fully vectorized.

    Returns (parents, shingle_strings, sizes): one entry per DISTINCT
    (row, shingle); ``sizes[i]`` = the distinct-shingle count of the row
    ``parents[i]`` belongs to (aligned with parents).  Rows with
    0 < n_tokens < n contribute their whole token stream as one shingle;
    empty rows contribute nothing — the vectorized restatement of
    ``_shingle_set`` (tested identical in tests/test_stages.py).
    """
    toks = tokenizer.tokenize_array(texts)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ntok = len(flat)
    pieces_parents: list[np.ndarray] = []
    pieces_str: list[pa.Array] = []
    # join kernels require the separator to match the token type
    # (large_string corpora tokenize to large_string — a plain " "
    # scalar has no matching kernel)
    sep = pa.scalar(" ", flat.type) if ntok else " "

    if ntok >= n:
        # full windows: positions i..i+n-1 within one row
        joined = pc.binary_join_element_wise(
            *[flat.slice(j, ntok - n + 1) for j in range(n)], sep)
        valid = parents[: ntok - n + 1] == parents[n - 1:]
        if valid.any():
            vmask = pa.array(valid)
            pieces_parents.append(parents[: ntok - n + 1][valid])
            pieces_str.append(joined.filter(vmask))

    short = (counts > 0) & (counts < n)
    if short.any():
        # whole-row join for rows shorter than the window
        short_lists = toks.take(pa.array(np.flatnonzero(short)))
        if pa.types.is_large_list(short_lists.type) and \
                pa.types.is_large_string(short_lists.type.value_type):
            # binary_join has no (large_list<large_string>, scalar)
            # kernel (surfaces only on large_string corpora)
            short_lists = short_lists.cast(pa.large_list(pa.string()))
        pieces_parents.append(np.flatnonzero(short))
        pieces_str.append(pc.binary_join(short_lists, " "))

    if not pieces_str:
        return (np.empty(0, dtype=np.int64), pa.array([], pa.string()),
                np.empty(0, dtype=np.int64))

    all_parents = np.concatenate(pieces_parents)
    # normalize every piece to plain string so the concat (and every
    # downstream block schema) is type-stable regardless of whether the
    # input column was string or large_string; per-block shingle bytes
    # stay far under the 2 GB small-offset limit (blocks are bounded)
    pieces_str = [p.combine_chunks() if isinstance(p, pa.ChunkedArray)
                  else p for p in pieces_str]
    pieces_str = [p.cast(pa.string()) if p.type != pa.string() else p
                  for p in pieces_str]
    all_str = pa.concat_arrays(pieces_str)
    # distinct per row: dictionary codes + lexsort + adjacent-dup drop
    denc = pc.dictionary_encode(all_str)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, all_parents))
    ps, cs = all_parents[order], codes[order]
    keep = np.empty(len(ps), dtype=bool)
    keep[0] = True
    np.logical_or(ps[1:] != ps[:-1], cs[1:] != cs[:-1], out=keep[1:])
    ps, cs = ps[keep], cs[keep]
    sizes_per_row = np.bincount(ps, minlength=len(counts))
    strings = denc.dictionary.take(pa.array(cs))
    return ps, strings, sizes_per_row[ps].astype(np.int64)


def ordered_shingles(tokenizer, texts, n: int
                     ) -> tuple[np.ndarray, pa.Array]:
    """POSITION-ORDERED full-window n-gram shingles per row (no per-row
    dedupe, no short-row fallback — the winnowing k-gram stream).

    Returns (parents, shingle_strings): entry i is the shingle starting
    at token position i of its row; rows with fewer than n tokens
    contribute nothing.
    """
    toks = tokenizer.tokenize_array(texts)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ntok = len(flat)
    if ntok < n:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    joined = pc.binary_join_element_wise(
        *[flat.slice(j, ntok - n + 1) for j in range(n)], " ")
    valid = parents[: ntok - n + 1] == parents[n - 1:]
    return parents[: ntok - n + 1][valid], joined.filter(pa.array(valid))


def sql_shingles_cte(n: int = 3) -> str:
    """DuckDB CTE fragment (appended after the shared tok CTE, which must
    expose (_id, term, pos)) producing distinct (_id, s) shingles with the
    exact :func:`shingle_rows` rule.  ADVICE.md: derived from the shared
    analyzer CTE, not an ad-hoc string_split."""
    joins = " || ' ' || ".join(f"a[i+{j}]" for j in range(n))
    return f"""
 arr AS (SELECT _id, list(term ORDER BY pos) AS a FROM tok GROUP BY _id),
 sh AS (SELECT DISTINCT _id, s FROM (
    SELECT _id, {joins} AS s
    FROM (SELECT _id, a,
                 unnest(generate_series(1, greatest(len(a) - {n - 1}, 0)))
                   AS i
          FROM arr)
    UNION ALL
    SELECT _id, array_to_string(a, ' ') AS s FROM arr
    WHERE len(a) >= 1 AND len(a) < {n}))"""
