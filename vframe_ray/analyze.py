"""Text normalization + tokenization.

The analyzer plays the role of the reference's per-frame preprocessing
(resize/letterbox before DNN inference — reference:
src/vframe/image/processors/base.py:57-83, src/commands/pipe/resize.py) and
its registry-of-named-transforms pattern (reference: im_utils.py:761-775):
a pure, versioned function from payload to model-ready features.

The token rule is oracle-portable by construction: *lowercase, then take
maximal runs of ``[a-z0-9]``*.  The exact same rule is expressed three ways
and must agree byte-for-byte (tested in tests/test_analyze.py):

- Python  : ``re.findall('[a-z0-9]+', text.lower())``  (the oracle)
- Arrow   : ``utf8_lower`` + ``split_pattern_regex`` + empty-filter
  (the vectorized hot path used inside ``map_batches``)
- DuckDB  : ``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))``
  with ``token <> ''``  (the driver's SQL correctness oracle)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import AnalyzerConfig

_SPLIT_PATTERN = "[^a-z0-9]+"


class Tokenizer:
    """Compiled analyzer; build once per actor (reference pattern:
    model loaded once before the loop, src/commands/pipe/detect.py:73)."""

    def __init__(self, cfg: AnalyzerConfig | None = None):
        self.cfg = cfg or AnalyzerConfig()
        self.cfg.validate()
        self._rx = re.compile(self.cfg.token_pattern)

    # ---------- scalar path (oracle / tests) ----------

    def tokenize(self, text: str) -> list[str]:
        if text is None:
            return []
        if self.cfg.lowercase:
            # utf8proc lowercase via the Arrow kernel, NOT str.lower():
            # Python's full Unicode lowering diverges on chars like
            # Turkish 'İ' ('i' + combining dot vs plain 'i'), while
            # Arrow and DuckDB agree — the scalar path must match the
            # vectorized hot path and the SQL oracle byte-for-byte
            # (found by tests/test_hashing_property.py).
            text = pc.utf8_lower(pa.array([text]))[0].as_py()
        toks = self._rx.findall(text)
        if self.cfg.stopwords:
            toks = [t for t in toks if t not in self.cfg.stopwords]
        if self.cfg.stem == "s":
            toks = [s_stem(t) for t in toks]
        return toks

    # ---------- vectorized path (map_batches hot path) ----------

    def tokenize_array(self, texts: pa.Array | pa.ChunkedArray) -> pa.ListArray:
        """Vectorized tokenization: ``large_list<string>`` per input row.

        Uses Arrow kernels end-to-end (no per-row Python) — the analog of
        keeping the reference's per-frame ops in OpenCV/numpy rather than
        Python loops.
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        low = pc.utf8_lower(texts) if self.cfg.lowercase else texts
        # split_pattern_regex leaves "" fragments at boundaries; rebuild the
        # list array keeping only non-empty fragments.
        splits = pc.split_pattern_regex(low, pattern=_SPLIT_PATTERN)
        flat = pc.list_flatten(splits)
        parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if self.cfg.stopwords:
            stop_arr = pa.array(sorted(self.cfg.stopwords), type=pa.string())
            keep &= np.invert(
                pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
            )
        kept_parents = parents[keep]
        # offsets: number of kept tokens per row -> cumulative
        counts = np.bincount(kept_parents, minlength=len(texts))
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        values = flat.filter(pa.array(keep))
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if self.cfg.stem == "s":
            values = s_stem_array(values)
        return pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), values
        )

    def doc_lengths(self, tokens: pa.ListArray) -> pa.Array:
        return pc.cast(pc.list_value_length(tokens), pa.int32())


def s_stem(t: str) -> str:
    """Harman S-stemmer (scalar oracle): ies→y, es→-s, s→'' with the
    classic exception suffixes; words of ≤2 chars pass through.  Must
    agree byte-for-byte with :func:`s_stem_array` and
    :func:`sql_stem_expr` (tested in tests/test_analyze.py)."""
    if len(t) <= 2:
        return t
    if t.endswith("ies") and not (t.endswith("eies")
                                  or t.endswith("aies")):
        return t[:-3] + "y"
    if t.endswith("es") and not (t.endswith("aes") or t.endswith("ees")
                                 or t.endswith("oes")):
        return t[:-1]
    if t.endswith("s") and not (t.endswith("us") or t.endswith("ss")):
        return t[:-1]
    return t


def s_stem_array(v: pa.Array) -> pa.Array:
    """Vectorized S-stemmer: Arrow kernels only (drop-last-k expressed
    as reverse → fixed slice → reverse, since slice bounds can't vary
    per row).  Tokens are ASCII ``[a-z0-9]+`` so codepoint ops are
    byte ops."""
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()

    def e(s: str):
        return pc.ends_with(v, pattern=s)

    long_enough = pc.greater(pc.utf8_length(v), 2)
    m1 = pc.and_(e("ies"),
                 pc.invert(pc.or_(e("eies"), e("aies"))))
    m2 = pc.and_(e("es"),
                 pc.invert(pc.or_(pc.or_(e("aes"), e("ees")),
                                  e("oes"))))
    m3 = pc.and_(e("s"), pc.invert(pc.or_(e("us"), e("ss"))))
    m1 = pc.and_(m1, long_enough)
    m2 = pc.and_(pc.and_(m2, long_enough), pc.invert(m1))
    m3 = pc.and_(pc.and_(m3, long_enough),
                 pc.invert(pc.or_(m1, m2)))
    rev = pc.utf8_reverse(v)
    drop1 = pc.utf8_reverse(pc.utf8_slice_codeunits(rev, start=1))
    drop3y = pc.binary_join_element_wise(
        pc.utf8_reverse(pc.utf8_slice_codeunits(rev, start=3)), "y", "")
    return pc.if_else(m1, drop3y,
                      pc.if_else(pc.or_(m2, m3), drop1, v))


def sql_stem_expr(col: str = "term") -> str:
    """DuckDB expression mirroring :func:`s_stem` exactly (ASCII terms,
    so ``substr``/``length`` are codepoint-safe)."""
    return f"""CASE
  WHEN length({col}) <= 2 THEN {col}
  WHEN {col} LIKE '%ies' AND {col} NOT LIKE '%eies'
       AND {col} NOT LIKE '%aies'
    THEN substr({col}, 1, length({col}) - 3) || 'y'
  WHEN {col} LIKE '%es' AND {col} NOT LIKE '%aes'
       AND {col} NOT LIKE '%ees' AND {col} NOT LIKE '%oes'
    THEN substr({col}, 1, length({col}) - 1)
  WHEN {col} LIKE '%s' AND {col} NOT LIKE '%us'
       AND {col} NOT LIKE '%ss'
    THEN substr({col}, 1, length({col}) - 1)
  ELSE {col} END"""


def sql_tokens_cte(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB CTE producing (_id, term, pos) identical to
    ``Tokenizer.tokenize`` (pos = 0-based token ordinal; DuckDB zips
    parallel ``unnest`` calls of equal-length lists).

    Shared by every SQL oracle in ``__ray_entry__.oracle_sql`` so the token
    rule lives in exactly one place.
    """
    return f"""
  tok AS (
    SELECT _id, unnest(arr) AS term,
           unnest(generate_series(0, len(arr) - 1)) AS pos
    FROM (SELECT {id_col} AS _id,
                 list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                             t -> t <> '') AS arr
          FROM {table})
  )"""
