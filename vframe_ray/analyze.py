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
        return pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), values
        )

    def doc_lengths(self, tokens: pa.ListArray) -> pa.Array:
        return pc.cast(pc.list_value_length(tokens), pa.int32())


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
