"""Result presentation: highlighted snippets for query hits.

The reference's `pipe draw` renders detection results onto frames for
human inspection (reference: src/commands/pipe/draw.py:68-168 — boxes,
labels, colors composited per frame).  The text engine's analog marks
the matched query terms in each hit's text: a final ``map_batches`` over
the corpus that filters to the hit set (broadcast via ``ray.put``) and
wraps matches in «» — fully vectorized (RE2 kernel), and the highlight
rule is SQL-expressible so the DuckDB oracle validates it.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray


def highlight_pattern(terms: list[str]) -> str:
    """Word-boundary alternation over the (deduped, sorted) terms —
    identical semantics in RE2 (Arrow kernel) and DuckDB.  Matches
    case-insensitively: the analyzer lowercases before matching, so a
    capitalized surface occurrence IS a hit and must be highlighted."""
    return r"(?i)\b(" + "|".join(re.escape(t) for t in sorted(set(terms))) \
        + r")\b"


def phrase_highlight_pattern(terms: list[str]) -> str:
    """Surface pattern for a CONSECUTIVE token phrase: the analyzed
    terms in order, separated by any non-token characters — robust to
    punctuation between tokens (the hostile-surface rule), identical
    semantics in RE2 and DuckDB.  Case-insensitive, and the separator
    excludes letters of BOTH cases so 'alphaXbeta' (one analyzer token)
    is never falsely highlighted as the phrase 'alpha beta' while
    'Alpha Beta' is (ADVICE r3)."""
    return (r"(?i)\b"
            + "[^a-zA-Z0-9]+".join(re.escape(t) for t in terms) + r"\b")


def highlight_hits(ds, hits: pa.Table, terms: list[str], *,
                   id_col: str = "doc_id", text_col: str = "text",
                   open_mark: str = "«", close_mark: str = "»",
                   pattern: str | None = None):
    """Join the (small) hit table against the corpus Dataset and emit
    highlighted snippets.

    ``hits`` columns: ``id_col`` + any presentation columns to carry
    through (rank, score...).  The hit table is broadcast ONCE
    (``ray.put``); each corpus batch filters by ``is_in`` and gathers the
    presentation columns with ``index_in`` — no shuffle join for a
    driver-small hit set.
    Returns a Dataset of hits.columns + ``snippet``.  ``pattern``
    overrides the default per-term alternation (e.g.
    :func:`phrase_highlight_pattern` marks whole phrase occurrences).
    """
    pattern = highlight_pattern(terms) if pattern is None else pattern
    repl = open_mark + "\\0" + close_mark
    hits_ref = ray.put(hits)

    def stage(t: pa.Table) -> pa.Table:
        h = ray.get(hits_ref)
        keys = h[id_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        idx = pc.index_in(t[id_col], value_set=keys)
        sel = pc.is_valid(idx)
        t = t.filter(sel)
        idx = idx.filter(sel)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        snip = pc.replace_substring_regex(t[text_col], pattern=pattern,
                                          replacement=repl)
        cols = {}
        for name in h.column_names:
            col = h[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(idx)
        cols["snippet"] = snip
        return pa.table(cols)

    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)
