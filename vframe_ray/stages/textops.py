"""Per-row text transforms mapping the reference's frame-mutation ops.

- ``redact``   — mask pattern matches in the payload (reference:
  src/commands/pipe/redact.py:30-88 — blur/pixellate detected regions;
  here: regexp-mask matched spans in text).
- ``caption``  — template interpolation with ``@accessor`` substitution
  (reference: src/commands/pipe/caption.py:36-109 + accessor table
  app_cfg.py:64-88; here: column values formatted into a label string).
- ``decimate`` — keep every Nth record (reference:
  src/commands/pipe/skip-interval.py:21-45, vectorized modulo).

All vectorized Arrow kernels inside ``map_batches`` — no Python per-row
loops (the reference's per-frame OpenCV calls become pyarrow.compute).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def percolate(ds, queries: list[dict], *, id_col: str = "doc_id",
              text_col: str = "text"):
    """Reverse search (Elasticsearch percolator analog): match each
    incoming doc against a set of STANDING queries; emit (doc_id,
    query_id) for every query whose terms are ALL present in the doc —
    the streaming alerting/routing primitive (reference analog:
    skip-detections' standing include-predicates applied to every
    frame as it flows, skip-detections.py:30-53).

    Pure ``map_batches`` — zero shuffle, state is the broadcast query
    table, so the stage streams at ingest rate at any corpus size.
    Per batch: distinct (row, term) pairs once, then one vectorized
    ``isin`` + bincount per query (queries are config-sized).
    Returns a lazy Dataset of (doc_id, query_id) rows.
    """
    import numpy as np

    import ray

    from ..analyze import Tokenizer
    tok = Tokenizer()
    parsed = [(int(q["query_id"]),
               np.array(sorted(set(tok.tokenize(q["query_text"]))),
                        dtype=object))
              for q in queries]
    parsed = [(qid, terms) for qid, terms in parsed if terms.size]
    parsed_ref = ray.put(parsed)

    def match(t: pa.Table) -> pa.Table:
        qs = ray.get(parsed_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks = tok.tokenize_array(t[text_col])
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "query_id": pa.array([], pa.int32())})
        if len(flat) == 0 or not qs:
            return empty
        flat_np = flat.to_numpy(zero_copy_only=False)
        # distinct (row, term) once per batch
        terms_u, codes = np.unique(flat_np, return_inverse=True)
        pair = np.unique(codes.astype(np.int64) * t.num_rows + parents)
        p_code, p_row = pair // t.num_rows, pair % t.num_rows
        out_id, out_q = [], []
        for qid, qterms in qs:
            tsel = np.isin(terms_u, qterms)
            need = int(tsel.sum())
            if need < qterms.size:
                continue                 # a term absent corpus-wide here
            hits = np.bincount(p_row[tsel[p_code]], minlength=t.num_rows)
            rows = np.flatnonzero(hits == qterms.size)
            if rows.size:
                out_id.append(ids[rows].astype(np.int64))
                out_q.append(np.full(rows.size, qid, dtype=np.int32))
        if not out_id:
            return empty
        return pa.table({id_col: pa.array(np.concatenate(out_id)),
                         "query_id": pa.array(np.concatenate(out_q))})

    return ds.map_batches(match, batch_format="pyarrow",
                          zero_copy_batch=True)


def redact(ds, *, pattern: str = "[0-9]+", replacement: str = "■",
           text_col: str = "text", out_col: str = "text_redacted"):
    def fn(t: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(t[text_col], pattern=pattern,
                                         replacement=replacement)
        return t.append_column(out_col, red)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def caption(ds, columns: list[str], *, sep: str = ":",
            out_col: str = "caption"):
    """Join column values (cast to string) into a label — the @accessor
    template substitution, vectorized."""
    def fn(t: pa.Table) -> pa.Table:
        parts = [pc.cast(t[c], pa.string()) for c in columns]
        lab = pc.binary_join_element_wise(*parts, sep)
        return t.append_column(out_col, lab)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def decimate(ds, every_n: int, *, idx_col: str = "turn_idx"):
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        idx = t[idx_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(idx % every_n == 0))   # no mod kernel in
        # pyarrow 16; numpy modulo on the zero-copy column instead

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def analyze_tokens(ds, *, id_col: str = "doc_id",
                   text_col: str = "text"):
    """The Elasticsearch ``_analyze`` surface: explode each doc into
    its (id, pos, term) token stream under the shared analyzer rule —
    the introspection endpoint users hit to understand WHY a query
    did or didn't match.  One vectorized flatten per block, zero
    shuffle; the SQL mirror is the shared tok CTE itself (one
    analyzer definition, three executions: Python re, Arrow kernels,
    SQL — tests pin all three equal)."""
    import numpy as np
    import pyarrow as pa

    from ..analyze import Tokenizer
    from .hashing import flat_tokens

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tok = Tokenizer()
        texts = pc.fill_null(t[text_col].combine_chunks()
                             if isinstance(t[text_col], pa.ChunkedArray)
                             else t[text_col], "")
        parents, flat, counts = flat_tokens(tok, texts)
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        # position = token ordinal within its row
        pos = np.arange(len(parents), dtype=np.int64)
        if len(counts):
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            pos = pos - starts
        return pa.table({id_col: pa.array(ids[parents]),
                         "pos": pa.array(pos),
                         "term": flat})

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
