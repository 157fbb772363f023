"""Document chunking and sequence packing — the two reshaping steps
every LLM training-data pipeline runs between raw documents and model
batches (the text analog of the reference's frame sampling /
save-video container regrouping, media.py:343-384).

Both operators are deterministic and SQL-mirrorable, so they carry
exact DuckDB oracles like every other ``queries()`` entry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analyze import Tokenizer
from ..config import AnalyzerConfig


def chunk_documents(ds, *, size: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text",
                    cfg: AnalyzerConfig | None = None):
    """Split each document into token-window chunks: chunk ``i`` covers
    analyzed tokens ``[i*stride, i*stride + size)`` for every start
    below the doc's token count (so tail chunks may be short and a
    0-token doc yields no chunks).  Overlap = ``size - stride``.

    Vectorized: one ``tokenize_array`` per batch, then one
    ``pc.list_slice`` + ``binary_join`` per CHUNK ORDINAL (a small
    bounded loop over ceil(max_len/stride) values, never over rows).
    Streams block-by-block; output rows ≈ input tokens / stride.

    Returns a Dataset of (id_col, chunk_idx, n_tokens, chunk_text).
    """
    tok = Tokenizer(cfg)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "chunk_idx": pa.array([], pa.int32()),
                      "n_tokens": pa.array([], pa.int64()),
                      "chunk_text": pa.array([], pa.string())})

    def stage(batch: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(batch[text_col])
        n = pc.list_value_length(tokens).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = batch[id_col]
        if n.size == 0 or int(n.max()) == 0:
            return empty
        out = []
        max_chunks = int(-(-(int(n.max())) // stride))
        for ci in range(max_chunks):
            keep = n > ci * stride
            if not keep.any():
                break
            mask = pa.array(keep)
            sliced = pc.list_slice(tokens.filter(mask), ci * stride,
                                   ci * stride + size)
            out.append(pa.table({
                id_col: ids.filter(mask),
                "chunk_idx": pa.array(
                    np.full(int(keep.sum()), ci, dtype=np.int32)),
                "n_tokens": pc.cast(pc.list_value_length(sliced),
                                    pa.int64()),
                "chunk_text": pc.binary_join(
                    pc.cast(sliced, pa.list_(pa.string())), " "),
            }))
        return pa.concat_tables(out)

    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)


def pack_sequences(ds, *, budget: int = 512, group_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   cfg: AnalyzerConfig | None = None):
    """Greedy sequential sequence packing: within each ``group_col``
    (documents ordered by ``id_col``), a doc joins sequence
    ``prior_tokens // budget`` where ``prior_tokens`` is the running
    token total BEFORE it — the deterministic streaming packer
    (sequences fill to ≥ budget then roll over; a window cumsum, so the
    exact same rule is one SQL window expression).

    Distributed as a per-group ``map_groups``: the only exchange is the
    groupby(``group_col``) shuffle; the cumsum inside a group is
    sequential by definition (np.cumsum, no Python loop).  Assumes a
    group's docs fit one reducer — at larger scale pre-split groups by
    id range and offset the running totals (documented assumption, same
    as sessionize).

    Returns a Dataset of (id_col, group_col, n_tokens, seq_id).
    """
    from ..runtime import arrow_group

    tok = Tokenizer(cfg)

    def count_tokens(batch: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(batch[text_col])
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            "n_tokens": pc.cast(pc.list_value_length(tokens), pa.int64()),
        })

    counted = ds.map_batches(count_tokens, batch_format="pyarrow",
                             zero_copy_batch=True)

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col).reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        prior = np.cumsum(n) - n
        g["seq_id"] = prior // budget
        return arrow_group(g[[id_col, group_col, "n_tokens", "seq_id"]])

    return counted.groupby(group_col).map_groups(pack,
                                                 batch_format="pandas")
