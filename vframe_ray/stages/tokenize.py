"""Tokenize stage — the engine's flagship per-batch transform.

Recasts the reference's stateful inference stage (reference:
src/commands/pipe/detect.py:40-168 — model loaded once per process,
frames queued into batches of ≤64, results written into per-frame
metadata) as a Ray Data actor-pool ``map_batches``: the compiled
analyzer is built once per actor in ``__init__`` and applied to
zero-copy Arrow batches in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analyze import Tokenizer
from ..config import AnalyzerConfig


def assign_segment_ids(conv_ids: pa.Array | pa.ChunkedArray,
                       num_segments: int) -> np.ndarray:
    """Deterministic doc->segment partitioner: ``hash64(conv_id) % S``.

    All turns of a conversation land in one segment (the reference's
    per-file container locality, media.py:255), and the hash is stable
    across processes/runs (required for resume fingerprints to line up).
    """
    vals = conv_ids.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(vals, dtype=object))  # stable uint64
    return (h % np.uint64(num_segments)).astype(np.int32)


class TokenizeStage:
    """Arrow in / Arrow out: appends ``tokens`` (large_list<string>),
    ``doclen`` (int32) and ``segment_id`` (int32) columns."""

    def __init__(self, cfg: AnalyzerConfig | None = None,
                 num_segments: int | None = None,
                 text_col: str = "text"):
        self.tok = Tokenizer(cfg)
        self.num_segments = num_segments
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = self.tok.tokenize_array(batch[self.text_col])
        out = batch.append_column("tokens", tokens)
        out = out.append_column("doclen", self.tok.doc_lengths(tokens))
        if self.num_segments is not None:
            seg = assign_segment_ids(batch["conv_id"], self.num_segments)
            out = out.append_column("segment_id", pa.array(seg, pa.int32()))
        return out


def tokenize(ds, cfg: AnalyzerConfig | None = None, *,
             num_segments: int | None = None, text_col: str = "text",
             batch_size: int = 4096, concurrency=None):
    """``ds.map_batches`` wrapper; pass ``concurrency`` to run as an actor
    pool (stateful analyzer amortized), else stateless tasks."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  zero_copy_batch=True)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        TokenizeStage if concurrency is not None else
        TokenizeStage(cfg, num_segments, text_col),
        fn_constructor_kwargs=(dict(cfg=cfg, num_segments=num_segments,
                                    text_col=text_col)
                               if concurrency is not None else None),
        **kwargs,
    )
