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
