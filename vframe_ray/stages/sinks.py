"""Sinks: resumable partitioned parquet output + poison-row splitting.

- ``write_partitioned`` — one directory per partition key value
  (reference: save-images.py:44-134 subdir mirroring; save-detections.py
  per-shard suffixed JSON).  Partitioned layout is what makes output
  resumable: a rerun can skip finished partitions.
- ``split_errors`` — route rows failing a validator to an errors side
  table instead of poisoning the run (reference: media-attrs.py:79-92
  valid/errors CSV split; media.py:289-307 per-file error capture).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa


def write_partitioned(ds, out_dir: str, partition_cols: list[str],
                      **kwargs) -> None:
    """Hive-partitioned parquet (out_dir/key=value/...)."""
    ds.write_parquet(out_dir, partition_cols=partition_cols, **kwargs)


def save_files(ds, out_dir: str, *, mode: str = "copy",
               src_col: str = "filepath"):
    """Copy / move / symlink each row's file into ``out_dir`` — the
    `pipe save-file` analog (reference: src/commands/pipe/save-file.py:
    25-67: per-media copy/move/symlink with a --mode flag).  Rows pass
    through with ``saved_path`` + per-row ``error`` capture (poison rows,
    media.py:289-307 pattern); the loop is file-I/O bound by nature."""
    import os
    import shutil

    if mode not in ("copy", "move", "symlink"):
        raise ValueError(f"mode must be copy|move|symlink, got {mode!r}")

    def stage(t: pa.Table) -> pa.Table:
        os.makedirs(out_dir, exist_ok=True)
        outs, errs = [], []
        for src in t[src_col].to_pylist():
            try:
                dst = os.path.join(out_dir, os.path.basename(src))
                if mode == "copy":
                    shutil.copy2(src, dst)
                elif mode == "move":
                    shutil.move(src, dst)
                else:
                    if os.path.lexists(dst):
                        os.remove(dst)
                    os.symlink(src, dst)
                outs.append(dst)
                errs.append(None)
            except OSError as e:
                outs.append(None)
                errs.append(str(e))
        return (t.append_column("saved_path", pa.array(outs, pa.string()))
                .append_column("error", pa.array(errs, pa.string())))

    return ds.map_batches(stage, batch_format="pyarrow")


def split_errors(ds, validator: Callable[[pa.Table], "pa.BooleanArray"]):
    """Split into (valid_ds, errors_ds) by a vectorized row validator.

    The two branches re-execute the upstream read (Dataset branching);
    push the split as early as possible so the duplicated work is just
    the pruned scan.
    """
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(validator(t))

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(validator(t)))

    valid = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    errors = ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
    return valid, errors
