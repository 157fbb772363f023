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
