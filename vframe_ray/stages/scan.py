"""Distributed global prefix scan (cumulative sums across a Dataset's
TOTAL order) — the parallel-scan primitive behind Pareto curves,
cumulative-share reports and global rank accounting.

Ray Data has per-key windows (groupby) but no global running total: a
scan needs every block to know the sum of everything BEFORE it.  This
is the textbook two-phase parallel scan expressed on block refs — the
documented raw-Ray-tasks exception (custom-operator rule c): the
Dataset API cannot express "block i sees an offset computed from blocks
0..i-1" without serializing execution.

Physical plan:
1. one streamed execution materializes the (already sorted) blocks;
2. a tiny remote task per block returns its column sums (bytes moved:
   O(blocks x cols) scalars, never rows);
3. the driver exclusive-prefix-sums them (O(blocks), trivially small
   even at 10^6 blocks);
4. a remote task per block emits the block's vectorized cumsum + its
   carried offset; `from_arrow_refs` reassembles the Dataset in order.

Partitioning assumption: NONE on data size (blocks stay put, each is
touched exactly twice); the input must already be globally sorted —
`Dataset.sort` provides that, and block order is the dataset order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_arrow(blk) -> pa.Table:
    # blocks are Arrow for every engine pipeline; normalize pandas
    # blocks (e.g. from_pandas test inputs) at the task boundary
    return blk if isinstance(blk, pa.Table) \
        else pa.Table.from_pandas(blk, preserve_index=False) \
        .replace_schema_metadata(None)


@ray.remote(num_returns=1)
def _block_sums(blk, cols: list) -> np.ndarray:
    blk = _as_arrow(blk)
    return np.array(
        [blk[c].to_numpy(zero_copy_only=False).astype(np.int64).sum()
         if blk.num_rows else 0 for c in cols], dtype=np.int64)


@ray.remote(num_returns=1)
def _block_scan(blk, cols: list, offsets: np.ndarray,
                prefix: str) -> pa.Table:
    blk = _as_arrow(blk)
    for i, c in enumerate(cols):
        v = blk[c].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = blk.append_column(prefix + c,
                                pa.array(np.cumsum(v) + offsets[i]))
    return blk


def global_prefix_scan(ds, cols: list, prefix: str = "cum_"):
    """Append inclusive global running totals of int64 ``cols``.

    Returns ``(scanned_dataset, grand_totals)`` — the totals come free
    from the reduce phase, so callers computing shares need no extra
    pass.  Row order (and block order) is preserved."""
    from ..runtime import block_refs
    refs = block_refs(ds)
    cols = list(cols)
    sums = ray.get([_block_sums.remote(r, cols) for r in refs]) \
        if refs else []
    totals = (np.sum(sums, axis=0) if refs
              else np.zeros(len(cols), dtype=np.int64))
    # exclusive prefix: block i's carried offset
    offsets = np.zeros((len(refs), len(cols)), dtype=np.int64)
    if len(refs) > 1:
        offsets[1:] = np.cumsum(sums[:-1], axis=0)
    out_refs = [_block_scan.remote(r, cols, offsets[i], prefix)
                for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out_refs), totals
