"""Deterministic stratified hash sampling.

A 100-TB training-data pipeline downsamples by stratum (language, source,
quality band) with *reproducible* membership: whether a row is kept must
be a pure function of the row, not of partitioning, execution order, or
an RNG stream — otherwise resumed/incremental runs disagree with fresh
runs.  Reference analog: `pipe open --slice/--shuffle` subsamples by
position (`src/commands/pipe/open.py:26-70`), which is exactly the
non-reproducible kind; this operator replaces it with hash gating.

Rule: keep row iff  md5_u64(str(id)) % denom < rate[stratum] * denom.
The md5-derived u64 is the engine's SQL-portable hash primitive
(`stages/hashing.md5_u64`), so the oracle recomputes membership
bit-exactly.  Embarrassingly parallel — one vectorized ``map_batches``,
no shuffle, no state."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import md5_u64


def stratified_hash_sample(ds, *, strata_col: str, id_col: str,
                           rates: dict[str, float], default_rate: float,
                           denom: int = 10000):
    """Per-stratum deterministic sample of a Dataset (see module doc)."""
    thresholds = {k: int(round(v * denom)) for k, v in rates.items()}
    default_thr = int(round(default_rate * denom))

    def keep(t: pa.Table) -> pa.Table:
        # Arrow-side decimal rendering == DuckDB's ::VARCHAR; md5_u64's
        # fast path hashes the value buffer without per-row Python objects.
        ids = pc.cast(t[id_col], pa.string()).combine_chunks()
        h = md5_u64(ids) % denom
        thr = pd.Series(t[strata_col].to_pandas()) \
            .map(thresholds).fillna(default_thr).to_numpy(dtype=np.uint64)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")
