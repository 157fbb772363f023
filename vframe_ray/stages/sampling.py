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


def weighted_hash_sample(ds, *, weight_col: str, id_col: str,
                         scale: float, denom: int = 1_000_000,
                         weight_out: str = "ht_weight"):
    """Deterministic weight-proportional (Poisson) sampling with
    Horvitz-Thompson correction weights — the training-mix primitive
    behind quality-weighted corpus downsampling (keep high-quality docs
    with higher probability, attach 1/p so downstream aggregates stay
    unbiased).

    Inclusion is a pure function of the row, exactly like
    :func:`stratified_hash_sample`: keep row iff

        md5_u64(str(id)) % denom  <  min(denom, floor(weight * scale))

    so resumed/incremental runs agree with fresh runs and the DuckDB
    oracle reproduces membership bit-exactly (floor of an IEEE multiply
    is deterministic across engines; no ``ln`` — numpy and DuckDB libm
    disagree by 1 ulp, measured, which would flip boundary rows in an
    A-ES/exponential-keys formulation).  Rows whose scaled weight
    reaches ``denom`` are kept with certainty (p = 1).  The emitted
    ``ht_weight`` column is denom/thr = 1/p, one float division on both
    sides.  Embarrassingly parallel — one vectorized ``map_batches``,
    no shuffle, no state; weights must be > 0 (thr >= 1) or the row is
    dropped with p = 0 and no HT weight exists.
    """
    def keep(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string()).combine_chunks()
        h = md5_u64(ids) % np.uint64(denom)
        w = t[weight_col].to_numpy(zero_copy_only=False)
        # clip at 0 too: a negative weight must not wrap in the uint64
        # cast — it means p = 0, row dropped
        thr = np.clip(np.floor(w * np.float64(scale)), 0.0,
                      np.float64(denom))
        sel = h < thr.astype(np.uint64)   # 0 <= thr <= denom fits uint64
        kept = t.filter(pa.array(sel))
        ht = np.float64(denom) / thr[sel]
        return kept.append_column(weight_out,
                                  pa.array(ht, pa.float64()))

    return ds.map_batches(keep, batch_format="pyarrow")


def group_topk_sample(ds, *, group_col: str, id_col: str, k: int,
                      extra_cols: tuple = ()):
    """EXACT-k deterministic sample per group: the k rows with the
    smallest ``md5_u64(str(id))`` per group value — balanced per-class
    subsets (eval sets, human-review batches) whose membership is a
    pure function of the rows themselves, so resumed/incremental runs
    and any repartitioning reproduce the identical sample.  Rate-based
    gating (:func:`stratified_hash_sample`) cannot hit an exact k;
    positional slicing (reference `pipe open --slice`) is
    execution-order-dependent.  This is the missing exact-k member of
    the family.

    Scale shape: ZERO shuffles — each block keeps its local k smallest
    (hash, id) per group (one lexsort per block), and the driver merges
    ≤ blocks × |groups| × k partial rows (groups are enum-bounded by
    contract; use a hash-bucketed exchange instead if they are not).

    Returns pandas (group_col, rnk, id_col, *extra_cols) sorted by
    (group_col, rnk), rnk 1..k in (hash, id) order.
    """
    def _keep_topk(codes_sorted: np.ndarray) -> np.ndarray:
        starts = np.flatnonzero(
            np.r_[True, codes_sorted[1:] != codes_sorted[:-1]])
        run_id = np.cumsum(
            np.r_[True, codes_sorted[1:] != codes_sorted[:-1]]) - 1
        pos = np.arange(len(codes_sorted)) - starts[run_id]
        return pos < k

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__h", pa.array([], pa.uint64()))
        ids = t[id_col]
        h = md5_u64(pc.cast(ids, pa.string()))
        grp = t[group_col].to_numpy(zero_copy_only=False)
        _, codes = np.unique(grp, return_inverse=True)
        idv = ids.to_numpy(zero_copy_only=False)
        order = np.lexsort((idv, h, codes))
        keep = order[_keep_topk(codes[order])]
        keep.sort()                       # preserve block row order
        return t.take(keep).append_column("__h", pa.array(h[keep]))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(parts):
        cols = [group_col, "rnk", id_col, *extra_cols]
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    h = parts["__h"].to_numpy()
    _, codes = np.unique(parts[group_col].to_numpy(), return_inverse=True)
    idv = parts[id_col].to_numpy()
    order = np.lexsort((idv, h, codes))
    keep = order[_keep_topk(codes[order])]
    out = parts.iloc[keep].copy()
    out["rnk"] = out.groupby(group_col, sort=False).cumcount() + 1
    out = out.sort_values([group_col, "rnk"])
    return out[[group_col, "rnk", id_col, *extra_cols]] \
        .reset_index(drop=True)


def balance_downsample(ds, *, group_col: str, id_col: str,
                       extra_cols: tuple = ()):
    """Class-balancing downsample: every group reduced to the size of
    the SMALLEST group — the standard rebalance before training on a
    skewed label column — with the same deterministic membership rule
    as :func:`group_topk_sample` (k smallest md5 per group), so the
    balanced subset is a pure function of the rows, and resume /
    repartition reproduce it exactly.

    Two passes: per-block group-count partials driver-combine to the
    min (groups are enum-bounded by the same contract as
    group_topk_sample), then the exact-k sample runs with that k.
    Returns pandas (group_col, rnk, id_col, *extra_cols) plus the
    computed k as ``.attrs['k']``.
    """
    import pyarrow as pa
    import ray

    from ..runtime import block_refs

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col]).to_pandas().groupby(
            group_col, as_index=False).size()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    tables = [t for t in ray.get(block_refs(
        ds.map_batches(cnt_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows]
    if not tables:
        out = group_topk_sample(ds, group_col=group_col, id_col=id_col,
                                k=0, extra_cols=extra_cols)
        out.attrs["k"] = 0
        return out
    counts = pa.concat_tables(tables).to_pandas() \
        .groupby(group_col)["size"].sum()
    k = int(counts.min())
    out = group_topk_sample(ds, group_col=group_col, id_col=id_col,
                            k=k, extra_cols=extra_cols)
    out.attrs["k"] = k
    return out


def priority_sample(ds, *, weight_col: str, id_col: str, k: int,
                    extra_cols: tuple = ()):
    """Weighted EXACT-k sampling without replacement (Ohlsson's
    sequential Poisson / priority sampling): each row gets priority
    ``u / w`` with ``u = md5_u64(str(id)) / 2^64`` — a deterministic
    stand-in for Uniform(0,1) — and the k SMALLEST priorities win, so
    higher weight means proportionally higher inclusion odds AND the
    sample size is exactly k (the two properties weighted_hash_sample's
    Poisson design and group_topk_sample's unweighted design each only
    half-provide).  No ln/exp anywhere (the A-ES formulation was
    rejected for measured 1-ulp libm drift): u is one u64→float64
    conversion and the priority one IEEE division, identical in numpy
    and DuckDB, so membership is bit-reproducible in SQL.

    Scale shape: ZERO shuffles — per-block local k smallest priorities
    (global top-k ⊆ union of local top-ks), driver merge ≤ blocks × k
    rows.  Non-positive weights are dropped (inclusion probability 0).

    Returns pandas (rnk, id_col, weight_col, priority, *extra_cols)
    sorted by rnk 1..k (priority asc, id asc ties).
    """
    import ray

    from ..runtime import block_refs

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        u = md5_u64(pc.cast(ids, pa.string())).astype(np.float64) \
            / 18446744073709551616.0
        pri = np.where(w > 0.0, u / w, np.inf)
        keep = np.flatnonzero(np.isfinite(pri))
        idv = ids.to_numpy(zero_copy_only=False)
        order = keep[np.lexsort((idv[keep], pri[keep]))][:k]
        out = t.take(pa.array(np.sort(order)))
        pri_kept = pri[np.sort(order)]
        return out.append_column("priority", pa.array(pri_kept))

    tabs = [t for t in ray.get(block_refs(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows]
    cols = ["rnk", id_col, weight_col, "priority", *extra_cols]
    if not tabs:
        return pd.DataFrame({c: pd.Series(dtype="object")
                             for c in cols})
    df = pa.concat_tables(tabs).to_pandas()
    df = df.sort_values(["priority", id_col]).head(k) \
        .reset_index(drop=True)
    df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[cols]
