"""Distributed EXACT order statistics without a global sort.

``binned_quantiles`` (stages/stats.py) answers "roughly where is p95"
with one pass and fixed bins; this module answers "exactly which value
sits at rank k" — the classic two-round distributed selection
(histogram refinement): the corpus is never sorted and never moved,
only histogram partials travel.

  Pass A (scan 1): per-block (count, min, max) partials -> driver.
  Pass B (scan 2): per-block equal-width histogram over [min, max]
      -> driver sum -> locate the bin holding each target rank by
      cumulative count.
  Pass C (scan 3): per-block (value, count) partials restricted to
      the few target bins -> driver combine -> index into the
      cumulative counts of the sorted in-bin values.

Every pass ships O(bins) or O(distinct-values-in-target-bins) rows per
block, never corpus rows.  With B bins, pass C sees ~n/B of the mass
per target (heavy duplicate values collapse to one (value, count) row,
so a spike bin costs its distinct-value count, not its row count); a
third refinement round would bound it further but has never been
needed for currency/count domains.

Reference analog: the reference computes order statistics only by full
sort (`media-attrs-filter.py` date sort, `dedup/sha256.py:127`) — this
is the scale-path replacement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def exact_percentiles(ds, *, value_col: str, pcts: tuple,
                      bins: int = 4096) -> pd.DataFrame:
    """Exact value at rank ``floor(p*(n-1)) + 1`` (1-based, ascending —
    the row_number rule, identical to the SQL oracle) for each p in
    ``pcts``, over an INTEGER column.  See module doc for the
    three-pass plan.

    Returns pandas (pct, val, rank) sorted by pct.
    """
    from ..runtime import arrow_group, block_refs

    def minmax_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([int(v.min())], pa.int64()),
                         "hi": pa.array([int(v.max())], pa.int64())})

    mm = pa.concat_tables([t for t in ray.get(block_refs(
        ds.map_batches(minmax_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows])
    if mm.num_rows == 0:
        return pd.DataFrame({"pct": pd.Series(dtype=np.float64),
                             "val": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.int64)})
    n = int(pa.compute.sum(mm["n"]).as_py())
    lo = int(pa.compute.min(mm["lo"]).as_py())
    hi = int(pa.compute.max(mm["hi"]).as_py())
    span = hi - lo + 1
    nb = min(int(bins), span)

    # ranks: k = floor(p * (n-1)) + 1 — float multiply mirrored in SQL
    ks = {float(p): int(np.floor(float(p) * (n - 1))) + 1 for p in pcts}

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(v):
            return pa.table({"bin": pa.array([], pa.int32()),
                             "cnt": pa.array([], pa.int64())})
        b = ((v - lo) * nb // span).astype(np.int64)
        cnt = np.bincount(b, minlength=nb)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz.astype(np.int32)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    hp = pa.concat_tables([t for t in ray.get(block_refs(
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows])
    hist = np.zeros(nb, np.int64)
    np.add.at(hist, hp["bin"].to_numpy(zero_copy_only=False),
              hp["cnt"].to_numpy(zero_copy_only=False))
    cum = np.cumsum(hist)

    # target bin per rank: first bin whose cumulative count reaches k
    target_bins = {}
    for p, k in ks.items():
        b = int(np.searchsorted(cum, k, side="left"))
        target_bins.setdefault(b, []).append((p, k))
    bins_arr = np.array(sorted(target_bins), dtype=np.int64)
    below = {int(b): (int(cum[b - 1]) if b > 0 else 0)
             for b in bins_arr}

    def inbin_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(v):
            return pa.table({"val": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        b = (v - lo) * nb // span
        sel = v[np.isin(b, bins_arr)]
        if not len(sel):
            return pa.table({"val": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        uv, uc = np.unique(sel, return_counts=True)
        return pa.table({"val": pa.array(uv),
                         "cnt": pa.array(uc.astype(np.int64))})

    ib = pa.concat_tables([t for t in ray.get(block_refs(
        ds.map_batches(inbin_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows])
    vals = pd.DataFrame({"val": ib["val"].to_numpy(zero_copy_only=False),
                         "cnt": ib["cnt"].to_numpy(zero_copy_only=False)}) \
        .groupby("val", as_index=False)["cnt"].sum() \
        .sort_values("val").reset_index(drop=True)
    v_arr = vals["val"].to_numpy(np.int64)
    v_bin = (v_arr - lo) * nb // span
    c_arr = vals["cnt"].to_numpy(np.int64)

    rows = []
    for b, targets in target_bins.items():
        m = v_bin == b
        vv, cc = v_arr[m], np.cumsum(c_arr[m])
        for p, k in targets:
            idx = int(np.searchsorted(cc, k - below[b], side="left"))
            rows.append((p, int(vv[idx]), k))
    out = pd.DataFrame(rows, columns=["pct", "val", "rank"])
    return out.sort_values("pct").reset_index(drop=True)


def grouped_exact_quantile(ds, *, group_col: str, value_col: str,
                           p: float, bins: int = 1024,
                           out_col: str = "qval"):
    """Exact per-GROUP order statistic (rank ``floor(p*(n_g-1)) + 1``
    within each group) by the same histogram-refinement selection as
    :func:`exact_percentiles`, run for every group at once — the
    unbounded-domain complement of ``grouped_weighted_median`` (whose
    histogram combiner requires a bounded value domain).

    Three scans, all emitting per-group partials: (1) per-block
    (group, n, lo, hi) -> driver combine (groups are enum-bounded by
    the `_driver_combine` contract); (2) per-block (group, bin, cnt)
    over each group's own equal-width grid -> driver sum locates each
    group's target bin; (3) per-block (group, value, cnt) restricted
    to that one bin per group -> driver selection.  No sort, no
    row-level shuffle; a duplicate-heavy bin costs its distinct-value
    count.

    Returns pandas (group_col, n, rank, out_col) sorted by group.
    """
    import ray

    from ..runtime import block_refs

    def mm_partial(t: pa.Table) -> pa.Table:
        df = t.select([group_col, value_col]).to_pandas()
        agg = df.groupby(group_col)[value_col].agg(
            ["size", "min", "max"]).reset_index()
        agg.columns = [group_col, "n", "lo", "hi"]
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    mm_tabs = [t for t in ray.get(block_refs(
        ds.map_batches(mm_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows]
    empty = pd.DataFrame({group_col: pd.Series(dtype="object"),
                          "n": pd.Series(dtype=np.int64),
                          "rank": pd.Series(dtype=np.int64),
                          out_col: pd.Series(dtype=np.int64)})
    if not mm_tabs:
        return empty
    mm = pa.concat_tables(mm_tabs).to_pandas().groupby(group_col).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    groups = np.array(sorted(mm.index), dtype=object)
    n_g = mm.loc[groups, "n"].to_numpy(np.int64)
    lo_g = mm.loc[groups, "lo"].to_numpy(np.int64)
    hi_g = mm.loc[groups, "hi"].to_numpy(np.int64)
    span_g = hi_g - lo_g + 1
    nb_g = np.minimum(int(bins), span_g)
    k_g = np.floor(float(p) * (n_g - 1)).astype(np.int64) + 1
    gmap = {g: i for i, g in enumerate(groups)}
    meta_ref = ray.put((gmap, lo_g, span_g, nb_g))

    def hist_partial(t: pa.Table) -> pa.Table:
        gm, lo, span, nb = ray.get(meta_ref)
        df = t.select([group_col, value_col]).to_pandas()
        gi = df[group_col].map(gm).to_numpy(np.int64)
        v = df[value_col].to_numpy(np.int64)
        b = (v - lo[gi]) * nb[gi] // span[gi]
        agg = pd.DataFrame({"gi": gi, "bin": b}).groupby(
            ["gi", "bin"], as_index=False).size()
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    hp = pa.concat_tables([t for t in ray.get(block_refs(
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows]) \
        .to_pandas().groupby(["gi", "bin"])["size"].sum()
    target_bin = np.empty(len(groups), np.int64)
    below_g = np.empty(len(groups), np.int64)
    for i in range(len(groups)):
        h = hp.loc[i].sort_index()
        cum = h.cumsum()
        j = int(np.searchsorted(cum.to_numpy(), k_g[i], side="left"))
        target_bin[i] = h.index[j]
        below_g[i] = int(cum.iloc[j - 1]) if j > 0 else 0
    tb_ref = ray.put(target_bin)

    def inbin_partial(t: pa.Table) -> pa.Table:
        gm, lo, span, nb = ray.get(meta_ref)
        tb = ray.get(tb_ref)
        df = t.select([group_col, value_col]).to_pandas()
        gi = df[group_col].map(gm).to_numpy(np.int64)
        v = df[value_col].to_numpy(np.int64)
        b = (v - lo[gi]) * nb[gi] // span[gi]
        keep = b == tb[gi]
        agg = pd.DataFrame({"gi": gi[keep], "v": v[keep]}).groupby(
            ["gi", "v"], as_index=False).size()
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    ib = pa.concat_tables([t for t in ray.get(block_refs(
        ds.map_batches(inbin_partial, batch_format="pyarrow",
                       zero_copy_batch=True))) if t.num_rows]) \
        .to_pandas().groupby(["gi", "v"])["size"].sum()
    vals = np.empty(len(groups), np.int64)
    for i in range(len(groups)):
        h = ib.loc[i].sort_index()
        cum = np.cumsum(h.to_numpy())
        idx = int(np.searchsorted(cum, k_g[i] - below_g[i],
                                  side="left"))
        vals[i] = h.index[idx]
    return pd.DataFrame({group_col: groups, "n": n_g, "rank": k_g,
                         out_col: vals}) \
        .sort_values(group_col).reset_index(drop=True)
