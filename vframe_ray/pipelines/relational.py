"""Relational operator showcase over the TPC-H-ish test tables.

Maps the reference's generic dataflow operators (SURVEY.md §2.2/2.4/2.5/2.6:
filters, predicates, joins-by-lookup, grouped aggregation, sort/limit,
distinct, union) onto Dataset primitives, with the scale idioms the
reference lacks: pruned reads, vectorized batch predicates, broadcast
small-side joins (``ray.put`` once — reference analog: priors join,
media.py:79-111), partial aggregation before the shuffle.

Every function takes ``sf_dir`` and returns a Dataset/DataFrame whose
column names match the paired SQL oracle in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..sources.readers import read_parquet as _read_parquet


def _read(sf_dir: str, table: str, columns=None, filter=None):
    # block count is data-sized by the reader wrapper
    # (sources.readers._sized_num_blocks)
    return _read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=columns, filter=filter)


# Above this many rows a dimension table stops being "small-side": the
# driver-side pq.read_table + ray.put broadcast (fine for nation/region/
# supplier, and for customer at test scale) flips to a distributed
# shuffle hash_join on the dimension key, so no stage ever materializes
# a corpus-growing table in one process (round-4 VERDICT "What's wrong
# #3").  50M rows of (int64, int64) ≈ 800 MB — comfortably inside the
# object store; beyond it the broadcast would break the driver first.
# Env override exists so tests can force the join path (threshold=0).
DIM_BROADCAST_MAX_ROWS = 50_000_000


def _dim_broadcast_ok(sf_dir: str, table: str) -> bool:
    """True when ``table`` is small enough to broadcast driver-side.

    Row count comes from parquet footer metadata only — no data read."""
    import pyarrow.parquet as pq
    limit = int(os.environ.get("VFRAME_RAY_DIM_BROADCAST_MAX_ROWS",
                               str(DIM_BROADCAST_MAX_ROWS)))
    n = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")) \
        .metadata.num_rows
    return n <= limit


def _driver_combine(parts, keys: list[str],
                    aggs: list[tuple[str, str, str]]) -> pa.Table:
    """Final combine of a tiny partial-aggregate Dataset on the driver.

    ``parts`` holds ≤ |groups| rows per input block (its row count
    scales with block count × group cardinality, never with data size),
    so the final reduction is small by construction: pulling the partial
    blocks to the driver and combining with one Arrow ``group_by``
    replaces a full sort-shuffle groupby stage — seconds of exchange
    orchestration spent on a few hundred rows.  The same bound holds on
    a cluster (1M blocks × 6 groups ≈ 6M tiny rows).  This does NOT
    apply to high-cardinality keys (exact dedup, per-term stats) — those
    keep the distributed groupby.  ``aggs``: (partial_col, fn, out_col).
    """
    from ..runtime import block_refs as _block_refs
    tables = ray.get(_block_refs(parts))
    tables = [t for t in tables if t.num_rows] or tables[:1]
    t = pa.concat_tables(tables)
    g = t.group_by(keys).aggregate([(c, fn) for c, fn, _ in aggs])
    return g.rename_columns(list(keys) + [o for _, _, o in aggs])


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate over lineitem (reference analog:
    summarize-json's per-label detection counts, summarize-json.py:29-105).
    Derived column vectorized in Arrow; groupby keys are low-cardinality
    so the shuffle moves partial aggregates only."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"],
               filter=(pc.field("l_shipdate") < pc.scalar(
                   pd.Timestamp("1998-09-01"))))

    def partial(t: pa.Table) -> pa.Table:
        # batch-level combiner: collapse each block to ≤ |groups| rows so
        # the exchange moves partial aggregates, not 600k rows (the
        # guide's "pre-aggregate before the shuffle"; Ray's groupby alone
        # would sort the full dataset by key first).  Arrow-native
        # TableGroupBy — no pandas round-trip in the hot path.
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("disc_price", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "sum_qty_p", "sum_base_price_p",
                                 "sum_disc_price_p", "count_order_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, ["l_returnflag", "l_linestatus"],
                          [("sum_qty_p", "sum", "sum_qty"),
                           ("sum_base_price_p", "sum", "sum_base_price"),
                           ("sum_disc_price_p", "sum", "sum_disc_price"),
                           ("count_order_p", "sum", "count_order")])
    df = out.to_pandas()
    df["avg_qty"] = df["sum_qty"] / df["count_order"]
    df = df.sort_values(["l_returnflag", "l_linestatus"])
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        df[c] = df[c].round(4)
    return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "avg_qty", "count_order"]].reset_index(
        drop=True)


def rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) revenue summary.

    Only the FINEST level touches data: per-block Arrow partials →
    driver combine (≤ |groups| rows per block, the q1 shape).  The
    coarser rollup levels are re-aggregated from that tiny finest-level
    table on the driver — at any corpus size the rollup itself costs
    O(|finest groups|), never a second pass.  NULL marks a rolled-up
    key (SQL ROLLUP semantics); rounding happens after the level sums
    so each level matches the oracle's direct aggregation.

    Reference analog: summarize-json's per-label counts plus its global
    histogram rows in one output (summarize-json.py:29-105)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("rev", rev)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("rev", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "rev_p", "n_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    fine = _driver_combine(parts, ["l_returnflag", "l_linestatus"],
                           [("rev_p", "sum", "sum_rev"),
                            ("n_p", "sum", "n_rows")]).to_pandas()
    lvl1 = fine.groupby("l_returnflag", as_index=False)[
        ["sum_rev", "n_rows"]].sum()
    lvl1["l_linestatus"] = None
    lvl0 = pd.DataFrame({"l_returnflag": [None], "l_linestatus": [None],
                         "sum_rev": [fine["sum_rev"].sum()],
                         "n_rows": [fine["n_rows"].sum()]})
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out["sum_rev"] = out["sum_rev"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    )[["l_returnflag", "l_linestatus", "sum_rev", "n_rows"]].reset_index(
        drop=True)


def cube_revenue(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping
    sets, derived from the SAME tiny finest-level table as
    :func:`rollup_revenue` (one data pass; the extra CUBE level is one
    more driver re-aggregation over O(groups) rows)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("rev", rev)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("rev", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "rev_p", "n_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    fine = _driver_combine(parts, ["l_returnflag", "l_linestatus"],
                           [("rev_p", "sum", "sum_rev"),
                            ("n_p", "sum", "n_rows")]).to_pandas()
    by_a = fine.groupby("l_returnflag", as_index=False)[
        ["sum_rev", "n_rows"]].sum()
    by_a["l_linestatus"] = None
    by_b = fine.groupby("l_linestatus", as_index=False)[
        ["sum_rev", "n_rows"]].sum()
    by_b["l_returnflag"] = None
    total = pd.DataFrame({"l_returnflag": [None], "l_linestatus": [None],
                          "sum_rev": [fine["sum_rev"].sum()],
                          "n_rows": [fine["n_rows"].sum()]})
    out = pd.concat([fine, by_a, by_b, total], ignore_index=True)
    out["sum_rev"] = out["sum_rev"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    )[["l_returnflag", "l_linestatus", "sum_rev", "n_rows"]].reset_index(
        drop=True)


def revenue_by_nation(sf_dir: str):
    """3-table star join with BOTH small sides broadcast: customer and
    nation are read once on the driver, shipped via ``ray.put``, and each
    orders batch does two vectorized map lookups — no shuffle join
    (reference analog: filename→filepath dict lookup,
    media-attrs-filter.py:114-121).  Above ``DIM_BROADCAST_MAX_ROWS``
    the customer side flips to a distributed hash_join on custkey with
    the per-nation partial aggregate fused into the join bucket (nation
    names, genuinely tiny, still attach on the driver)."""
    # broadcast COLUMNAR lookups, not Python dicts: at sf≥10 a dict of
    # the whole customer table is GBs of PyObjects; two Arrow arrays +
    # pc.index_in gather are zero-copy in the object store (round-1
    # VERDICT 'What's wrong' #7)
    import pyarrow.parquet as pq
    nat_t = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_name"])
    if not _dim_broadcast_ok(sf_dir, "customer"):
        return _revenue_by_nation_joined(sf_dir, nat_t)
    cust_t = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
    # customer key -> nation name resolved ONCE on the small side, so the
    # per-batch stage does a single index_in + take
    nk_idx = pc.index_in(cust_t["c_nationkey"],
                         value_set=nat_t["n_nationkey"].combine_chunks())
    cust_name = nat_t["n_name"].combine_chunks().take(nk_idx.combine_chunks())
    lookup_ref = ray.put((cust_t["c_custkey"].combine_chunks(), cust_name))

    def join_partial(batch: pa.Table) -> pa.Table:
        # ray.get of a plasma object inside a task is zero-copy shared
        # memory, so a plain task stage beats an actor pool here: no
        # per-call actor spin-up (each bench invocation paid ~1 s of
        # actor startup for ~100 ms of work), and the broadcast side is
        # still shipped once per node, not per batch
        keys, names = ray.get(lookup_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=keys)
        names = names.take(idx if not isinstance(
            idx, pa.ChunkedArray) else idx.combine_chunks())
        t = batch.append_column("n_name", names)
        g = t.group_by("n_name").aggregate([
            ("o_totalprice", "sum"), ([], "count_all")])
        return g.rename_columns(["n_name", "revenue_partial",
                                 "n_orders_partial"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    partials = orders.map_batches(join_partial, batch_format="pyarrow",
                                  batch_size=None)
    out = _driver_combine(partials, ["n_name"],
                          [("revenue_partial", "sum", "revenue"),
                           ("n_orders_partial", "sum", "n_orders")])
    df = out.to_pandas().sort_values("n_name").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(2)
    return df


def _revenue_by_nation_joined(sf_dir: str, nat_t: pa.Table):
    """Big-big path of :func:`revenue_by_nation`: ONE shuffle hash_join
    of orders against customer on custkey, per-nationkey partial sums
    fused into the join bucket (≤ |nations| rows leave each bucket),
    nation names attached on the driver."""
    from ..stages.joins import hash_join

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])
    cust_ds = _read(sf_dir, "customer",
                    columns=["c_custkey", "c_nationkey"]) \
        .rename_columns({"c_custkey": "o_custkey"})

    def per_nation(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"nk": pd.Series(dtype="int64"),
             "revenue_partial": pd.Series(dtype="float64"),
             "n_orders_partial": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        g = pd.DataFrame({"nk": j["c_nationkey"].to_numpy(np.int64),
                          "rev": j["o_totalprice"].to_numpy()})
        r = g.groupby("nk", sort=False).agg(
            revenue_partial=("rev", "sum"),
            n_orders_partial=("rev", "size")).reset_index()
        r["n_orders_partial"] = r["n_orders_partial"].astype("int64")
        return r

    parts = hash_join(orders, cust_ds, key="o_custkey",
                      left_cols=["o_totalprice"],
                      right_cols=["c_nationkey"], post=per_nation,
                      left_schema=pa.schema(
                          [("o_custkey", pa.int64()),
                           ("o_totalprice", pa.float64())]),
                      right_schema=pa.schema(
                          [("o_custkey", pa.int64()),
                           ("c_nationkey", pa.int64())]))
    out = _driver_combine(parts, ["nk"],
                          [("revenue_partial", "sum", "revenue"),
                           ("n_orders_partial", "sum", "n_orders")])
    df = out.to_pandas()
    n_keys = nat_t["n_nationkey"].to_numpy()
    names = np.empty(int(n_keys.max()) + 1, dtype=object)
    names[n_keys] = nat_t["n_name"].to_numpy(zero_copy_only=False)
    df["n_name"] = names[df["nk"].to_numpy(np.int64)]
    df = df[["n_name", "revenue", "n_orders"]] \
        .sort_values("n_name").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(2)
    return df


def top_orders(sf_dir: str, k: int = 50):
    """Global top-k (reference analog: cache sort before keep-first,
    dedup/sha256.py:127-131).  Per-block top-k partials + one driver
    merge of ≤ blocks×k rows — no all-to-all sort shuffle: each block's
    local (price desc, key asc) head already contains every global
    top-k member that block can contribute."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("o_totalprice", "descending"),
                                            ("o_orderkey", "ascending")])
        return t.take(idx[:k])

    parts = ds.map_batches(block_topk, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    from ..runtime import block_refs as _block_refs
    merged = pa.concat_tables(
        [t for t in ray.get(_block_refs(parts)) if t.num_rows])
    idx = pc.sort_indices(merged,
                          sort_keys=[("o_totalprice", "descending"),
                                     ("o_orderkey", "ascending")])
    return merged.take(idx[:k]).to_pandas()


def filter_project_events(sf_dir: str):
    """Pushdown filter + projection (reference analog: skip-file attribute
    predicates registered as reader pre-filters, skip-file.py:30-75)."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"],
               filter=((pc.field("event_type") == pc.scalar("purchase"))
                       & (pc.field("value") > pc.scalar(50.0))))
    df = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    return df[["event_id", "user_id", "value"]]


def distinct_event_types(sf_dir: str):
    """Distinct + count (reference analog: drop duplicate filenames,
    media-attrs-filter.py:63). Pre-aggregated: one partial row per type
    per batch crosses the shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n_partial"])

    out = _driver_combine(ds.map_batches(partial, batch_format="pyarrow",
                                         batch_size=None),
                          ["event_type"],
                          [("n_partial", "sum", "n_events")])
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


def union_high_value(sf_dir: str):
    """Union of two filtered branches (reference analog: merge-json list
    concat, merge-json.py:41-46), then distinct count."""
    a = _read(sf_dir, "events", columns=["event_id", "value"],
              filter=(pc.field("value") > pc.scalar(99.0)))
    b = _read(sf_dir, "events", columns=["event_id", "value"],
              filter=(pc.field("value") < pc.scalar(1.0)))
    u = a.union(b)
    return u.to_pandas().sort_values("event_id").reset_index(drop=True)


def semi_join_orders(sf_dir: str):
    """Broadcast semi-join: orders whose customer is in the BUILDING
    segment (reference analog: cache anti/semi-join via isin,
    dedup/sha256.py:82-88).  Key set broadcast, `is_in` filter per batch."""
    keys = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
                 filter=(pc.field("c_mktsegment") == pc.scalar("BUILDING"))
                 ).to_pandas()["c_custkey"].to_numpy()
    key_ref = ray.put(keys)

    def semi_filter(t: pa.Table) -> pa.Table:
        # zero-copy plasma read per task; no actor spin-up (see
        # join_partial above)
        mask = pc.is_in(t["o_custkey"], value_set=pa.array(ray.get(key_ref)))
        return t.filter(mask)

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = ds.map_batches(semi_filter, batch_format="pyarrow",
                         batch_size=None)
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


ANTI_JOIN_THRESHOLD = 400_000.0


def anti_join_customers(sf_dir: str):
    """Broadcast ANTI-join: customers with NO high-value order
    (NOT EXISTS over o_totalprice > threshold) — the inverse of
    semi_join_orders and the explicit form of the reference's cache
    reconciliation (new files = inputs minus cached,
    dedup/sha256.py:82-88).  The distinct qualifying-custkey set is
    small relative to orders (pre-distincted per block, pushdown filter
    at the read), broadcast once, NOT-is_in filter per customer batch."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"],
                   filter=(pc.field("o_totalprice")
                           > pc.scalar(ANTI_JOIN_THRESHOLD)))
    parts = orders.map_batches(
        lambda t: pa.table({"k": pc.unique(t["o_custkey"])}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    from ..runtime import block_refs as _block_refs
    keys = np.unique(np.concatenate(
        [t["k"].to_numpy(zero_copy_only=False)
         for t in ray.get(_block_refs(parts)) if t.num_rows]))
    key_ref = ray.put(keys)

    def anti_filter(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["c_custkey"],
                        value_set=pa.array(ray.get(key_ref)))
        return t.filter(pc.invert(mask))

    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_acctbal"])
    out = ds.map_batches(anti_filter, batch_format="pyarrow",
                         batch_size=None)
    df = out.to_pandas()
    if df.empty:                      # schema-stable empty result
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                           "c_name": pd.Series([], dtype="object"),
                           "c_acctbal": pd.Series([], dtype="float64")})
    return df.sort_values("c_custkey").reset_index(drop=True)


RANGE_JOIN_DAY_US = 86_400_000_000
RANGE_JOIN_EPOCH_US = pd.Timestamp("2024-01-01").value // 1000


def events_in_order_windows(sf_dir: str):
    """Banded RANGE join (equi-key + interval containment): each order
    defines a deterministic 2-day window inside the events range
    (lo = 2024-01-01 + (o_orderkey % 25) days, key = o_custkey % 150);
    events falling in a window count toward that order.  Aggregation is
    FUSED into the join buckets (a key's events and all its window
    replicas co-locate, so per-order counts are exact in-bucket — no
    second shuffle).  Returns (o_orderkey, n_events, sum_value_r)."""
    from ..stages.joins import range_join

    levents = _read(sf_dir, "events",
                    columns=["user_id", "ts", "value"]).map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "ts_us": pc.cast(t["ts"], pa.int64()),
                            "value": t["value"]}),
        batch_format="pyarrow", zero_copy_batch=True)

    def prep_right(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) % 150
        lo = RANGE_JOIN_EPOCH_US + (ok % 25) * RANGE_JOIN_DAY_US
        return pa.table({"user_id": pa.array(k), "lo": pa.array(lo),
                         "hi": pa.array(lo + 2 * RANGE_JOIN_DAY_US),
                         "o_orderkey": pa.array(ok)})

    rwin = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey"]).map_batches(
        prep_right, batch_format="pyarrow", zero_copy_batch=True)

    def agg(j: pd.DataFrame) -> pd.DataFrame:
        if j.empty:
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "sum_value": pd.Series([], dtype="float64")})
        g = j.groupby("r_o_orderkey", as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        g["r_o_orderkey"] = g["r_o_orderkey"].astype("int64")
        return g.rename(columns={"r_o_orderkey": "o_orderkey"})

    out = range_join(levents, rwin, key="user_id", left_on="ts_us",
                     right_lo="lo", right_hi="hi",
                     band=2 * RANGE_JOIN_DAY_US,
                     left_cols=["value"], right_cols=["o_orderkey"],
                     post=agg)
    df = out.to_pandas()
    df["sum_value_r"] = df["sum_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df.sort_values("o_orderkey")[
        ["o_orderkey", "n_events", "sum_value_r"]].reset_index(drop=True)


def order_priority_histogram(sf_dir: str):
    """Date-range filter + count by category, two-phase (reference
    analog: media-attrs-summarize bucketed counts)."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate"],
               filter=((pc.field("o_orderdate")
                        >= pc.scalar(pd.Timestamp("1995-01-01")))
                       & (pc.field("o_orderdate")
                          < pc.scalar(pd.Timestamp("1996-01-01")))))
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "n_partial"])

    out = _driver_combine(ds.map_batches(partial, batch_format="pyarrow",
                                         batch_size=None),
                          ["o_orderpriority"],
                          [("n_partial", "sum", "n_orders")])
    return out.to_pandas().sort_values("o_orderpriority").reset_index(
        drop=True)


def grouped_topk(ds, *, key: str, order_col: str, k: int, tie_col: str):
    """Per-group top-k (window `row_number() <= k` analog; reference:
    per-frame `max_det` cap, base.py:134-146 — here per ARBITRARY key).

    Two-phase: a vectorized per-block partial (each block contributes at
    most k rows per key it contains — the only rows that can survive the
    global cut) then one keyed shuffle whose input is already pruned to
    ≤ blocks×keys×k rows.  The reduce side is co-partitioned into HASH
    BUCKETS of keys, one vectorized sort+head kernel per bucket — a
    per-KEY map_groups pays ~1 ms of UDF dispatch per group, minutes of
    pure overhead at 150k keys.  Group memory is O(bucket's pruned
    rows), never corpus-sized."""
    from ..stages.joins import _bucket_of, _num_buckets
    nb = _num_buckets(None)

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col, tie_col],
                            ascending=[True, False, True])
        df = df.groupby(key, sort=False).head(k).copy()
        df["__bucket"] = _bucket_of(
            df[key].to_numpy(dtype=np.int64), nb)
        return df

    parts = ds.map_batches(block_partial, batch_format="pandas",
                           batch_size=None)

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key, order_col, tie_col],
                          ascending=[True, False, True])
        top = g.groupby(key, sort=False).head(k).copy()
        top["rnk"] = (top.groupby(key, sort=False).cumcount()
                      .to_numpy(dtype=np.int32) + 1)
        from ..runtime import arrow_group
        return arrow_group(top.drop(columns="__bucket")
                           .reset_index(drop=True))

    return parts.groupby("__bucket").map_groups(final,
                                                batch_format="pandas")


def top_orders_per_customer(sf_dir: str, k: int = 2):
    """Top-k orders per customer by price — the grouped_topk showcase."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(ds, key="o_custkey", order_col="o_totalprice",
                       k=k, tie_col="o_orderkey")
    df = out.to_pandas()[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]
    return df.sort_values(["o_custkey", "rnk"]).reset_index(drop=True)


def purchase_prior_view(sf_dir: str):
    """As-of join showcase: every purchase event matched to the latest
    view event of the same user at or before the purchase timestamp
    (-1 where none); one co-partitioning shuffle (stages/joins.py)."""
    from ..stages.joins import asof_join
    left = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
                 filter=(pc.field("event_type") == pc.scalar("purchase")))
    right = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
                  filter=(pc.field("event_type") == pc.scalar("view")))
    out = asof_join(left, right, key="user_id", left_on="ts", right_on="ts",
                    left_cols=["event_id", "user_id"],
                    right_cols=["event_id"], tie_col="event_id",
                    prefix="prior_view_")
    df = out.to_pandas().rename(columns={"prior_view_event_id":
                                         "prior_view_id"})
    df = df[["event_id", "user_id", "prior_view_id"]]
    return df.sort_values("event_id").reset_index(drop=True)


def order_revenue_shuffle_join(sf_dir: str):
    """Large-large shuffle hash join with fused per-key aggregate
    (stages/joins.hash_join): lineitem x 1995-orders on orderkey,
    revenue per order computed inside the join group — the second
    groupby shuffle a join-then-aggregate plan would need is fused away
    (the join key IS the aggregate key)."""
    from ..stages.joins import hash_join
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_extendedprice",
                                    "l_discount"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate")
                            >= pc.scalar(pd.Timestamp("1995-01-01")))
                           & (pc.field("o_orderdate")
                              < pc.scalar(pd.Timestamp("1996-01-01")))))

    def revenue(j: pd.DataFrame) -> pd.DataFrame:
        # one hash BUCKET of keys; rows of a key never split buckets, so
        # the per-key sum here is exact.  Sort first: float summation
        # order must not depend on shuffle arrival order.
        if not len(j):
            return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                 "revenue": pd.Series(dtype="float64")})
        j = j.sort_values(["o_orderkey", "l_extendedprice", "l_discount"])
        part = pd.DataFrame({
            "o_orderkey": j["o_orderkey"].to_numpy(dtype=np.int64),
            "rev": (j["l_extendedprice"].to_numpy()
                    * (1.0 - j["l_discount"].to_numpy()))})
        s = part.groupby("o_orderkey", sort=True)["rev"].sum().round(6)
        return pd.DataFrame({"o_orderkey": s.index.to_numpy(),
                             "revenue": s.to_numpy()})

    out = hash_join(li, orders, key="o_orderkey",
                    left_cols=["o_orderkey", "l_extendedprice", "l_discount"],
                    right_cols=["o_orderdate"], post=revenue)
    df = out.to_pandas()[["o_orderkey", "revenue"]]
    return df.sort_values("o_orderkey").reset_index(drop=True)


Q3_CUTOFF = pd.Timestamp("1998-07-01")
Q3_SEGMENT = "BUILDING"
Q3_K = 10


def q3_shipping_priority(sf_dir: str, k: int = Q3_K):
    """TPC-H Q3 shape (customer ⋈ orders ⋈ lineitem, in-flight orders at
    a cutoff date): when customer fits the object store, the
    BUILDING-segment customer keys are the small side (broadcast once
    via ray.put, per-batch is_in filter — no shuffle for the first
    join); above ``DIM_BROADCAST_MAX_ROWS`` the segment filter becomes
    a distributed semi hash_join on custkey, so no process ever holds
    the whole customer table.  The lineitem ⋈ orders leg is the
    large-large shuffle hash join with the revenue aggregate fused into
    the join bucket (stages/joins.hash_join post=, one exchange);
    the driver merges only per-bucket candidate rows for the top-k.

    Returns pandas (o_orderkey, revenue, o_orderdate, o_orderpriority)
    top-k by (revenue desc, o_orderdate, o_orderkey).
    """
    import pyarrow.parquet as pq

    from ..stages.joins import hash_join

    if _dim_broadcast_ok(sf_dir, "customer"):
        cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                             columns=["c_custkey", "c_mktsegment"])
        keys = cust.filter(pc.equal(cust["c_mktsegment"], Q3_SEGMENT))
        keys_ref = ray.put(keys["c_custkey"].combine_chunks())

        def cust_filter(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            return batch.filter(
                pc.is_in(batch["o_custkey"], value_set=ks)) \
                .drop_columns(["o_custkey"])

        orders = _read(sf_dir, "orders",
                       columns=["o_orderkey", "o_custkey", "o_orderdate",
                                "o_orderpriority"],
                       filter=(pc.field("o_orderdate")
                               < pc.scalar(Q3_CUTOFF))) \
            .map_batches(cust_filter, batch_format="pyarrow")
    else:
        # big-big path: semi-join orders against the segment-filtered
        # customer keys with ONE extra keyed shuffle (customer keys are
        # unique, so the inner merge is exactly the is_in filter)
        seg_cust = _read(sf_dir, "customer",
                         columns=["c_custkey", "c_mktsegment"],
                         filter=pc.equal(pc.field("c_mktsegment"),
                                         Q3_SEGMENT)) \
            .rename_columns({"c_custkey": "o_custkey"})
        orders_base = _read(sf_dir, "orders",
                            columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_orderpriority"],
                            filter=(pc.field("o_orderdate")
                                    < pc.scalar(Q3_CUTOFF)))
        orders = hash_join(
            orders_base, seg_cust, key="o_custkey",
            left_cols=["o_orderkey", "o_orderdate", "o_orderpriority"],
            right_cols=[],
            left_schema=pa.schema(
                [("o_orderkey", pa.int64()),
                 ("o_custkey", pa.int64()),
                 ("o_orderdate", pa.timestamp("us")),
                 ("o_orderpriority", pa.string())]),
            right_schema=pa.schema(
                [("o_custkey", pa.int64()),
                 ("c_mktsegment", pa.string())]))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               filter=pc.field("l_shipdate") > pc.scalar(Q3_CUTOFF)) \
        .map_batches(lambda t: t.rename_columns(
            ["o_orderkey", "l_extendedprice", "l_discount"]),
            batch_format="pyarrow", zero_copy_batch=True)

    def revenue(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "revenue": pd.Series(dtype="float64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "o_orderpriority": pd.Series(dtype="object")})
        if not len(j):
            return empty
        j = j.sort_values(["o_orderkey", "l_extendedprice", "l_discount"])
        rev = (j["l_extendedprice"].to_numpy()
               * (1.0 - j["l_discount"].to_numpy()))
        g = pd.DataFrame({"o_orderkey": j["o_orderkey"].to_numpy(np.int64),
                          "rev": rev,
                          "o_orderdate": j["o_orderdate"].to_numpy(),
                          "o_orderpriority": j["o_orderpriority"]
                          .to_numpy()})
        s = g.groupby("o_orderkey", sort=True).agg(
            revenue=("rev", "sum"), o_orderdate=("o_orderdate", "first"),
            o_orderpriority=("o_orderpriority", "first")).reset_index()
        s["revenue"] = s["revenue"].round(2)
        # per-bucket local top-k: only candidate rows leave the reducer
        return s.sort_values(["revenue", "o_orderdate", "o_orderkey"],
                             ascending=[False, True, True]).head(k)

    out = hash_join(li, orders,
                    key="o_orderkey",
                    left_cols=["o_orderkey", "l_extendedprice",
                               "l_discount"],
                    right_cols=["o_orderdate", "o_orderpriority"],
                    post=revenue,
                    # explicit: in the big-big path ``orders`` is a
                    # map_groups output whose schema() probe would
                    # force execution
                    right_schema=pa.schema(
                        [("o_orderkey", pa.int64()),
                         ("o_orderdate", pa.timestamp("us")),
                         ("o_orderpriority", pa.string())]))
    df = out.to_pandas()
    df = df.sort_values(["revenue", "o_orderdate", "o_orderkey"],
                        ascending=[False, True, True]).head(k)
    return df[["o_orderkey", "revenue", "o_orderdate",
               "o_orderpriority"]].reset_index(drop=True)


def _group_starts(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, counts) of the equal-key runs in a SORTED key array —
    the segmentation every bucketed window kernel shares."""
    n = len(keys)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) if n \
        else np.empty(0, dtype=np.int64)
    return starts, np.diff(np.append(starts, n))


def _orders_cents_bucketed(sf_dir: str, nb: int):
    """orders pruned to the window columns, totalprice in integer
    cents, plus the hash(custkey) bucket column — the shared input
    stage of the per-customer window operators."""
    from ..runtime import int_bucket_of

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_orderdate",
                            "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return pa.table({"__bucket": int_bucket_of(
                             cust.astype(np.int64), nb),
                         "o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "cents": pa.array(cents)})

    return orders.map_batches(to_cents, batch_format="pyarrow",
                              zero_copy_batch=True)


def running_customer_revenue(sf_dir: str):
    """Per-customer running revenue over order dates — the cumulative
    window aggregate (SQL: SUM() OVER (PARTITION BY … ORDER BY … ROWS
    UNBOUNDED PRECEDING)).  ONE keyed exchange — but keyed on
    hash(custkey) % nb BUCKETS, not on the raw key: a per-customer
    map_groups pays ~1-2 ms of UDF dispatch per group (≈ 40 s of pure
    overhead at sf0.1's 15k customers); a per-BUCKET kernel runs one
    vectorized segmented cumsum over every customer in the bucket.
    Totals are accumulated in integer CENTS on both engine and oracle
    sides, so the running sum is exact at any prefix length (float
    cumsum association can never drift the hash).

    Returns pandas (o_custkey, o_orderkey, o_orderdate, running) sorted
    by (o_custkey, o_orderdate, o_orderkey); running is dollars at 2dp.
    """
    from ..runtime import arrow_group, num_hash_buckets
    nb = num_hash_buckets(None)

    def running(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
            .reset_index(drop=True)
        cents = g["cents"].to_numpy(np.int64)
        cs = np.cumsum(cents)
        # segmented cumsum: subtract the prefix total carried in from
        # the previous customer at each group start
        starts, counts = _group_starts(g["o_custkey"].to_numpy(np.int64))
        carry = np.repeat(cs[starts] - cents[starts], counts) \
            if len(cents) else cs
        g["running"] = (cs - carry) / 100.0
        return arrow_group(g[["o_custkey", "o_orderkey", "o_orderdate",
                              "running"]])

    out = (_orders_cents_bucketed(sf_dir, nb)
           .groupby("__bucket")
           .map_groups(running, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)


def q5_local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                              date_lo: str = "1996-01-01",
                              date_hi: str = "1997-01-01"):
    """TPC-H Q5 shape: revenue by nation where the supplier and the
    ordering customer share a nation inside one region — the 6-table
    join (region ⋈ nation ⋈ supplier, customer ⋈ orders ⋈ lineitem).

    Physical plan, ONE shuffle total:
    - region/nation/supplier/customer resolve on the driver into four
      broadcast Arrow/numpy lookups (suppkey→nationkey,
      custkey→nationkey, nationkey→in-region mask, nationkey→name).
      supplier/nation/region are genuinely tiny; the customer side is
      two int64/int8 columns (~9 B/customer — low GBs even at 10⁹
      customers).  Above ``DIM_BROADCAST_MAX_ROWS`` the customer
      broadcast flips to the big-big path: the fused hook emits
      (custkey, supplier-nation, partial-revenue) rows and a SECOND
      shuffle hash_join on custkey resolves the customer nation and
      applies the same-nation filter inside its buckets — two
      exchanges total, nothing corpus-growing ever materializes in
      one process.
    - lineitem ⋈ orders(date-pruned read) is the one big-big edge:
      the existing shuffle hash join on orderkey, with the nation
      resolution + region filter + per-nation partial aggregate FUSED
      into the join's per-bucket hook, so only ≤ |nations| rows per
      bucket leave the reduce.
    - driver combines the tiny partials and attaches names.

    Reference analog: priors broadcast join (media.py:79-111) composed
    with the summarize-json grouped reduce (summarize-json.py:29-105).
    Returns pandas (n_name, revenue) sorted by revenue desc."""
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    broadcast_cust = _dim_broadcast_ok(sf_dir, "customer")
    if broadcast_cust:
        cus = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_nationkey"])
    else:   # big-big path: customer never touches the driver
        cus = pa.table({"c_custkey": pa.array([], pa.int64()),
                        "c_nationkey": pa.array([], pa.int64())})

    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    n_keys = nat["n_nationkey"].to_numpy()
    in_region = np.zeros(int(n_keys.max()) + 1, dtype=bool)
    in_region[n_keys[pc.is_in(nat["n_regionkey"],
                              value_set=rkeys.combine_chunks())
                     .to_numpy(zero_copy_only=False)]] = True
    names = np.empty(int(n_keys.max()) + 1, dtype=object)
    names[n_keys] = nat["n_name"].to_numpy(zero_copy_only=False)

    # sorted-key lookup arrays (searchsorted gather per bucket)
    s_k = sup["s_suppkey"].to_numpy()
    s_ord = np.argsort(s_k, kind="stable")
    c_k = cus["c_custkey"].to_numpy()
    c_ord = np.argsort(c_k, kind="stable")
    lookup_ref = ray.put((s_k[s_ord],
                          sup["s_nationkey"].to_numpy()[s_ord],
                          c_k[c_ord],
                          cus["c_nationkey"].to_numpy()[c_ord],
                          in_region))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    # o_orderdate is projected only so the pruned-schema fast path can
    # resolve the filter (readers.read_parquet); the join's tag stage
    # drops it before the exchange
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate")
                            >= pc.scalar(pd.Timestamp(date_lo)))
                           & (pc.field("o_orderdate")
                              < pc.scalar(pd.Timestamp(date_hi)))))
    # Project-op rename (propagates schema without executing the read —
    # a map_batches lambda leaves schema() unresolvable for hash_join)
    orders = orders.rename_columns({"o_orderkey": "l_orderkey"})

    def _sorted_lookup(keys_sorted, vals, x):
        # FK-safe gather: a key absent from the dimension table is
        # a no-match, never a silent neighbor read or an
        # IndexError past the end
        pos = np.minimum(np.searchsorted(keys_sorted, x),
                         len(keys_sorted) - 1)
        ok = keys_sorted[pos] == x
        return vals[pos], ok

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        # revenue in integer 1e-4 dollars: price and discount each have
        # exactly 2 decimals, so pe*(100-di) is EXACT — the sum is
        # association-free and matches the oracle bit-for-bit no matter
        # how partials combine
        empty = pd.DataFrame({"nk": pd.Series(dtype="int64"),
                              "rev_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        sk, sn, ck, cn, mask = ray.get(lookup_ref)
        s_nat, s_ok = _sorted_lookup(sk, sn, j["l_suppkey"].to_numpy())
        c_nat, c_ok = _sorted_lookup(ck, cn, j["o_custkey"].to_numpy())
        keep = s_ok & c_ok & (s_nat == c_nat) & mask[s_nat]
        if not keep.any():
            return empty
        pe = np.round(j["l_extendedprice"].to_numpy()[keep]
                      * 100.0).astype(np.int64)
        di = np.round(j["l_discount"].to_numpy()[keep]
                      * 100.0).astype(np.int64)
        return pd.DataFrame({"nk": s_nat[keep].astype(np.int64),
                             "rev_p": pe * (100 - di)}).groupby(
            "nk", as_index=False, sort=False).sum()

    def fused_by_cust(j: pd.DataFrame) -> pd.DataFrame:
        # big-big variant: customer nation is NOT broadcast, so emit
        # partial revenue keyed by (custkey, supplier-nation) — the
        # region mask already prunes out-of-region supplier nations
        # (the final keep requires mask[s_nat]), so ≤ |in-region
        # nations| rows per custkey leave the bucket
        empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                              "nk": pd.Series(dtype="int64"),
                              "rev_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        sk, sn, _, _, mask = ray.get(lookup_ref)
        s_nat, s_ok = _sorted_lookup(sk, sn, j["l_suppkey"].to_numpy())
        keep = s_ok & mask[s_nat]
        if not keep.any():
            return empty
        pe = np.round(j["l_extendedprice"].to_numpy()[keep]
                      * 100.0).astype(np.int64)
        di = np.round(j["l_discount"].to_numpy()[keep]
                      * 100.0).astype(np.int64)
        return pd.DataFrame(
            {"o_custkey": j["o_custkey"].to_numpy(np.int64)[keep],
             "nk": s_nat[keep].astype(np.int64),
             "rev_p": pe * (100 - di)}).groupby(
            ["o_custkey", "nk"], as_index=False, sort=False).sum()

    parts = hash_join(li, orders, key="l_orderkey",
                      left_cols=["l_orderkey", "l_suppkey",
                                 "l_extendedprice", "l_discount"],
                      right_cols=["o_custkey"],
                      post=fused if broadcast_cust else fused_by_cust,
                      right_schema=pa.schema(
                          [("l_orderkey", pa.int64()),
                           ("o_custkey", pa.int64()),
                           ("o_orderdate", pa.timestamp("us"))]))
    if not broadcast_cust:
        # second exchange: resolve custkey→nationkey distributed and
        # apply the same-nation predicate inside the join bucket
        cust_ds = _read(sf_dir, "customer",
                        columns=["c_custkey", "c_nationkey"]) \
            .rename_columns({"c_custkey": "o_custkey"})

        def resolve(j: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"nk": pd.Series(dtype="int64"),
                                  "rev_p": pd.Series(dtype="int64")})
            if not len(j):
                return empty
            same = (j["nk"].to_numpy(np.int64)
                    == j["c_nationkey"].to_numpy(np.int64))
            if not same.any():
                return empty
            return j.loc[same, ["nk", "rev_p"]].groupby(
                "nk", as_index=False, sort=False).sum()

        parts = hash_join(
            parts, cust_ds, key="o_custkey",
            left_cols=["o_custkey", "nk", "rev_p"],
            right_cols=["c_nationkey"], post=resolve,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("nk", pa.int64()),
                                   ("rev_p", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("c_nationkey", pa.int64())]))
    out = _driver_combine(parts, ["nk"], [("rev_p", "sum", "rev_e4")])
    df = out.to_pandas()
    df["n_name"] = names[df["nk"].to_numpy(np.int64)]
    df["revenue"] = df["rev_e4"].to_numpy(np.int64) / 10_000.0
    return df.sort_values("revenue", ascending=False)[
        ["n_name", "revenue"]].reset_index(drop=True)


def moving_window_revenue(sf_dir: str, window: int = 4):
    """Per-customer moving window over the last ``window`` orders (SQL:
    SUM/COUNT OVER (PARTITION BY … ORDER BY … ROWS BETWEEN w-1
    PRECEDING AND CURRENT ROW)) — the bounded-frame sibling of
    :func:`running_customer_revenue`, same bucketed one-exchange plan.

    Per bucket: one sort, one global cents cumsum, then the window sum
    of row i is ``cs[i] - cs[j-1]`` with ``j = i - min(pos_in_group,
    w-1)`` — since j never precedes the group start, frames cannot leak
    across customers and the whole bucket is frame-summed with pure
    numpy gathers.  Cents keep every prefix association-exact.

    Returns pandas (o_custkey, o_orderkey, o_orderdate, win_sum,
    win_n) sorted by (o_custkey, o_orderdate, o_orderkey)."""
    from ..runtime import arrow_group, num_hash_buckets
    nb = num_hash_buckets(None)
    w = int(window)

    def frames(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
            .reset_index(drop=True)
        n = len(g)
        cents = g["cents"].to_numpy(np.int64)
        cs = np.cumsum(cents)
        starts, counts = _group_starts(g["o_custkey"].to_numpy(np.int64))
        pos = np.arange(n) - np.repeat(starts, counts)
        width = np.minimum(pos, w - 1)
        j = np.arange(n) - width
        win = cs - np.where(j > 0, cs[np.maximum(j - 1, 0)], 0)
        g["win_sum"] = win / 100.0
        g["win_n"] = (width + 1).astype(np.int64)
        return arrow_group(g[["o_custkey", "o_orderkey", "o_orderdate",
                              "win_sum", "win_n"]])

    out = (_orders_cents_bucketed(sf_dir, nb)
           .groupby("__bucket")
           .map_groups(frames, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)


def order_gap_days(sf_dir: str):
    """Per-customer days since the previous order (SQL LAG) — the
    navigation-window operator.  Same bucketed one-exchange plan as the
    other windows; the LAG itself is one shifted subtraction per bucket
    with group starts reset to the -1 sentinel.  Dates in this corpus
    are midnight-aligned timestamps, so integer µs division by 86400e6
    equals the calendar-day diff.

    Returns pandas (o_custkey, o_orderkey, o_orderdate, gap_days)
    sorted by (o_custkey, o_orderdate, o_orderkey); gap_days int64,
    -1 on each customer's first order."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def bucketed(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__bucket", pa.array(int_bucket_of(
            cust.astype(np.int64), nb)))

    def lag(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
            .reset_index(drop=True)
        n = len(g)
        cust = g["o_custkey"].to_numpy(np.int64)
        us = g["o_orderdate"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        gap = np.empty(n, dtype=np.int64)
        if n:
            gap[0] = -1
            same = cust[1:] == cust[:-1]
            gap[1:] = np.where(same,
                               (us[1:] - us[:-1]) // 86_400_000_000, -1)
        g["gap_days"] = gap
        return arrow_group(g[["o_custkey", "o_orderkey", "o_orderdate",
                              "gap_days"]])

    out = (orders.map_batches(bucketed, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("__bucket")
           .map_groups(lag, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)


def intersect_customers(sf_dir: str, price: float = 150_000.0):
    """INTERSECT set op: customers with ≥1 URGENT order AND ≥1 order
    above ``price`` — both sides from ONE pruned read of orders.

    Per block: rows matching either predicate collapse to ≤ 1 row per
    (custkey in block) carrying two boolean flags (Arrow group_by max),
    so the exchange moves flag partials, never order rows; one bucketed
    reduce ORs the flags per customer and keeps both-true keys.  At any
    scale the shuffle payload is bounded by blocks × distinct customers
    per block.  Returns pandas (o_custkey) sorted."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        u = pc.equal(t["o_orderpriority"], "1-URGENT")
        h = pc.greater(t["o_totalprice"], price)
        t = pa.table({"o_custkey": t["o_custkey"],
                      "u": pc.cast(u, pa.int8()),
                      "h": pc.cast(h, pa.int8())})
        t = t.filter(pc.or_(pc.equal(t["u"], 1), pc.equal(t["h"], 1)))
        g = t.group_by("o_custkey").aggregate([("u", "max"),
                                               ("h", "max")])
        g = g.rename_columns(["o_custkey", "u", "h"])
        k = g["o_custkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__bucket",
                            pa.array(int_bucket_of(k.astype(np.int64),
                                                   nb)))

    def both(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_custkey", sort=True).agg(
            u=("u", "max"), h=("h", "max")).reset_index()
        keep = agg.loc[(agg["u"] == 1) & (agg["h"] == 1), ["o_custkey"]]
        return arrow_group(keep.reset_index(drop=True))

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__bucket")
           .map_groups(both, batch_format="pandas")
           .to_pandas())
    return out.sort_values("o_custkey").reset_index(drop=True)


def monthly_revenue_trend(sf_dir: str):
    """Monthly order-revenue trend (GROUP BY DATE_TRUNC month) — the
    time-bucketed rollup every monitoring pipeline runs.  Arrow
    floor_temporal per block + per-block partial sums in integer cents,
    driver-combined (≤ months × blocks partial rows; month cardinality
    is calendar-bounded, so the q1 driver-combine bound applies at any
    corpus size).  Returns pandas (month, revenue, n_orders) sorted."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["o_orderdate"], unit="month")
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"month": month, "cents": cents}) \
            .group_by("month").aggregate([("cents", "sum"),
                                          ([], "count_all")])
        return g.rename_columns(["month", "cents_p", "n_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, ["month"],
                          [("cents_p", "sum", "cents"),
                           ("n_p", "sum", "n_orders")])
    df = out.to_pandas().sort_values("month").reset_index(drop=True)
    df["revenue"] = df["cents"].to_numpy(np.int64) / 100.0
    return df[["month", "revenue", "n_orders"]]


def above_nation_avg_customers(sf_dir: str):
    """Customers whose account balance beats their nation's average —
    the correlated-subquery shape (SQL: balance > AVG() OVER
    (PARTITION BY nation)).  Two passes over customer, zero shuffles:
    per-block (nation, sum_cents, n) partials driver-combine to ≤
    |nations| rows, the avg array broadcasts back, and a vectorized
    filter pass keeps qualifying rows.  The average is compared as
    ``cents > sum_cents/n`` with one float64 division on both engine
    and oracle sides, so the boundary predicate is bit-identical.
    Returns pandas (c_custkey, c_nationkey, c_acctbal) sorted."""
    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                        pa.int64())
        g = pa.table({"c_nationkey": t["c_nationkey"], "cents": cents}) \
            .group_by("c_nationkey").aggregate([("cents", "sum"),
                                                ([], "count_all")])
        return g.rename_columns(["c_nationkey", "cents_p", "n_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    stats = _driver_combine(parts, ["c_nationkey"],
                            [("cents_p", "sum", "cents"),
                             ("n_p", "sum", "n")]).to_pandas()
    nk = stats["c_nationkey"].to_numpy(np.int64)
    avg = np.full(int(nk.max()) + 1, np.inf)
    avg[nk] = stats["cents"].to_numpy(np.int64) \
        / stats["n"].to_numpy(np.int64)
    avg_ref = ray.put(avg)

    def above(t: pa.Table) -> pa.Table:
        a = ray.get(avg_ref)
        cents = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        nat = t["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(cents > a[nat]))

    out = ds.map_batches(above, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def json_field_rollup(sf_dir: str):
    """Semi-structured extraction: pull an integer field out of the
    events table's JSON ``props`` column and roll it up per event type
    — the json_extract + aggregate shape, with the parse VECTORIZED as
    one Arrow ``extract_regex`` kernel per block (a per-row json.loads
    is the classic hot-path Python loop this engine bans).  Partials
    are ≤ |event types| rows per block, driver-combined.

    Returns pandas (event_type, sum_k, n_events) sorted by type."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, 0), pa.int64())
        g = pa.table({"event_type": t["event_type"], "k": k}) \
            .group_by("event_type").aggregate([("k", "sum"),
                                               ([], "count_all")])
        return g.rename_columns(["event_type", "sum_k_p", "n_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, ["event_type"],
                          [("sum_k_p", "sum", "sum_k"),
                           ("n_p", "sum", "n_events")])
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


def source_stats_join(sf_dir: str):
    """STRING-keyed shuffle hash join showcase: every document row
    joined to its source's corpus-wide doc count through the generic
    :func:`~vframe_ray.stages.joins.hash_join` — the key buckets via
    ``runtime.key_bucket_of`` (vectorized string hashing), everything
    downstream of the exchange is dtype-agnostic.  (At this size a
    broadcast would win; the point is exercising the big-big string-key
    path the engine needs when neither side fits the object store.)

    Returns pandas (doc_id, source, n_chars, src_docs) sorted."""
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "n_p"])

    stats = _driver_combine(
        _read(sf_dir, "documents", columns=["source"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["source"], [("n_p", "sum", "src_docs")])
    right = ray.data.from_arrow(stats)

    out = hash_join(docs, right, key="source",
                    left_cols=["doc_id", "source", "n_chars"],
                    right_cols=["src_docs"])
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df[["doc_id", "source", "n_chars", "src_docs"]]


Q18_QTY = 200.0
Q18_K = 100


def q18_large_orders(sf_dir: str, qty: float = Q18_QTY, k: int = Q18_K):
    """TPC-H Q18 shape (large-volume orders): filter orders by a
    GROUPED-AGGREGATE THRESHOLD over their lineitems (HAVING
    sum(quantity) > qty), join back to orders + customer, global
    top-k by price.

    Physical plan: per-block Arrow partial sums by orderkey → bucketed
    exact sum (orderkey cardinality is corpus-sized, so no driver
    combine) → HAVING filter inside the bucket kernel (only qualifying
    orders leave the reduce) → shuffle hash join to orders with the
    per-block top-k partial FUSED into the join's bucket hook (each
    bucket emits ≤ k candidate rows) → driver merges ≤ k·buckets rows
    and resolves customer names from a broadcast-read of the ≤ k final
    custkeys.  Two exchanges total, both bounded.

    Returns pandas (c_name, o_custkey, o_orderkey, o_orderdate,
    o_totalprice, sum_qty) sorted by (o_totalprice desc, o_orderdate,
    o_orderkey), ≤ k rows."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from ..stages.joins import hash_join
    nb = num_hash_buckets(None)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("l_quantity", "sum")])
        g = g.rename_columns(["o_orderkey", "qty_p"])
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(key.astype(np.int64), nb)))

    def having(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_orderkey", as_index=False, sort=False)[
            "qty_p"].sum().rename(columns={"qty_p": "sum_qty"})
        return arrow_group(agg[agg["sum_qty"] > qty]
                           .reset_index(drop=True))

    big = (li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(having, batch_format="pandas"))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    def topk_partial(j: pd.DataFrame) -> pd.DataFrame:
        if not len(j):
            return j
        return j.sort_values(["o_totalprice", "o_orderdate",
                              "o_orderkey"],
                             ascending=[False, True, True]).head(k)

    j = hash_join(orders, big, key="o_orderkey",
                  left_cols=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"],
                  right_cols=["sum_qty"], post=topk_partial)
    df = j.to_pandas().sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True]).head(k).reset_index(drop=True)
    import pyarrow.parquet as pq
    # pushdown-filtered read: only the ≤ k finalists' names leave
    # storage, never the whole customer table (and an EMPTY finalist
    # set reads nothing at all — filters=None would scan everything)
    finalists = sorted(set(df["o_custkey"].tolist()))
    if not finalists:
        return pd.DataFrame({
            "c_name": pd.Series(dtype="object"),
            "o_custkey": pd.Series(dtype="int64"),
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "o_totalprice": pd.Series(dtype="float64"),
            "sum_qty": pd.Series(dtype="float64")})
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", finalists)]).to_pandas()
    df = df.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .drop(columns="c_custkey")
    return df.sort_values(["o_totalprice", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True])[
        ["c_name", "o_custkey", "o_orderkey", "o_orderdate",
         "o_totalprice", "sum_qty"]].reset_index(drop=True)


def priority_sequence(sf_dir: str):
    """Grouped ORDERED string aggregation (SQL string_agg /
    collect_list): per customer, the space-joined sequence of order
    priorities in (date, orderkey) order — the collect-to-list operator
    shape.  Bucketed one-exchange plan; the per-group join runs inside
    pandas' C-level groupby-agg (string concatenation is inherently
    object work — it is per GROUP, not per row, and bounded by the
    group's output string).

    Returns pandas (o_custkey, n_orders, priority_seq) sorted."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_orderdate",
                            "o_orderpriority"])

    def bucketed(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(int_bucket_of(
            cust.astype(np.int64), nb)))

    def agg(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        out = g.groupby("o_custkey", sort=True).agg(
            n_orders=("o_orderpriority", "size"),
            priority_seq=("o_orderpriority", " ".join)).reset_index()
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return arrow_group(out)

    out = (orders.map_batches(bucketed, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("__b").map_groups(agg, batch_format="pandas")
           .to_pandas())
    return out.sort_values("o_custkey").reset_index(drop=True)


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_DATE_LO = "1996-01-01"
Q7_DATE_HI = "1998-01-01"


def q7_volume_shipping(sf_dir: str, nation_a: str = Q7_NATION_A,
                       nation_b: str = Q7_NATION_B,
                       date_lo: str = Q7_DATE_LO,
                       date_hi: str = Q7_DATE_HI):
    """TPC-H Q7 shape (volume shipping): revenue shipped between two
    nations per (supplier nation, customer nation, ship year).

    Physical plan: the supplier-nation filter runs BEFORE the shuffle —
    a broadcast suppkey→nationkey lookup prunes lineitem to the two
    nations' suppliers (2/|nations| of rows) and reduces each surviving
    row to (orderkey, supp_nk, year, exact-integer revenue), so the one
    big-big exchange (hash join to orders on orderkey) moves only
    pruned, pre-projected rows.  Customer nation resolves like Q5:
    broadcast custkey→nationkey under ``DIM_BROADCAST_MAX_ROWS``, else
    a second hash join on custkey with the pair filter inside its
    buckets.  Partials are ≤ 2·|years| rows per bucket; driver-combined.

    Reference analog: priors broadcast join (media.py:79-111) +
    summarize-json grouped reduce, composed across two fact tables.
    Returns pandas (supp_nation, cust_nation, l_year, revenue) sorted.
    """
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    n_keys = nat["n_nationkey"].to_numpy()
    names = np.empty(int(n_keys.max()) + 1, dtype=object)
    names[n_keys] = nat["n_name"].to_numpy(zero_copy_only=False)
    name_to_key = {n: int(k) for k, n in zip(n_keys, names[n_keys])}
    a_key, b_key = name_to_key[nation_a], name_to_key[nation_b]

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    s_k = sup["s_suppkey"].to_numpy()
    s_ord = np.argsort(s_k, kind="stable")
    broadcast_cust = _dim_broadcast_ok(sf_dir, "customer")
    if broadcast_cust:
        cus = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_nationkey"])
    else:
        cus = pa.table({"c_custkey": pa.array([], pa.int64()),
                        "c_nationkey": pa.array([], pa.int64())})
    c_k = cus["c_custkey"].to_numpy()
    c_ord = np.argsort(c_k, kind="stable")
    lookup_ref = ray.put((s_k[s_ord],
                          sup["s_nationkey"].to_numpy()[s_ord]
                          .astype(np.int64),
                          c_k[c_ord],
                          cus["c_nationkey"].to_numpy()[c_ord]
                          .astype(np.int64)))

    def _sorted_lookup(keys_sorted, vals, x):
        pos = np.minimum(np.searchsorted(keys_sorted, x),
                         len(keys_sorted) - 1)
        ok = keys_sorted[pos] == x
        return vals[pos], ok

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"],
               filter=((pc.field("l_shipdate")
                        >= pc.scalar(pd.Timestamp(date_lo)))
                       & (pc.field("l_shipdate")
                          < pc.scalar(pd.Timestamp(date_hi)))))

    def prune(t: pa.Table) -> pa.Table:
        # supplier-nation prune + exact-integer revenue BEFORE the
        # exchange: price/discount have exactly 2 decimals each, so
        # pe*(100-di) in 1e-4 dollars is association-free
        sk, sn, _, _ = ray.get(lookup_ref)
        s_nat, ok = _sorted_lookup(
            sk, sn, t["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = ok & ((s_nat == a_key) | (s_nat == b_key))
        pe = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        di = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        year = pc.year(t["l_shipdate"]).to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({
            "l_orderkey": t["l_orderkey"].to_numpy(
                zero_copy_only=False)[keep],
            "supp_nk": s_nat[keep], "l_year": year,
            "rev_p": pe * (100 - di)})

    li = li.map_batches(prune, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    li_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("supp_nk", pa.int64()),
                           ("l_year", pa.int64()),
                           ("rev_p", pa.int64())])

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        # broadcast path: resolve customer nation here; keep only the
        # (a→b) / (b→a) pairs; ≤ 2·|years| partial rows leave the bucket
        empty = pd.DataFrame({"supp_nk": pd.Series(dtype="int64"),
                              "cust_nk": pd.Series(dtype="int64"),
                              "l_year": pd.Series(dtype="int64"),
                              "rev_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        _, _, ck, cn = ray.get(lookup_ref)
        c_nat, ok = _sorted_lookup(ck, cn, j["o_custkey"].to_numpy())
        s_nat = j["supp_nk"].to_numpy(np.int64)
        keep = ok & (((s_nat == a_key) & (c_nat == b_key))
                     | ((s_nat == b_key) & (c_nat == a_key)))
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"supp_nk": s_nat[keep], "cust_nk": c_nat[keep],
             "l_year": j["l_year"].to_numpy(np.int64)[keep],
             "rev_p": j["rev_p"].to_numpy(np.int64)[keep]}).groupby(
            ["supp_nk", "cust_nk", "l_year"],
            as_index=False, sort=False).sum()

    def fused_by_cust(j: pd.DataFrame) -> pd.DataFrame:
        # big-big path: customer nation is not broadcast; emit partial
        # revenue keyed by (custkey, supp_nk, year) — ≤ 2·|years| rows
        # per custkey (the supplier side is already pruned to {a,b})
        empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                              "supp_nk": pd.Series(dtype="int64"),
                              "l_year": pd.Series(dtype="int64"),
                              "rev_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        return j[["o_custkey", "supp_nk", "l_year", "rev_p"]].groupby(
            ["o_custkey", "supp_nk", "l_year"],
            as_index=False, sort=False).sum()

    parts = hash_join(li, orders, key="l_orderkey",
                      left_cols=["l_orderkey", "supp_nk", "l_year",
                                 "rev_p"],
                      right_cols=["o_custkey"],
                      post=fused if broadcast_cust else fused_by_cust,
                      left_schema=li_schema,
                      right_schema=pa.schema(
                          [("l_orderkey", pa.int64()),
                           ("o_custkey", pa.int64())]))
    if not broadcast_cust:
        cust_ds = _read(sf_dir, "customer",
                        columns=["c_custkey", "c_nationkey"]) \
            .rename_columns({"c_custkey": "o_custkey"})

        def resolve(j: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"supp_nk": pd.Series(dtype="int64"),
                                  "cust_nk": pd.Series(dtype="int64"),
                                  "l_year": pd.Series(dtype="int64"),
                                  "rev_p": pd.Series(dtype="int64")})
            if not len(j):
                return empty
            s_nat = j["supp_nk"].to_numpy(np.int64)
            c_nat = j["c_nationkey"].to_numpy(np.int64)
            keep = (((s_nat == a_key) & (c_nat == b_key))
                    | ((s_nat == b_key) & (c_nat == a_key)))
            if not keep.any():
                return empty
            out = j.loc[keep, ["supp_nk", "l_year", "rev_p"]].copy()
            out["cust_nk"] = c_nat[keep]
            return out.groupby(["supp_nk", "cust_nk", "l_year"],
                               as_index=False, sort=False)["rev_p"].sum()

        parts = hash_join(
            parts, cust_ds, key="o_custkey",
            left_cols=["o_custkey", "supp_nk", "l_year", "rev_p"],
            right_cols=["c_nationkey"], post=resolve,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("supp_nk", pa.int64()),
                                   ("l_year", pa.int64()),
                                   ("rev_p", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("c_nationkey", pa.int64())]))
    out = _driver_combine(parts, ["supp_nk", "cust_nk", "l_year"],
                          [("rev_p", "sum", "rev_e4")]).to_pandas()
    out["supp_nation"] = names[out["supp_nk"].to_numpy(np.int64)]
    out["cust_nation"] = names[out["cust_nk"].to_numpy(np.int64)]
    out["revenue"] = out["rev_e4"].to_numpy(np.int64) / 10_000.0
    return out.sort_values(["supp_nation", "cust_nation", "l_year"])[
        ["supp_nation", "cust_nation", "l_year", "revenue"]] \
        .reset_index(drop=True)


Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1996-07-01"
Q10_K = 20


def q10_returned_items(sf_dir: str, date_lo: str = Q10_DATE_LO,
                       date_hi: str = Q10_DATE_HI, k: int = Q10_K):
    """TPC-H Q10 shape (returned-item reporting): top-k customers by
    revenue lost to returned lineitems of a date window's orders.

    Physical plan: both fact reads are pushdown-pruned (orders by date,
    lineitem by returnflag), ONE big-big hash join on orderkey with the
    per-custkey revenue partial fused into the join bucket, then one
    bucketed exchange on custkey for the exact per-customer sum with a
    per-bucket top-k partial (≤ k rows per bucket leave the reduce).
    The driver merges ≤ k·buckets rows and resolves the ≤ k finalists'
    names/balances via a pushdown-filtered customer read — the Q18
    finalist pattern; the whole customer table never moves.

    Returns pandas (c_custkey, c_name, revenue, c_acctbal, n_name)
    sorted by revenue desc then custkey, ≤ k rows."""
    import pyarrow.parquet as pq
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from ..stages.joins import hash_join
    nb = num_hash_buckets(None)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate")
                            >= pc.scalar(pd.Timestamp(date_lo)))
                           & (pc.field("o_orderdate")
                              < pc.scalar(pd.Timestamp(date_hi))))) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_returnflag"],
               filter=(pc.field("l_returnflag") == pc.scalar("R")))

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                              "rev_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        pe = np.round(j["l_extendedprice"].to_numpy()
                      * 100.0).astype(np.int64)
        di = np.round(j["l_discount"].to_numpy()
                      * 100.0).astype(np.int64)
        return pd.DataFrame({"o_custkey": j["o_custkey"]
                             .to_numpy(np.int64),
                             "rev_p": pe * (100 - di)}).groupby(
            "o_custkey", as_index=False, sort=False).sum()

    parts = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_custkey"], post=fused,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64()),
                               ("l_returnflag", pa.string())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
        # the 6-month order window keeps ~8% of orderkeys: the Bloom
        # pass drops ~92% of returned lineitems BEFORE the exchange
        runtime_filter=True)

    def bucketed(t: pa.Table) -> pa.Table:
        key = t["o_custkey"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(key.astype(np.int64), nb)))

    def topk_bucket(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_custkey", as_index=False, sort=False)[
            "rev_p"].sum()
        agg = agg.sort_values(["rev_p", "o_custkey"],
                              ascending=[False, True]).head(k)
        return arrow_group(agg.reset_index(drop=True))

    df = (parts.map_batches(bucketed, batch_format="pyarrow",
                            zero_copy_batch=True)
          .groupby("__b").map_groups(topk_bucket, batch_format="pandas")
          .to_pandas())
    if df.empty:            # no returned items: never read customer
        return pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "c_name": pd.Series(dtype="object"),
            "revenue": pd.Series(dtype="float64"),
            "c_acctbal": pd.Series(dtype="float64"),
            "n_name": pd.Series(dtype="object")})
    df = df.sort_values(["rev_p", "o_custkey"],
                        ascending=[False, True]).head(k) \
        .reset_index(drop=True)
    finalists = sorted(set(df["o_custkey"].tolist()))
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", finalists)]).to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")) \
        .to_pandas()
    df = df.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .merge(nat[["n_nationkey", "n_name"]],
               left_on="c_nationkey", right_on="n_nationkey")
    df["revenue"] = df["rev_p"].to_numpy(np.int64) / 10_000.0
    return df.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True])[
        ["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]] \
        .reset_index(drop=True)


BRAND_SIZE_LO = 1
BRAND_SIZE_HI = 15
BRAND_QTY_LO = 5.0
BRAND_QTY_HI = 30.0


def brand_revenue(sf_dir: str, size_lo: int = BRAND_SIZE_LO,
                  size_hi: int = BRAND_SIZE_HI,
                  qty_lo: float = BRAND_QTY_LO,
                  qty_hi: float = BRAND_QTY_HI):
    """TPC-H Q19 shape (discounted revenue by part attributes): revenue
    per brand over lineitems of size-filtered parts within a quantity
    band — the fact⋈dimension predicate-join every catalog pipeline
    runs, and the first operator over the ``part`` table.

    Physical plan: the part side is read predicate-pruned (p_size
    range) to (partkey, brand-code); under ``DIM_BROADCAST_MAX_ROWS``
    it broadcasts as a sorted partkey array + int8 brand codes and the
    whole query is ZERO-shuffle (per-block membership searchsorted +
    partial sums per brand, driver-combined).  Above the threshold it
    flips to the shuffle hash join on partkey with the same partial
    aggregate fused into the join buckets.  Brand cardinality is
    catalog-bounded, so the q1 driver-combine bound applies.

    Returns pandas (p_brand, revenue, n_items) sorted by brand."""
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    qty_filter = ((pc.field("l_quantity") >= pc.scalar(qty_lo))
                  & (pc.field("l_quantity") <= pc.scalar(qty_hi)))
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"], filter=qty_filter)

    if _dim_broadcast_ok(sf_dir, "part"):
        prt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_size"],
            filters=[("p_size", ">=", size_lo),
                     ("p_size", "<=", size_hi)])
        brands = pc.unique(prt["p_brand"].combine_chunks()).sort()
        brand_names = brands.to_pylist()
        code_of = {b: i for i, b in enumerate(brand_names)}
        p_k = prt["p_partkey"].to_numpy()
        ordix = np.argsort(p_k, kind="stable")
        codes = np.array([code_of[b] for b in
                          prt["p_brand"].to_pylist()],
                         dtype=np.int64)[ordix]
        lookup_ref = ray.put((p_k[ordix], codes))

        def partial(t: pa.Table) -> pa.Table:
            pk, cd = ray.get(lookup_ref)
            if not len(pk):
                return pa.table({"code": pa.array([], pa.int64()),
                                 "rev_p": pa.array([], pa.int64()),
                                 "n_p": pa.array([], pa.int64())})
            x = t["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(pk, x), len(pk) - 1)
            ok = pk[pos] == x
            pe = np.round(t["l_extendedprice"].to_numpy(
                zero_copy_only=False)[ok] * 100.0).astype(np.int64)
            di = np.round(t["l_discount"].to_numpy(
                zero_copy_only=False)[ok] * 100.0).astype(np.int64)
            g = pa.table({"code": pa.array(cd[pos[ok]]),
                          "rev": pa.array(pe * (100 - di))}) \
                .group_by("code").aggregate([("rev", "sum"),
                                             ([], "count_all")])
            return g.rename_columns(["code", "rev_p", "n_p"])

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
        out = _driver_combine(parts, ["code"],
                              [("rev_p", "sum", "rev_e4"),
                               ("n_p", "sum", "n_items")]).to_pandas()
        out["p_brand"] = [brand_names[c] for c in
                          out["code"].to_numpy(np.int64)]
    else:
        prt_ds = _read(sf_dir, "part",
                       columns=["p_partkey", "p_brand", "p_size"],
                       filter=((pc.field("p_size") >= pc.scalar(size_lo))
                               & (pc.field("p_size")
                                  <= pc.scalar(size_hi)))) \
            .rename_columns({"p_partkey": "l_partkey"})

        def fused(j: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                                  "rev_p": pd.Series(dtype="int64"),
                                  "n_p": pd.Series(dtype="int64")})
            if not len(j):
                return empty
            pe = np.round(j["l_extendedprice"].to_numpy()
                          * 100.0).astype(np.int64)
            di = np.round(j["l_discount"].to_numpy()
                          * 100.0).astype(np.int64)
            out = pd.DataFrame({"p_brand": j["p_brand"].to_numpy(),
                                "rev_p": pe * (100 - di)})
            g = out.groupby("p_brand", as_index=False, sort=False) \
                .agg(rev_p=("rev_p", "sum"), n_p=("rev_p", "size"))
            g["n_p"] = g["n_p"].astype(np.int64)
            return g

        parts = hash_join(
            li, prt_ds, key="l_partkey",
            left_cols=["l_partkey", "l_extendedprice", "l_discount"],
            right_cols=["p_brand"], post=fused,
            left_schema=pa.schema([("l_partkey", pa.int64()),
                                   ("l_quantity", pa.float64()),
                                   ("l_extendedprice", pa.float64()),
                                   ("l_discount", pa.float64())]),
            right_schema=pa.schema([("l_partkey", pa.int64()),
                                    ("p_brand", pa.string()),
                                    ("p_size", pa.int32())]))
        out = _driver_combine(parts, ["p_brand"],
                              [("rev_p", "sum", "rev_e4"),
                               ("n_p", "sum", "n_items")]).to_pandas()
    out["revenue"] = out["rev_e4"].to_numpy(np.int64) / 10_000.0
    out["n_items"] = out["n_items"].to_numpy(np.int64)
    return out.sort_values("p_brand")[
        ["p_brand", "revenue", "n_items"]].reset_index(drop=True)


def daily_active_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per (event_type, day) — the
    count-distinct rollup every analytics pipeline runs, built to stay
    exact at corpus scale: per-block dedup of (event_type, day, user)
    triples (combiner), ONE exchange bucketed by hash(user) — every row
    of a user lands in exactly one bucket, so the per-bucket triple
    dedup is globally exact and per-(type, day) partial counts sum
    without double-counting — then a driver combine over ≤ buckets ×
    |types·days| tiny partial rows.  No corpus-sized distinct set is
    ever collected in one place.

    Returns pandas (event_type, day, n_users) sorted."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "user_id"])

    def block_dedup(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.table({"event_type": t["event_type"], "day": day,
                      "user_id": t["user_id"]}) \
            .group_by(["event_type", "day", "user_id"]) \
            .aggregate([([], "count_all")]) \
            .drop_columns(["count_all"])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def bucket_count(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["event_type", "day", "user_id"])
        out = d.groupby(["event_type", "day"], as_index=False,
                        sort=False).agg(n_p=("user_id", "size"))
        out["n_p"] = out["n_p"].astype(np.int64)
        return arrow_group(out)

    parts = (ds.map_batches(block_dedup, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("__b").map_groups(bucket_count,
                                        batch_format="pandas"))
    out = _driver_combine(parts, ["event_type", "day"],
                          [("n_p", "sum", "n_users")]).to_pandas()
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def latest_event_per_user(sf_dir: str):
    """Keep-latest dedup (the "current state" operator): each user's
    most recent event row, ties on ts broken by the larger event_id —
    SQL's ROW_NUMBER() OVER (PARTITION BY user ORDER BY ts DESC, id
    DESC) = 1.  Per-block vectorized keep-latest (one lexsort +
    boundary mask — the block combiner bounds exchange volume at ≤
    |users| rows per block), then ONE hash(user)-bucketed exchange and
    the same kernel per bucket.  No sort of the full table anywhere.

    Returns pandas (user_id, event_id, ts, event_type, value) sorted
    by user_id."""
    from ..runtime import int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type",
                        "value"])

    def _keep_latest(t: pa.Table) -> pa.Table:
        if not len(t):
            return t
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u_sorted = user[order]
        is_last = np.r_[u_sorted[1:] != u_sorted[:-1], True]
        return t.take(pa.array(np.sort(order[is_last])))

    def block_latest(t: pa.Table) -> pa.Table:
        t = _keep_latest(t)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def bucket_latest(g: pa.Table) -> pa.Table:
        return _keep_latest(g.drop_columns(["__b"]))

    out = (ds.map_batches(block_latest, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(bucket_latest,
                                      batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "event_id", "ts", "event_type", "value"]]


PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str,
                     types: tuple = PIVOT_EVENT_TYPES):
    """Per-user event-type count pivot (long → wide): one n_<type>
    column per known event type plus the total — the feature-vector
    rollup behind every per-entity ML table.  Per-block Arrow partial
    counts by (user, type) shrink the exchange to ≤ |users|·|types|
    rows per block; ONE hash(user)-bucketed exchange, then a vectorized
    pandas pivot per bucket.  User cardinality is corpus-sized, so
    there is deliberately NO driver combine.

    Returns pandas (user_id, n_<type>..., n_events) sorted by user."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    out_cols = [f"n_{t}" for t in types]

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "event_type", "n_p"])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def pivot(g: pd.DataFrame) -> pa.Table:
        w = g.pivot_table(index="user_id", columns="event_type",
                          values="n_p", aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"user_id": w.index.to_numpy(np.int64)})
        for ty, c in zip(types, out_cols):
            out[c] = (w[ty].to_numpy(np.int64) if ty in w.columns
                      else np.zeros(len(w), np.int64))
        # unknown types (not in ``types``) still count toward the total
        out["n_events"] = w.to_numpy().sum(axis=1).astype(np.int64)
        return arrow_group(out)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(pivot, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


def doc_length_histogram(sf_dir: str):
    """Log2-bucketed document-length histogram — the corpus-shape
    diagnostic run before every training-data cut.  floor(log2(chars))
    per block (one Arrow kernel; log2 of a positive int is the same
    libm double on engine and oracle), partial (count, sum) per bucket,
    driver-combined (bucket cardinality is log-bounded ≤ 64).

    Returns pandas (bucket, n_docs, total_chars) sorted by bucket."""
    ds = _read(sf_dir, "documents", columns=["n_chars"],
               filter=(pc.field("n_chars") > pc.scalar(0)))

    def partial(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.log2(pc.cast(t["n_chars"],
                                             pa.float64()))),
                    pa.int64())
        g = pa.table({"bucket": b, "n_chars": t["n_chars"]}) \
            .group_by("bucket").aggregate([([], "count_all"),
                                           ("n_chars", "sum")])
        return g.rename_columns(["bucket", "n_p", "chars_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, ["bucket"],
                          [("n_p", "sum", "n_docs"),
                           ("chars_p", "sum", "total_chars")])
    return out.to_pandas().sort_values("bucket").reset_index(drop=True)


def revenue_pareto(sf_dir: str):
    """Revenue Pareto curve: customers ranked by total revenue with
    GLOBAL cumulative revenue and cumulative share — SQL's SUM() OVER
    (ORDER BY revenue DESC) with no partition, i.e. a global scan.

    Physical plan: bucketed exact per-customer cents (per-block
    partials, one hash(custkey) exchange), a DISTRIBUTED sort on
    (cents desc, custkey), then :func:`~vframe_ray.stages.scan.
    global_prefix_scan` — the two-phase parallel scan over block refs
    (per-block sums → driver exclusive prefix → per-block cumsum +
    carried offset), so the running total is exact in integer cents
    and no stage ever sees more than one block of rows.  The share is
    ONE float64 division per row on both engine and oracle sides.

    Returns pandas (o_custkey, revenue, cum_revenue, cum_share) in
    rank order."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from ..stages.scan import global_prefix_scan
    nb = num_hash_buckets(None)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"o_custkey": t["o_custkey"], "cents": cents}) \
            .group_by("o_custkey").aggregate([("cents", "sum")]) \
            .rename_columns(["o_custkey", "cents"])
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(cust.astype(np.int64), nb)))

    def exact(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_custkey", as_index=False, sort=False)[
            "cents"].sum()
        return arrow_group(agg)

    totals_ds = (orders.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .groupby("__b").map_groups(exact,
                                            batch_format="pandas"))
    ranked = totals_ds.sort(["cents", "o_custkey"],
                            descending=[True, False])
    scanned, grand = global_prefix_scan(ranked, ["cents"])
    total = int(grand[0])

    def finish(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        cum = t["cum_cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": t["o_custkey"],
            "revenue": pa.array(cents / 100.0),
            "cum_revenue": pa.array(cum / 100.0),
            "cum_share": pa.array(cum / float(total))})

    return scanned.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas() \
        .reset_index(drop=True)


def event_transition_counts(sf_dir: str):
    """Event-type transition matrix (the Markov-chain rollup): for each
    user's (ts, event_id)-ordered event stream, count consecutive
    (from_type → to_type) pairs corpus-wide.  ONE hash(user) exchange;
    per bucket one lexsort + shifted compare builds every user's
    adjacent pairs vectorized (no per-user loop), partial pair counts
    are ≤ |types|² per bucket, driver-combined.

    Returns pandas (from_type, to_type, n) sorted."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def bucketed(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def pairs(g: pd.DataFrame) -> pa.Table:
        user = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, user))
        u_s, ty_s = user[order], ty[order]
        nxt = u_s[1:] == u_s[:-1]          # same user → adjacent pair
        out = pd.DataFrame({"from_type": ty_s[:-1][nxt],
                            "to_type": ty_s[1:][nxt]})
        agg = out.groupby(["from_type", "to_type"], as_index=False,
                          sort=False).size().rename(columns={"size":
                                                             "n_p"})
        # explicit types: a bucket whose users all have ONE event emits
        # an empty frame, and from_pandas would infer null columns that
        # drift the block schema
        return pa.table({
            "from_type": pa.array(agg["from_type"], pa.string()),
            "to_type": pa.array(agg["to_type"], pa.string()),
            "n_p": pa.array(agg["n_p"].to_numpy(np.int64))})

    parts = (ds.map_batches(bucketed, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("__b").map_groups(pairs, batch_format="pandas"))
    out = _driver_combine(parts, ["from_type", "to_type"],
                          [("n_p", "sum", "n")])
    return out.to_pandas().sort_values(["from_type", "to_type"]) \
        .reset_index(drop=True)


def event_gap_stats(sf_dir: str):
    """Inter-event latency per transition pair: for each user's
    (ts, event_id)-ordered stream, the count and total/mean gap of
    consecutive (from_type → to_type) steps — the "how long between a
    view and the purchase" report.  Same single hash(user) exchange and
    vectorized lexsort + shifted compare as
    :func:`event_transition_counts`; gaps stay exact integer
    microseconds through the whole reduce, so partial-sum association
    cannot drift the value — the ONLY float work is the final
    mean division, reproduced verbatim by the SQL oracle.

    Returns pandas (from_type, to_type, n, total_gap_us, mean_gap_s)
    sorted by (from_type, to_type)."""
    from ..runtime import int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def bucketed(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def pair_gaps(g: pd.DataFrame) -> pa.Table:
        user = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, user))
        u_s, ty_s, ts_s = user[order], ty[order], ts[order]
        nxt = u_s[1:] == u_s[:-1]
        out = pd.DataFrame({"from_type": ty_s[:-1][nxt],
                            "to_type": ty_s[1:][nxt],
                            "gap": ts_s[1:][nxt] - ts_s[:-1][nxt]})
        agg = out.groupby(["from_type", "to_type"], as_index=False,
                          sort=False).agg(n_p=("gap", "size"),
                                          gap_p=("gap", "sum"))
        return pa.table({
            "from_type": pa.array(agg["from_type"], pa.string()),
            "to_type": pa.array(agg["to_type"], pa.string()),
            "n_p": pa.array(agg["n_p"].to_numpy(np.int64)),
            "gap_p": pa.array(agg["gap_p"].to_numpy(np.int64))})

    parts = (ds.map_batches(bucketed, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("__b").map_groups(pair_gaps,
                                        batch_format="pandas"))
    out = _driver_combine(parts, ["from_type", "to_type"],
                          [("n_p", "sum", "n"),
                           ("gap_p", "sum", "total_gap_us")]).to_pandas()
    out["mean_gap_s"] = np.round(
        (out["total_gap_us"].to_numpy(np.int64).astype(np.float64)
         / out["n"].to_numpy(np.int64)) / 1_000_000.0, 6)
    return out.sort_values(["from_type", "to_type"]) \
        .reset_index(drop=True)


LATE_SHIP_DAYS = 90


def late_shipment_rate(sf_dir: str, late_days: int = LATE_SHIP_DAYS):
    """Derived-predicate rate per class: the fraction of lineitems
    shipped more than ``late_days`` after their order date, per order
    priority — the fact⋈fact boolean-rate rollup (SLA / freshness
    dashboards).  ONE shuffle: hash join lineitem⋈orders on orderkey
    with the (n_late, n_total) integer partials per priority fused into
    the join bucket; priority cardinality is enum-bounded, so the
    driver combine applies.  The rate is ONE float64 division per class
    on both engine and oracle sides.

    Returns pandas (o_orderpriority, n_late, n_items, late_rate)
    sorted by priority."""
    from ..stages.joins import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    late_us = np.int64(late_days) * 86_400_000_000

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_orderpriority":
                              pd.Series(dtype="object"),
                              "late_p": pd.Series(dtype="int64"),
                              "n_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        ship = j["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        od = j["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        out = pd.DataFrame({"o_orderpriority": j["o_orderpriority"],
                            "late_p": (ship - od
                                       > late_us).astype(np.int64)})
        g = out.groupby("o_orderpriority", as_index=False, sort=False) \
            .agg(late_p=("late_p", "sum"), n_p=("late_p", "size"))
        g["n_p"] = g["n_p"].astype(np.int64)
        return g

    parts = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["l_orderkey", "l_shipdate"],
        right_cols=["o_orderdate", "o_orderpriority"], post=fused,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]))
    out = _driver_combine(parts, ["o_orderpriority"],
                          [("late_p", "sum", "n_late"),
                           ("n_p", "sum", "n_items")]).to_pandas()
    out["late_rate"] = (out["n_late"].to_numpy(np.int64)
                        / out["n_items"].to_numpy(np.int64))
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def monthly_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth — LAG over an AGGREGATED series
    (the windowed-aggregate-of-aggregate shape every trend dashboard
    runs).  The heavy part is the calendar-bounded monthly rollup
    (per-block integer-cents partials, driver-combined, same bound as
    monthly_revenue_trend); the LAG + pct-change run on the ≤ |months|
    result rows.  Growth is ONE float64 division per month on both
    sides; the first month (no prior) is dropped like the SQL's
    NULL-filtering WHERE.

    Returns pandas (month, revenue, growth) sorted by month."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["o_orderdate"], unit="month")
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"month": month, "cents": cents}) \
            .group_by("month").aggregate([("cents", "sum")])
        return g.rename_columns(["month", "cents_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, ["month"],
                          [("cents_p", "sum", "cents")]).to_pandas() \
        .sort_values("month").reset_index(drop=True)
    cents = out["cents"].to_numpy(np.int64)
    out["revenue"] = cents / 100.0
    prev = np.roll(cents, 1)
    out["growth"] = (cents - prev) / prev
    out = out.iloc[1:].reset_index(drop=True)   # first month: no prior
    return out[["month", "revenue", "growth"]]


def customer_rfm(sf_dir: str):
    """RFM feature table (recency / frequency / monetary) — the
    per-entity feature-engineering rollup behind churn/LTV models.
    Two passes, one exchange: a per-block partial pass driver-combines
    the GLOBAL max order date (1 row), then per-customer
    (last date, n_orders, cents) partials co-partition by
    hash(custkey) for exact sums; recency = whole days between the
    customer's last order and the corpus max (integer µs arithmetic),
    monetary stays integer cents, avg_order is ONE float64 division.

    Returns pandas (o_custkey, recency_days, frequency, monetary,
    avg_order) sorted by custkey."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def max_partial(t: pa.Table) -> pa.Table:
        # normalize to µs before integer math (parquet may store ns)
        od = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        return pa.table({"mx": pa.array(
            [pc.max(od).value], pa.int64())})

    mx = _driver_combine(
        ds.map_batches(max_partial, batch_format="pyarrow",
                       batch_size=None),
        [], [("mx", "max", "mx")])
    global_max_us = int(mx["mx"][0].as_py())

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        od = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                     pa.int64())
        g = pa.table({"o_custkey": t["o_custkey"], "od": od,
                      "cents": cents}) \
            .group_by("o_custkey").aggregate([("od", "max"),
                                              ([], "count_all"),
                                              ("cents", "sum")]) \
            .rename_columns(["o_custkey", "last_us", "n_p", "cents_p"])
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(cust.astype(np.int64), nb)))

    def finish(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_custkey", as_index=False, sort=False).agg(
            last_us=("last_us", "max"), frequency=("n_p", "sum"),
            cents=("cents_p", "sum"))
        out = pd.DataFrame({
            "o_custkey": agg["o_custkey"].to_numpy(np.int64),
            "recency_days": ((global_max_us
                              - agg["last_us"].to_numpy(np.int64))
                             // 86_400_000_000),
            "frequency": agg["frequency"].to_numpy(np.int64),
            "monetary": agg["cents"].to_numpy(np.int64) / 100.0,
            "avg_order": (agg["cents"].to_numpy(np.int64) / 100.0
                          / agg["frequency"].to_numpy(np.int64))})
        return arrow_group(out)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(finish, batch_format="pandas")
           .to_pandas())
    return out.sort_values("o_custkey").reset_index(drop=True)


def hourly_event_profile(sf_dir: str):
    """Hour-of-day seasonality per event type — the 24-slot traffic
    profile every ops dashboard draws.  Per-block Arrow hour-extract +
    partial counts; (type × 24) cardinality is enum-bounded, so the
    driver combine applies.  Zero shuffles.

    Returns pandas (event_type, hour, n_events) sorted."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.hour(t["ts"]), pa.int64())
        g = pa.table({"event_type": t["event_type"], "hour": h}) \
            .group_by(["event_type", "hour"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "hour", "n_p"])
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, ["event_type", "hour"],
                          [("n_p", "sum", "n_events")])
    return out.to_pandas().sort_values(["event_type", "hour"]) \
        .reset_index(drop=True)


Q4_LATE_DAYS = 90


def q4_order_priority(sf_dir: str, late_days: int = Q4_LATE_DAYS):
    """TPC-H Q4 shape: COUNT of orders per priority having AT LEAST ONE
    late-shipped line (EXISTS semi-join, not a rate — the companion to
    :func:`late_shipment_rate`).  This corpus has no commit/receipt
    dates, so "late" is l_shipdate > o_orderdate + ``late_days`` (the
    reference's late-commit predicate re-expressed on the columns that
    exist).  ONE shuffle: lineitem⋈orders hash join on orderkey; every
    line of an order lands in one bucket, so the per-order ANY()
    collapse inside the bucket is exact, and the per-priority distinct-
    order partial counts sum without double-counting.  Priority
    cardinality is enum-bounded → driver combine.

    Returns pandas (o_orderpriority, n_orders) sorted by priority."""
    from ..stages.joins import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    late_us = np.int64(late_days) * 86_400_000_000

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_orderpriority":
                              pd.Series(dtype="object"),
                              "n_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        ship = j["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        od = j["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        per = pd.DataFrame({"l_orderkey": j["l_orderkey"],
                            "o_orderpriority": j["o_orderpriority"],
                            "late": ship - od > late_us})
        g = per.groupby("l_orderkey", as_index=False, sort=False) \
            .agg(o_orderpriority=("o_orderpriority", "first"),
                 late=("late", "any"))
        g = g[g["late"]]
        out = g.groupby("o_orderpriority", as_index=False, sort=False) \
            .agg(n_p=("late", "size"))
        out["n_p"] = out["n_p"].astype(np.int64)
        return out

    parts = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["l_orderkey", "l_shipdate"],
        right_cols=["o_orderdate", "o_orderpriority"], post=fused,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]))
    out = _driver_combine(parts, ["o_orderpriority"],
                          [("n_p", "sum", "n_orders")]).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q22_PRICE = 400_000.0


def q22_idle_customers(sf_dir: str, price: float = Q22_PRICE):
    """TPC-H Q22 shape: customers with an ABOVE-average account balance
    and NO high-value order (NOT EXISTS over o_totalprice > ``price``
    — every synthetic customer has SOME order, so the pure no-order
    predicate would be degenerate here), rolled up per nation
    (cntrycode analog) — the global-scalar-then-anti-join composite.
    Pass 1 driver-combines the global positive-balance average (2
    int64 partials per block).  Pass 2 is ONE hash(custkey)-bucketed
    exchange of (filtered customers ∪ block-distinct qualifying order
    custkeys, predicate pushed to the read); the per-bucket NOT-IN is
    exact because both sides of a custkey land in the same bucket.
    Balances stay integer cents end-to-end, so the threshold compare
    and the final sum are associativity-proof; the average itself and
    total_acctbal are each ONE float64 division, mirroring the SQL.

    Returns pandas (c_nationkey, n_cust, total_acctbal) sorted."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(t: pa.Table) -> pa.Table:
        ct = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                     pa.int64())
        pos = pc.filter(ct, pc.greater(ct, 0))
        return pa.table({"s": pa.array([pc.sum(pos).as_py() or 0],
                                       pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    tot = _driver_combine(
        cust.map_batches(avg_partial, batch_format="pyarrow",
                         batch_size=None),
        [], [("s", "sum", "s"), ("n", "sum", "n")])
    av = int(tot["s"][0].as_py()) / int(tot["n"][0].as_py())

    def cust_side(t: pa.Table) -> pa.Table:
        ct = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                     pa.int64())
        t = pa.table({"c_custkey": t["c_custkey"],
                      "c_nationkey": pc.cast(t["c_nationkey"],
                                             pa.int64()),
                      "ct": ct}).filter(pc.greater(ct, av))
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(k.astype(np.int64), nb)))

    def order_side(t: pa.Table) -> pa.Table:
        k = pc.unique(t["o_custkey"])
        out = pa.table({"c_custkey": k,
                        "c_nationkey": pa.nulls(len(k), pa.int64()),
                        "ct": pa.nulls(len(k), pa.int64())})
        return out.add_column(0, "__b", pa.array(int_bucket_of(
            k.to_numpy(zero_copy_only=False).astype(np.int64), nb)))

    left = cust.map_batches(cust_side, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = _read(sf_dir, "orders", columns=["o_custkey"],
                  filter=(pc.field("o_totalprice")
                          > pc.scalar(price))) \
        .map_batches(order_side, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)

    def bucket_anti(g: pd.DataFrame) -> pa.Table:
        have = g.loc[g["c_nationkey"].isna(), "c_custkey"].unique()
        c = g[g["c_nationkey"].notna()
              & ~g["c_custkey"].isin(have)]
        out = c.groupby("c_nationkey", as_index=False, sort=False) \
            .agg(n_p=("c_custkey", "size"), cents_p=("ct", "sum"))
        return arrow_group(pd.DataFrame({
            "c_nationkey": out["c_nationkey"].to_numpy(np.int64),
            "n_p": out["n_p"].to_numpy(np.int64),
            "cents_p": out["cents_p"].to_numpy(np.int64)}))

    parts = (left.union(right)
             .groupby("__b").map_groups(bucket_anti,
                                        batch_format="pandas"))
    out = _driver_combine(parts, ["c_nationkey"],
                          [("n_p", "sum", "n_cust"),
                           ("cents_p", "sum", "cents")]).to_pandas()
    out["total_acctbal"] = out["cents"].to_numpy(np.int64) / 100.0
    return out[["c_nationkey", "n_cust", "total_acctbal"]] \
        .sort_values("c_nationkey").reset_index(drop=True)


WEEK_US = np.int64(7) * 86_400_000_000


def cohort_retention(sf_dir: str):
    """Weekly cohort-retention matrix over the events table — the
    growth-analytics triangle (cohort week = week of a user's FIRST
    event; n_users active at each week offset).  Per-block dedup of
    (user, week) pairs (combiner), ONE hash(user)-bucketed exchange;
    a user's every week lands in one bucket, so the per-user MIN and
    the (cohort, offset, user) distinct are globally exact.  Partial
    counts per (cohort, offset) are calendar-bounded → driver combine.
    Weeks are Monday-floored in integer µs, matching DuckDB's
    date_trunc('week').

    Returns pandas (cohort_week, week_offset, n_users) sorted."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def block_dedup(t: pa.Table) -> pa.Table:
        wk = pc.cast(pc.floor_temporal(pc.cast(t["ts"],
                                               pa.timestamp("us")),
                                       unit="week"), pa.int64())
        g = pa.table({"user_id": t["user_id"], "wk": wk}) \
            .group_by(["user_id", "wk"]) \
            .aggregate([([], "count_all")]).drop_columns(["count_all"])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def bucket_retention(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["user_id", "wk"])
        cohort = d.groupby("user_id", sort=False)["wk"].transform("min")
        off = (d["wk"].to_numpy(np.int64)
               - cohort.to_numpy(np.int64)) // WEEK_US
        out = pd.DataFrame({"cohort_us": cohort.to_numpy(np.int64),
                            "week_offset": off}) \
            .groupby(["cohort_us", "week_offset"], as_index=False,
                     sort=False).size().rename(columns={"size": "n_p"})
        return arrow_group(pd.DataFrame({
            "cohort_us": out["cohort_us"].to_numpy(np.int64),
            "week_offset": out["week_offset"].to_numpy(np.int64),
            "n_p": out["n_p"].to_numpy(np.int64)}))

    parts = (ds.map_batches(block_dedup, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("__b").map_groups(bucket_retention,
                                        batch_format="pandas"))
    out = _driver_combine(parts, ["cohort_us", "week_offset"],
                          [("n_p", "sum", "n_users")]).to_pandas()
    out["cohort_week"] = out["cohort_us"].to_numpy(np.int64) \
        .astype("datetime64[us]")
    return out[["cohort_week", "week_offset", "n_users"]] \
        .sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)


COPURCHASE_K = 100


def copurchase_pairs(sf_dir: str, k: int = COPURCHASE_K):
    """Market-basket co-occurrence: the top-k part pairs appearing in
    the same order — the self-join-explode every recommender feature
    pipeline runs.  TWO bounded exchanges: (1) block-distinct
    (order, part) pairs bucket by hash(orderkey); the per-bucket
    self-merge (p1 < p2) is exact and per-order-bounded (orders have
    few lines, so the explode is ~|lines|² per ORDER, never per
    corpus); (2) pair partials bucket by hash(p1<<32|p2) so each
    pair's count lands whole in one bucket, which keeps its LOCAL
    top-k; the driver merges ≤ buckets × k rows.  Ties break
    deterministically on (count desc, p1, p2), mirroring the SQL
    ORDER BY ... LIMIT.

    Returns pandas (part_a, part_b, n_orders), the global top-k."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def block_dedup(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_partkey"]) \
            .aggregate([([], "count_all")]).drop_columns(["count_all"])
        o = g["l_orderkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(o.astype(np.int64), nb)))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])[
            ["l_orderkey", "l_partkey"]]
        j = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        j = j[j["l_partkey_a"] < j["l_partkey_b"]]
        out = j.groupby(["l_partkey_a", "l_partkey_b"],
                        as_index=False, sort=False) \
            .size().rename(columns={"size": "n_p"})
        pa_ = out["l_partkey_a"].to_numpy(np.int64)
        pb_ = out["l_partkey_b"].to_numpy(np.int64)
        return arrow_group(pd.DataFrame({
            "__b2": int_bucket_of((pa_ << np.int64(32)) | pb_, nb),
            "part_a": pa_, "part_b": pb_,
            "n_p": out["n_p"].to_numpy(np.int64)}))

    def bucket_topk(g: pd.DataFrame) -> pa.Table:
        c = g.groupby(["part_a", "part_b"], as_index=False,
                      sort=False).agg(n_orders=("n_p", "sum"))
        c = c.sort_values(["n_orders", "part_a", "part_b"],
                          ascending=[False, True, True]).head(k)
        return arrow_group(pd.DataFrame({
            "part_a": c["part_a"].to_numpy(np.int64),
            "part_b": c["part_b"].to_numpy(np.int64),
            "n_orders": c["n_orders"].to_numpy(np.int64)}))

    out = (ds.map_batches(block_dedup, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(bucket_pairs,
                                      batch_format="pandas")
           .groupby("__b2").map_groups(bucket_topk,
                                       batch_format="pandas")
           .to_pandas())
    return out.sort_values(["n_orders", "part_a", "part_b"],
                           ascending=[False, True, True]).head(k) \
        .reset_index(drop=True)


NTILE_K = 10


def _ntile(ranks: np.ndarray, n: int, k: int) -> np.ndarray:
    """Vectorized SQL NTILE(k) for 1-indexed global ``ranks`` out of
    ``n`` rows: the first n%k tiles get one extra row, matching the
    standard (and DuckDB's) remainder-to-leading-tiles rule."""
    q, rem = divmod(n, k)
    head = rem * (q + 1)
    safe_q = max(q, 1)                  # n < k: the else-branch is dead
    return np.where(ranks <= head,
                    (ranks - 1) // (q + 1) + 1,
                    rem + (ranks - head - 1) // safe_q + 1) \
        .astype(np.int64)


def revenue_deciles(sf_dir: str, k: int = NTILE_K):
    """Global NTILE over per-customer revenue — the decile segmentation
    every LTV report runs, built WITHOUT a single-process rank: exact
    per-customer cents (one hash(custkey) exchange), a DISTRIBUTED sort
    on (cents desc, custkey), then the global rank comes from
    :func:`~vframe_ray.stages.scan.global_prefix_scan` over a ones
    column (rank = inclusive running count; the row total rides along
    free as the scan's grand total).  The NTILE bucketing and the
    per-decile partials are then block-local; ≤ blocks × k partial
    rows driver-combine.

    Returns pandas (decile, n_cust, total_revenue) sorted by decile."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from ..stages.scan import global_prefix_scan
    nb = num_hash_buckets(None)

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"o_custkey": t["o_custkey"], "cents": cents}) \
            .group_by("o_custkey").aggregate([("cents", "sum")]) \
            .rename_columns(["o_custkey", "cents"])
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(cust.astype(np.int64), nb)))

    def exact(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_custkey", as_index=False, sort=False)[
            "cents"].sum()
        out = arrow_group(agg)
        return out.append_column("one", pa.array(
            np.ones(len(agg), dtype=np.int64)))

    totals_ds = (orders.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .groupby("__b").map_groups(exact,
                                            batch_format="pandas"))
    ranked = totals_ds.sort(["cents", "o_custkey"],
                            descending=[True, False])
    scanned, grand = global_prefix_scan(ranked, ["one"])
    n = int(grand[0])

    def tile_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"decile": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64()),
                             "cents_p": pa.array([], pa.int64())})
        rank = t["cum_one"].to_numpy(zero_copy_only=False)
        dec = _ntile(rank, n, k)
        g = pa.table({"decile": pa.array(dec),
                      "cents": t["cents"]}) \
            .group_by("decile").aggregate([([], "count_all"),
                                           ("cents", "sum")])
        return g.rename_columns(["decile", "n_p", "cents_p"])

    parts = scanned.map_batches(tile_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = _driver_combine(parts, ["decile"],
                          [("n_p", "sum", "n_cust"),
                           ("cents_p", "sum", "cents")]).to_pandas()
    out["total_revenue"] = out["cents"].to_numpy(np.int64) / 100.0
    return out[["decile", "n_cust", "total_revenue"]] \
        .sort_values("decile").reset_index(drop=True)


BIG_ORDER_PRICE = 300_000.0


def customer_order_profile(sf_dir: str, price: float = BIG_ORDER_PRICE):
    """LEFT OUTER join with zero-fill: every customer's count and total
    of HIGH-value orders, customers with none kept at (0, 0.0) — the
    outer-join semantics the engine's inner hash/broadcast joins don't
    exercise.  ONE hash(custkey)-bucketed exchange of (customer keys ∪
    per-block order partials, predicate pushed to the read); the
    per-bucket aggregate-then-fill is exact because both sides of a
    custkey co-locate.  Cents stay integer until one final division.

    Returns pandas (c_custkey, n_big, big_total) sorted by custkey."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    def cust_side(t: pa.Table) -> pa.Table:
        k_ = t["c_custkey"].to_numpy(zero_copy_only=False)
        out = pa.table({"c_custkey": t["c_custkey"],
                        "n_p": pa.nulls(len(k_), pa.int64()),
                        "cents_p": pa.nulls(len(k_), pa.int64())})
        return out.add_column(0, "__b", pa.array(
            int_bucket_of(k_.astype(np.int64), nb)))

    def order_side(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"c_custkey": t["o_custkey"], "cents": cents}) \
            .group_by("c_custkey").aggregate([([], "count_all"),
                                              ("cents", "sum")]) \
            .rename_columns(["c_custkey", "n_p", "cents_p"])
        k_ = g["c_custkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(k_.astype(np.int64), nb)))

    left = _read(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(cust_side, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
    right = _read(sf_dir, "orders",
                  columns=["o_custkey", "o_totalprice"],
                  filter=(pc.field("o_totalprice")
                          > pc.scalar(price))) \
        .map_batches(order_side, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)

    def bucket_fill(g: pd.DataFrame) -> pa.Table:
        keys = g.loc[g["n_p"].isna(), "c_custkey"]
        agg = g[g["n_p"].notna()] \
            .groupby("c_custkey", as_index=False, sort=False) \
            .agg(n_big=("n_p", "sum"), cents=("cents_p", "sum"))
        out = pd.DataFrame({"c_custkey": keys.to_numpy(np.int64)}) \
            .merge(agg, on="c_custkey", how="left")
        return arrow_group(pd.DataFrame({
            "c_custkey": out["c_custkey"].to_numpy(np.int64),
            "n_big": out["n_big"].fillna(0).to_numpy(np.int64),
            "big_total": out["cents"].fillna(0).to_numpy(np.int64)
            / 100.0}))

    out = (left.union(right)
           .groupby("__b").map_groups(bucket_fill,
                                      batch_format="pandas")
           .to_pandas())
    return out.sort_values("c_custkey").reset_index(drop=True)


def first_last_order_price(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over the full partition frame: each
    customer's first and last order price in (o_orderdate, o_orderkey)
    order.  Per-block combiner keeps ≤2 rows per customer (the block's
    own boundary rows — a lexsort + two boundary masks), ONE
    hash(custkey) exchange, the same kernel per bucket.  Prices pass
    through untouched (no float arithmetic → bit-exact vs SQL).

    Returns pandas (o_custkey, first_price, last_price) by custkey."""
    from ..runtime import int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate",
                        "o_totalprice"])

    def _boundaries(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, od, cust))
        cs = cust[order]
        first = np.r_[True, cs[1:] != cs[:-1]]
        last = np.r_[cs[1:] != cs[:-1], True]
        keep = np.sort(order[first | last])
        return t.take(pa.array(keep))

    def block_bound(t: pa.Table) -> pa.Table:
        t = _boundaries(t)
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(cust.astype(np.int64), nb)))

    def bucket_final(g: pa.Table) -> pa.Table:
        t = _boundaries(g.drop_columns(["__b"]))
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, od, cust))
        cs, ps = cust[order], price[order]
        first = np.r_[True, cs[1:] != cs[:-1]]
        last = np.r_[cs[1:] != cs[:-1], True]
        return pa.table({
            "o_custkey": pa.array(cs[first].astype(np.int64)),
            "first_price": pa.array(ps[first]),
            "last_price": pa.array(ps[last])})

    out = (ds.map_batches(block_bound, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(bucket_final,
                                      batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("o_custkey").reset_index(drop=True)


def monthly_activity_overview(sf_dir: str):
    """FULL OUTER calendar join: monthly order revenue ⋈ monthly event
    counts with zero-fill on BOTH sides — the cross-fact-table overview
    report (this corpus's order months and event months are disjoint,
    so every row exercises one NULL side).  Each fact table reduces to
    calendar-bounded per-block partials (driver-combined); the outer
    merge itself runs on ≤ |months| rows.  Cents stay integer until
    the final division.

    Returns pandas (month, revenue, n_events) sorted by month."""
    orders = _read(sf_dir, "orders",
                   columns=["o_orderdate", "o_totalprice"])
    events = _read(sf_dir, "events", columns=["ts"])

    def o_partial(t: pa.Table) -> pa.Table:
        m = pc.cast(pc.floor_temporal(pc.cast(t["o_orderdate"],
                                              pa.timestamp("us")),
                                      unit="month"), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"m": m, "cents": cents}) \
            .group_by("m").aggregate([("cents", "sum")])
        return g.rename_columns(["m", "cents_p"])

    def e_partial(t: pa.Table) -> pa.Table:
        m = pc.cast(pc.floor_temporal(pc.cast(t["ts"],
                                              pa.timestamp("us")),
                                      unit="month"), pa.int64())
        g = pa.table({"m": m}).group_by("m") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["m", "n_p"])

    o = _driver_combine(
        orders.map_batches(o_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True),
        ["m"], [("cents_p", "sum", "cents")]).to_pandas()
    e = _driver_combine(
        events.map_batches(e_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True),
        ["m"], [("n_p", "sum", "n_events")]).to_pandas()
    j = o.merge(e, on="m", how="outer")
    out = pd.DataFrame({
        "month": j["m"].to_numpy(np.int64).astype("datetime64[us]"),
        "revenue": j["cents"].fillna(0).to_numpy(np.int64) / 100.0,
        "n_events": j["n_events"].fillna(0).to_numpy(np.int64)})
    return out.sort_values("month").reset_index(drop=True)


Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_DISC_LO = 4      # discount percent band, inclusive
Q6_DISC_HI = 6
Q6_QTY = 24.0


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: the SCALAR filtered aggregate — revenue delta
    from candidate discounts (sum of extprice × discount over a date
    window, discount band, quantity cap).  Zero shuffles: predicate
    pushed to the read, one integer partial per block (cents ×
    discount-percent stays int64), driver-combined to ONE row; the
    division to dollars happens once.

    Returns pandas (revenue, n_items) — a single row."""
    lo = pd.Timestamp(Q6_DATE_LO)
    hi = pd.Timestamp(Q6_DATE_HI)
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_discount", "l_quantity"],
               filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                       & (pc.field("l_shipdate") < pc.scalar(hi))
                       & (pc.field("l_quantity") < pc.scalar(Q6_QTY))))

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                       pa.int64())
        keep = pc.and_(pc.greater_equal(disc, Q6_DISC_LO),
                       pc.less_equal(disc, Q6_DISC_HI))
        t2 = pa.table({
            "cents": pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                                  100.0)), pa.int64()),
            "disc": disc}).filter(keep)
        rev = pc.sum(pc.multiply(t2["cents"], t2["disc"])).as_py() or 0
        return pa.table({"rev_p": pa.array([int(rev)], pa.int64()),
                         "n_p": pa.array([t2.num_rows], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    out = _driver_combine(parts, [], [("rev_p", "sum", "rev"),
                                      ("n_p", "sum", "n_items")])
    return pd.DataFrame({
        "revenue": [int(out["rev"][0].as_py()) / 10_000.0],
        "n_items": [int(out["n_items"][0].as_py())]})


Q14_DATE_LO = "1996-03-01"
Q14_DATE_HI = "1996-04-01"


def q14_promo_revenue(sf_dir: str, date_lo: str = Q14_DATE_LO,
                      date_hi: str = Q14_DATE_HI):
    """TPC-H Q14 shape: promo-revenue share — 100 × promo revenue /
    total revenue over one ship month.  Physical plan mirrors
    :func:`brand_revenue`'s dual path: under the broadcast threshold
    the PROMO partkey set ships once via ``ray.put`` (sorted array +
    searchsorted membership per block; the scan itself is
    zero-shuffle, two int64 partials per block), above it the partkey
    hash join carries an is-promo byte with the partials fused into
    the join buckets.  The percentage is ONE float64 expression on
    both engine and oracle sides.  Assumes TPC-H referential
    integrity (every l_partkey exists in part) — under it the
    broadcast path's total (all window lineitems) and the inner-join
    path's total coincide; the pytest forces both paths.

    Returns pandas (promo_revenue, total_revenue, promo_share) — a
    single row."""
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"],
               filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                       & (pc.field("l_shipdate") < pc.scalar(hi))))

    def _rev(pe: np.ndarray, di: np.ndarray) -> np.ndarray:
        return (np.round(pe * 100.0).astype(np.int64)
                * (100 - np.round(di * 100.0).astype(np.int64)))

    if _dim_broadcast_ok(sf_dir, "part"):
        prt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey"],
            filters=[("p_type", "==", "PROMO")])
        promo_ref = ray.put(np.sort(prt["p_partkey"].to_numpy()))

        def partial(t: pa.Table) -> pa.Table:
            promo = ray.get(promo_ref)
            x = t["l_partkey"].to_numpy(zero_copy_only=False)
            rev = _rev(t["l_extendedprice"].to_numpy(
                zero_copy_only=False),
                t["l_discount"].to_numpy(zero_copy_only=False))
            if len(promo):
                pos = np.minimum(np.searchsorted(promo, x),
                                 len(promo) - 1)
                is_promo = promo[pos] == x
            else:
                is_promo = np.zeros(len(x), dtype=bool)
            return pa.table({
                "promo_p": pa.array([int(rev[is_promo].sum())],
                                    pa.int64()),
                "total_p": pa.array([int(rev.sum())], pa.int64())})

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    else:
        prt_ds = _read(sf_dir, "part",
                       columns=["p_partkey", "p_type"]) \
            .rename_columns({"p_partkey": "l_partkey"})

        def fused(j: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"promo_p": pd.Series(dtype="int64"),
                                  "total_p": pd.Series(dtype="int64")})
            if not len(j):
                return empty
            rev = _rev(j["l_extendedprice"].to_numpy(),
                       j["l_discount"].to_numpy())
            is_promo = j["p_type"].to_numpy() == "PROMO"
            return pd.DataFrame({
                "promo_p": [int(rev[is_promo].sum())],
                "total_p": [int(rev.sum())]})

        parts = hash_join(
            li, prt_ds, key="l_partkey",
            left_cols=["l_partkey", "l_extendedprice", "l_discount"],
            right_cols=["p_type"], post=fused,
            left_schema=pa.schema([("l_partkey", pa.int64()),
                                   ("l_extendedprice", pa.float64()),
                                   ("l_discount", pa.float64())]),
            right_schema=pa.schema([("l_partkey", pa.int64()),
                                    ("p_type", pa.string())]))
    out = _driver_combine(parts, [], [("promo_p", "sum", "promo"),
                                      ("total_p", "sum", "total")])
    promo = int(out["promo"][0].as_py())
    total = int(out["total"][0].as_py())
    return pd.DataFrame({
        "promo_revenue": [promo / 10_000.0],
        "total_revenue": [total / 10_000.0],
        "promo_share": [100.0 * promo / total]})


Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str, date_lo: str = Q15_DATE_LO,
                     date_hi: str = Q15_DATE_HI):
    """TPC-H Q15 shape: the supplier(s) with MAXIMUM revenue in a ship
    quarter — the argmax-with-ties composite (aggregate → global max →
    equality filter → dimension join).  Supplier cardinality is
    catalog-bounded, so per-block (suppkey, cents) partials
    driver-combine exactly (the q1 bound); the max and the tie filter
    run on that small frame, and names resolve from the supplier
    table read once.  Revenue stays integer 1e-4 dollars until one
    final division — exact ties survive, no float drift can split or
    merge them.

    Returns pandas (s_suppkey, s_name, total_revenue) sorted by
    suppkey — more than one row iff the max is tied."""
    import pyarrow.parquet as pq

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"],
               filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                       & (pc.field("l_shipdate") < pc.scalar(hi))))

    def partial(t: pa.Table) -> pa.Table:
        pe = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                     pa.int64())
        di = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                     pa.int64())
        rev = pc.multiply(pe, pc.subtract(pa.scalar(100, pa.int64()),
                                          di))
        g = pa.table({"l_suppkey": t["l_suppkey"], "rev": rev}) \
            .group_by("l_suppkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_suppkey", "rev_p"])

    parts = li.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    rev = _driver_combine(parts, ["l_suppkey"],
                          [("rev_p", "sum", "rev")]).to_pandas()
    if rev.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "total_revenue":
                             pd.Series([], dtype="float64")})
    top = rev[rev["rev"].to_numpy(np.int64)
              == int(rev["rev"].max())]
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  top["l_suppkey"].tolist())]).to_pandas()
    out = sup.merge(top.rename(columns={"l_suppkey": "s_suppkey"}),
                    on="s_suppkey")
    out["total_revenue"] = out["rev"].to_numpy(np.int64) / 10_000.0
    return out[["s_suppkey", "s_name", "total_revenue"]] \
        .sort_values("s_suppkey").reset_index(drop=True)

Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q13_customer_distribution(sf_dir: str,
                              excluded: str = Q13_EXCLUDED_PRIORITY):
    """TPC-H Q13 shape: the distribution of customers by how many
    orders they placed (excluding one priority class — the analog of
    Q13's comment NOT-LIKE filter on the columns this corpus has),
    INCLUDING zero-order customers — the LEFT-join-then-histogram
    composite.  ONE hash(custkey)-bucketed exchange of (customer keys
    ∪ per-block order-count partials, predicate pushed to the read);
    per-bucket count-per-customer is exact because a custkey's rows
    co-locate, and each bucket collapses to a ≤ max-orders-per-customer
    histogram partial before the driver combine — the final reduce is
    O(buckets × distinct counts), never O(customers).

    Returns pandas (c_count, custdist) sorted (custdist desc, c_count
    desc)."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    def cust_side(t: pa.Table) -> pa.Table:
        k_ = t["c_custkey"].to_numpy(zero_copy_only=False)
        out = pa.table({"c_custkey": t["c_custkey"],
                        "n_p": pa.nulls(len(k_), pa.int64())})
        return out.add_column(0, "__b", pa.array(
            int_bucket_of(k_.astype(np.int64), nb)))

    def order_side(t: pa.Table) -> pa.Table:
        g = pa.table({"c_custkey": t["o_custkey"]}) \
            .group_by("c_custkey").aggregate([([], "count_all")]) \
            .rename_columns(["c_custkey", "n_p"])
        k_ = g["c_custkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(k_.astype(np.int64), nb)))

    left = _read(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(cust_side, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
    right = _read(sf_dir, "orders", columns=["o_custkey"],
                  filter=(pc.field("o_orderpriority")
                          != pc.scalar(excluded))) \
        .map_batches(order_side, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)

    def bucket_hist(g: pd.DataFrame) -> pa.Table:
        keys = g.loc[g["n_p"].isna(), "c_custkey"]
        agg = g[g["n_p"].notna()] \
            .groupby("c_custkey", as_index=False, sort=False) \
            .agg(n=("n_p", "sum"))
        per = pd.DataFrame({"c_custkey": keys.to_numpy(np.int64)}) \
            .merge(agg, on="c_custkey", how="left")
        cnt = per["n"].fillna(0).to_numpy(np.int64)
        vals, freq = np.unique(cnt, return_counts=True)
        return arrow_group(pd.DataFrame({
            "c_count": vals, "custdist_p": freq.astype(np.int64)}))

    parts = left.union(right).groupby("__b") \
        .map_groups(bucket_hist, batch_format="pandas")
    out = _driver_combine(parts, ["c_count"],
                          [("custdist_p", "sum", "custdist")]).to_pandas()
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)


Q17_BRAND = "Brand#11"


def q17_small_quantity_revenue(sf_dir: str, brand: str = Q17_BRAND):
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average order quantity) were no
    longer filled, for one brand's parts — the filter-by-per-group-
    average composite (the threshold is computed over the SAME rows it
    filters).  Plan: the brand's partkeys broadcast as one sorted
    membership array (part is a catalog, the Q15 supplier bound; the
    DIM_BROADCAST_MAX_ROWS hash-join hatch applies if parts ever grow
    with the corpus), lineitem prunes + projects to (partkey, qty,
    cents) at the scan, then ONE hash(partkey)-bucketed exchange —
    every line of a part co-locates, so the per-part (count, qty-sum)
    and the threshold filter are exact in-bucket.  The 0.2·avg compare
    runs in INTEGERS (qty < sum/(5·n) ⟺ 5·n·qty < sum for integral
    quantities), so no float threshold can drift a boundary row; cents
    stay integral until the single final division chain.

    Returns a 1-row pandas frame (avg_yearly)."""
    import pyarrow.parquet as pq
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    keys = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey"],
                         filters=[("p_brand", "==", brand)])["p_partkey"] \
        .to_numpy()
    member_ref = ray.put(np.sort(keys.astype(np.int64)))

    def prune(t: pa.Table) -> pa.Table:
        member = ray.get(member_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(member, pk)
        pos[pos >= len(member)] = max(len(member) - 1, 0)
        keep = len(member) > 0 and member[pos] == pk
        if not len(member):
            keep = np.zeros(len(pk), dtype=bool)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)[keep] \
            .astype(np.int64)
        cents = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        out = pa.table({"l_partkey": pk[keep], "q": q, "cents": cents})
        return out.add_column(0, "__b", pa.array(
            int_bucket_of(pk[keep], nb)))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_small(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({"cents_p": pa.array([], pa.int64()),
                             "n_small_p": pa.array([], pa.int64())})
        st = g.groupby("l_partkey", sort=False).agg(
            n=("q", "size"), sq=("q", "sum"))
        n = st["n"].reindex(g["l_partkey"]).to_numpy(np.int64)
        sq = st["sq"].reindex(g["l_partkey"]).to_numpy(np.int64)
        small = 5 * g["q"].to_numpy(np.int64) * n < sq
        return pa.table({
            "cents_p": pa.array([int(g["cents"].to_numpy(
                np.int64)[small].sum())], pa.int64()),
            "n_small_p": pa.array([int(small.sum())], pa.int64())})

    parts = li.groupby("__b").map_groups(bucket_small,
                                         batch_format="pandas")
    # safe scalar combine: a brand with no surviving lineitems leaves
    # ZERO partial blocks (unlike the always-1-row q22 partials), which
    # _driver_combine can't concat — that case is SQL's NULL sum
    from ..runtime import block_refs as _block_refs
    tables = [t for t in ray.get(_block_refs(parts)) if t.num_rows]
    n = sum(int(pc.sum(t["n_small_p"]).as_py() or 0) for t in tables)
    cents = sum(int(pc.sum(t["cents_p"]).as_py() or 0) for t in tables)
    avg = (cents / 100.0) / 7.0 if n else np.nan
    return pd.DataFrame({"avg_yearly": pd.Series([avg],
                                                 dtype="float64")})


Q21_K = 10


def q21_waiting_suppliers(sf_dir: str, late_days: int = Q4_LATE_DAYS,
                          k: int = Q21_K):
    """TPC-H Q21 shape (suppliers who kept orders waiting): for 'F'
    orders with ≥ 2 distinct suppliers where EXACTLY ONE supplier
    shipped late (l_shipdate > o_orderdate + ``late_days`` — this
    corpus has no commit/receipt dates), count the orders blamed on
    each supplier — the EXISTS + NOT-EXISTS double-correlated
    composite.  ONE shuffle: lineitem⋈orders hash join on orderkey
    with the blame decision fused into the bucket (every line of an
    order co-locates, so the distinct-supplier and sole-late-supplier
    sets are exact in-bucket); partials are ≤ |suppliers| rows per
    bucket — catalog-bounded, the Q15 driver-combine rule — and names
    resolve via one pushdown read of only the candidate suppliers.

    Returns pandas (s_name, numwait) top-k by (numwait desc, name)."""
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"],
                   filter=(pc.field("o_orderstatus")
                           == pc.scalar("F"))) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    late_us = np.int64(late_days) * 86_400_000_000

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"l_suppkey": pd.Series(dtype="int64"),
                              "n_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        ship = j["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        od = j["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        per = pd.DataFrame({"l_orderkey": j["l_orderkey"],
                            "l_suppkey": j["l_suppkey"],
                            "late": ship - od > late_us})
        ns = per.drop_duplicates(["l_orderkey", "l_suppkey"]) \
            .groupby("l_orderkey", sort=False)["l_suppkey"].size()
        lt = per[per["late"]].drop_duplicates(
            ["l_orderkey", "l_suppkey"])
        nl = lt.groupby("l_orderkey", sort=False)["l_suppkey"] \
            .agg(["size", "first"])
        blame = nl[(nl["size"] == 1)
                   & (ns.reindex(nl.index).to_numpy() >= 2)]["first"]
        if not len(blame):
            return empty
        out = blame.value_counts().rename_axis("l_suppkey") \
            .reset_index(name="n_p")
        out["l_suppkey"] = out["l_suppkey"].astype(np.int64)
        out["n_p"] = out["n_p"].astype(np.int64)
        return out

    parts = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["l_orderkey", "l_suppkey", "l_shipdate"],
        right_cols=["o_orderdate"], post=fused,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
        # 'F' orders are ~1/3 of orderkeys: the Bloom pass drops ~2/3
        # of lineitem before the exchange
        runtime_filter=True)
    agg = _driver_combine(parts, ["l_suppkey"],
                          [("n_p", "sum", "numwait")]).to_pandas()
    if agg.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype="object"),
                             "numwait": pd.Series([], dtype="int64")})
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  agg["l_suppkey"].tolist())]).to_pandas()
    out = sup.merge(agg.rename(columns={"l_suppkey": "s_suppkey"}),
                    on="s_suppkey")
    out["numwait"] = out["numwait"].astype(np.int64)
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]).head(k)[
        ["s_name", "numwait"]].reset_index(drop=True)


Q8_TYPE = "PROMO"
Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q8_market_share(sf_dir: str, p_type: str = Q8_TYPE,
                    region: str = Q8_REGION, nation: str = Q8_NATION,
                    date_lo: str = Q8_DATE_LO,
                    date_hi: str = Q8_DATE_HI):
    """TPC-H Q8 shape (national market share): of the revenue from one
    part TYPE sold to customers in one REGION per order year, the
    share supplied by one NATION — the conditional-share composite
    (CASE-sum over a multi-dimension join).  Physical plan: part
    membership and supplier→is-target-nation broadcast as sorted
    catalog lookups (the Q7/Q15 bound), lineitem prunes + projects to
    (orderkey, exact-integer revenue, target flag) BEFORE the one
    big-big exchange (hash join to date-filtered orders on orderkey).
    Customer nation resolves like Q5/Q7: broadcast custkey→nationkey
    under ``DIM_BROADCAST_MAX_ROWS``, else a second hash join on
    custkey with the region filter inside its buckets.  Partials are
    ≤ |years| rows per bucket; the share is ONE float64 division of
    two exactly-summed int64 revenues, mirroring the SQL.

    Returns pandas (o_year, mkt_share) sorted by year."""
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkey = {n: int(k) for k, n in zip(
        reg["r_regionkey"].to_numpy(),
        reg["r_name"].to_numpy(zero_copy_only=False))}[region]
    region_nations = set(
        nat.filter(pc.equal(nat["n_regionkey"], rkey))["n_nationkey"]
        .to_numpy().tolist())
    target_key = {n: int(k) for k, n in zip(
        nat["n_nationkey"].to_numpy(),
        nat["n_name"].to_numpy(zero_copy_only=False))}[nation]

    pk = np.sort(pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"],
        filters=[("p_type", "==", p_type)])["p_partkey"]
        .to_numpy().astype(np.int64))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    s_k = sup["s_suppkey"].to_numpy()
    s_ord = np.argsort(s_k, kind="stable")
    broadcast_cust = _dim_broadcast_ok(sf_dir, "customer")
    if broadcast_cust:
        cus = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_nationkey"])
    else:
        cus = pa.table({"c_custkey": pa.array([], pa.int64()),
                        "c_nationkey": pa.array([], pa.int64())})
    c_k = cus["c_custkey"].to_numpy()
    c_ord = np.argsort(c_k, kind="stable")
    lookup_ref = ray.put((pk, s_k[s_ord],
                          sup["s_nationkey"].to_numpy()[s_ord]
                          .astype(np.int64),
                          c_k[c_ord],
                          cus["c_nationkey"].to_numpy()[c_ord]
                          .astype(np.int64)))

    def _member(sorted_keys, x):
        if not len(sorted_keys):
            return np.zeros(len(x), dtype=bool)
        pos = np.minimum(np.searchsorted(sorted_keys, x),
                         len(sorted_keys) - 1)
        return sorted_keys[pos] == x

    def _sorted_lookup(keys_sorted, vals, x):
        pos = np.minimum(np.searchsorted(keys_sorted, x),
                         max(len(keys_sorted) - 1, 0))
        ok = keys_sorted[pos] == x if len(keys_sorted) \
            else np.zeros(len(x), dtype=bool)
        return vals[pos] if len(keys_sorted) else \
            np.zeros(len(x), np.int64), ok

    def prune(t: pa.Table) -> pa.Table:
        pk_, sk, sn, _, _ = ray.get(lookup_ref)
        part_keys = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = _member(pk_, part_keys)
        supp = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        s_nat, ok = _sorted_lookup(sk, sn, supp)
        pe = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        di = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"].to_numpy(
                zero_copy_only=False)[keep],
            "rev_p": pe * (100 - di),
            "is_target": (ok & (s_nat == target_key))
            .astype(np.int8)})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]) \
        .map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pc.field("o_orderdate")
                            >= pc.scalar(pd.Timestamp(date_lo)))
                           & (pc.field("o_orderdate")
                              < pc.scalar(pd.Timestamp(date_hi))))) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    li_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("rev_p", pa.int64()),
                           ("is_target", pa.int8())])
    o_schema = pa.schema([("l_orderkey", pa.int64()),
                          ("o_custkey", pa.int64()),
                          ("o_orderdate", pa.timestamp("us"))])

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                              "rev_t_p": pd.Series(dtype="int64"),
                              "rev_a_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        _, _, _, ck, cn = ray.get(lookup_ref)
        c_nat, ok = _sorted_lookup(ck, cn, j["o_custkey"].to_numpy())
        keep = ok & np.isin(c_nat, list(region_nations))
        if not keep.any():
            return empty
        year = j["o_orderdate"].to_numpy().astype(
            "datetime64[us]")[keep].astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        rev = j["rev_p"].to_numpy(np.int64)[keep]
        tgt = j["is_target"].to_numpy(np.int8)[keep].astype(bool)
        return pd.DataFrame({"o_year": year,
                             "rev_t_p": np.where(tgt, rev, 0),
                             "rev_a_p": rev}).groupby(
            "o_year", as_index=False, sort=False).sum()

    def fused_by_cust(j: pd.DataFrame) -> pd.DataFrame:
        # big-big path: partial revenue keyed by (custkey, year);
        # region resolves in the second custkey join
        empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                              "o_year": pd.Series(dtype="int64"),
                              "rev_t_p": pd.Series(dtype="int64"),
                              "rev_a_p": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        year = j["o_orderdate"].to_numpy().astype(
            "datetime64[us]").astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        rev = j["rev_p"].to_numpy(np.int64)
        tgt = j["is_target"].to_numpy(np.int8).astype(bool)
        return pd.DataFrame({"o_custkey": j["o_custkey"],
                             "o_year": year,
                             "rev_t_p": np.where(tgt, rev, 0),
                             "rev_a_p": rev}).groupby(
            ["o_custkey", "o_year"], as_index=False, sort=False).sum()

    if broadcast_cust:
        parts = hash_join(li, orders, key="l_orderkey",
                          left_cols=["l_orderkey", "rev_p", "is_target"],
                          right_cols=["o_custkey", "o_orderdate"],
                          post=fused, left_schema=li_schema,
                          right_schema=o_schema)
    else:
        per_cust = hash_join(li, orders, key="l_orderkey",
                             left_cols=["l_orderkey", "rev_p",
                                        "is_target"],
                             right_cols=["o_custkey", "o_orderdate"],
                             post=fused_by_cust, left_schema=li_schema,
                             right_schema=o_schema)
        cust = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"]) \
            .rename_columns({"c_custkey": "o_custkey"})

        def region_fuse(j: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                                  "rev_t_p": pd.Series(dtype="int64"),
                                  "rev_a_p": pd.Series(dtype="int64")})
            if not len(j):
                return empty
            keep = j["c_nationkey"].to_numpy(np.int64)
            keep = np.isin(keep, list(region_nations))
            if not keep.any():
                return empty
            return j.loc[keep, ["o_year", "rev_t_p", "rev_a_p"]] \
                .groupby("o_year", as_index=False, sort=False).sum()

        parts = hash_join(
            per_cust, cust, key="o_custkey",
            left_cols=["o_custkey", "o_year", "rev_t_p", "rev_a_p"],
            right_cols=["c_nationkey"], post=region_fuse,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("o_year", pa.int64()),
                                   ("rev_t_p", pa.int64()),
                                   ("rev_a_p", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("c_nationkey", pa.int64())]))

    out = _driver_combine(parts, ["o_year"],
                          [("rev_t_p", "sum", "rev_t"),
                           ("rev_a_p", "sum", "rev_a")]).to_pandas()
    out["mkt_share"] = out["rev_t"].to_numpy(np.int64) \
        / out["rev_a"].to_numpy(np.int64)
    return out[["o_year", "mkt_share"]].sort_values("o_year") \
        .reset_index(drop=True)


ROLLING_WINDOW_DAYS = 7


def rolling_active_users(sf_dir: str,
                         window_days: int = ROLLING_WINDOW_DAYS):
    """Rolling 7-day active users per event day — the WINDOWED
    count-distinct (a plain per-day distinct undercounts; a cross join
    of days × events explodes).  Plan: global distinct event days are
    calendar-bounded (driver combine); distinct (user, day) pairs make
    ONE hash(user) exchange, and inside each bucket every user's
    active days become covered-day INTERVALS over the day index
    ([a, a+w-1] per active day), unioned per user with a vectorized
    lexsort sweep (running-max of interval ends, resets at user
    boundaries via a 2^32 group offset) and accumulated into one
    difference array — per-bucket work is O(pairs log pairs), output
    ≤ |days| partial rows per bucket, NO per-user Python loop.

    Returns pandas (day, n_users) sorted by day."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    day_us = np.int64(86_400_000_000)
    span = np.int64(window_days - 1) * day_us

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = np.unique(ts // day_us * day_us)
        return pa.table({"d": pa.array(d, pa.int64())})

    dtab = _driver_combine(
        ev.map_batches(day_partial, batch_format="pyarrow",
                       batch_size=None),
        ["d"], [("d", "count", "n")])
    days = np.sort(dtab["d"].to_numpy().astype(np.int64))
    days_ref = ray.put(days)

    def pair_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack(
            [u, ts // day_us * day_us], axis=1), axis=0)
        out = pa.table({"u": pa.array(pairs[:, 0]),
                        "a": pa.array(pairs[:, 1])})
        return out.add_column(0, "__b", pa.array(
            int_bucket_of(pairs[:, 0], nb)))

    pairs = ev.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)

    def bucket_cover(g: pd.DataFrame) -> pa.Table:
        D = ray.get(days_ref)
        nd = len(D)
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if not len(g) or not nd:
            return empty
        u = g["u"].to_numpy(np.int64)
        a = g["a"].to_numpy(np.int64)
        lo = np.searchsorted(D, a, "left").astype(np.int64)
        hi = np.searchsorted(D, a + span, "right").astype(np.int64)
        order = np.lexsort((lo, u))
        u_s, lo_s, hi_s = u[order], lo[order], hi[order]
        new_user = np.r_[True, u_s[1:] != u_s[:-1]]
        g_ord = np.cumsum(new_user) - 1
        enc = hi_s + g_ord * np.int64(1 << 32)
        runmax = np.maximum.accumulate(enc) - g_ord * np.int64(1 << 32)
        prev = np.r_[np.int64(0), runmax[:-1]]
        prev[new_user] = 0                  # fresh sweep per user
        eff_lo = np.maximum(lo_s, prev)
        keep = eff_lo < hi_s
        diff = np.zeros(nd + 1, np.int64)
        np.add.at(diff, eff_lo[keep], 1)
        np.add.at(diff, hi_s[keep], -1)
        cov = np.cumsum(diff)[:nd]
        nz = np.nonzero(cov)[0]
        return pa.table({"day": pa.array(D[nz], pa.int64()),
                         "n_p": pa.array(cov[nz], pa.int64())})

    parts = pairs.groupby("__b").map_groups(bucket_cover,
                                            batch_format="pandas")
    out = _driver_combine(parts, ["day"],
                          [("n_p", "sum", "n_users")]).to_pandas()
    out["day"] = out["day"].to_numpy(np.int64) \
        .astype("datetime64[us]")
    return out.sort_values("day").reset_index(drop=True)


Q16_EXCLUDED_BRAND = "Brand#3"
Q16_SIZES = (10, 20, 30, 40)


def q16_parts_supplier_relationship(sf_dir: str,
                                    excluded_brand: str =
                                    Q16_EXCLUDED_BRAND,
                                    sizes: tuple = Q16_SIZES):
    """TPC-H Q16 shape (parts/supplier relationship): how many DISTINCT
    suppliers ship parts of each (brand, type, size) triple, for a
    size whitelist and one excluded brand — re-expressed on lineitem
    (this corpus has no partsupp; supplier↔part links come from
    shipped lines).  Plan: the filtered part catalog broadcasts as a
    sorted (partkey → attr ordinal) lookup; lineitem prunes + maps to
    (attr ordinal, suppkey) at the scan; ONE hash(suppkey)-bucketed
    exchange dedups (a supplier's rows co-locate, so the per-bucket
    distinct (triple, suppkey) is globally exact) and each bucket
    emits ≤ |triples| count partials — supplier_cnt sums across
    buckets without double-counting because a suppkey lives in ONE
    bucket.  Driver combine over a catalog-bounded triple set.

    Returns pandas (p_brand, p_type, p_size, supplier_cnt) sorted by
    (supplier_cnt desc, brand, type, size)."""
    import pyarrow.parquet as pq
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filters=[("p_brand", "!=", excluded_brand),
                 ("p_size", "in", list(sizes))])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk, kind="stable")
    pk = pk[order]
    attrs = pd.DataFrame({
        "p_brand": part["p_brand"].to_numpy(zero_copy_only=False)[order],
        "p_type": part["p_type"].to_numpy(zero_copy_only=False)[order],
        "p_size": part["p_size"].to_numpy(zero_copy_only=False)[order]
        .astype(np.int64)})
    triples = attrs.drop_duplicates().reset_index(drop=True)
    trip_key = {t: i for i, t in enumerate(
        zip(triples["p_brand"], triples["p_type"], triples["p_size"]))}
    ordinal = np.array([trip_key[t] for t in zip(
        attrs["p_brand"], attrs["p_type"], attrs["p_size"])], np.int64)
    lookup_ref = ray.put((pk, ordinal))

    def prune(t: pa.Table) -> pa.Table:
        pk_, ord_ = ray.get(lookup_ref)
        keys = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not len(pk_):
            keep = np.zeros(len(keys), bool)
            pos = keep.astype(np.int64)
        else:
            pos = np.minimum(np.searchsorted(pk_, keys), len(pk_) - 1)
            keep = pk_[pos] == keys
        sup = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        pairs = np.unique(np.stack([sup, ord_[pos[keep]]], axis=1),
                          axis=0)
        out = pa.table({"s": pa.array(pairs[:, 0]),
                        "o": pa.array(pairs[:, 1])})
        return out.add_column(0, "__b", pa.array(
            int_bucket_of(pairs[:, 0], nb)))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]) \
        .map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_count(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["s", "o"])
        out = d.groupby("o", as_index=False, sort=False) \
            .agg(n_p=("s", "size"))
        return arrow_group(pd.DataFrame({
            "o": out["o"].to_numpy(np.int64),
            "n_p": out["n_p"].to_numpy(np.int64)}))

    parts = li.groupby("__b").map_groups(bucket_count,
                                         batch_format="pandas")
    agg = _driver_combine(parts, ["o"],
                          [("n_p", "sum", "supplier_cnt")]).to_pandas()
    out = triples.iloc[agg["o"].to_numpy(np.int64)].reset_index(
        drop=True)
    out["supplier_cnt"] = agg["supplier_cnt"].to_numpy(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Graph analytics over the co-purchase graph (PageRank, triangles)
# ---------------------------------------------------------------------------

def _copurchase_edges(sf_dir: str):
    """Distinct co-purchase part pairs (id_a < id_b) as a Dataset — the
    edge list both graph operators below consume.  Same two bounded
    exchanges as :func:`copurchase_pairs`: per-order pair explode inside
    hash(orderkey) buckets (per-ORDER quadratic, never per-corpus), then
    a pair-hash bucketed global distinct so each edge survives once."""
    from ..runtime import arrow_group, int_bucket_of, pair_bucket_of, \
        num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def block_dedup(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_partkey"]) \
            .aggregate([([], "count_all")]).drop_columns(["count_all"])
        o = g["l_orderkey"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(o.astype(np.int64), nb)))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])[
            ["l_orderkey", "l_partkey"]]
        j = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        j = j[j["l_partkey_a"] < j["l_partkey_b"]]
        j = j.drop_duplicates(["l_partkey_a", "l_partkey_b"])
        a = j["l_partkey_a"].to_numpy(np.int64)
        b = j["l_partkey_b"].to_numpy(np.int64)
        return arrow_group(pd.DataFrame({
            "__b2": pair_bucket_of(a, b, nb), "id_a": a, "id_b": b}))

    def bucket_distinct(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["id_a", "id_b"])
        return arrow_group(pd.DataFrame({
            "id_a": d["id_a"].to_numpy(np.int64),
            "id_b": d["id_b"].to_numpy(np.int64)}))

    return (ds.map_batches(block_dedup, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__b").map_groups(bucket_pairs,
                                       batch_format="pandas")
            .groupby("__b2").map_groups(bucket_distinct,
                                        batch_format="pandas"))


PAGERANK_K = 25
PAGERANK_ITERS = 3


def pagerank_parts(sf_dir: str, k: int = PAGERANK_K,
                   iterations: int = PAGERANK_ITERS):
    """PageRank over the part co-purchase graph — link-analysis ranking
    of catalog items ("hub" products every basket touches), the
    training-mix weighting primitive applied to a TPC-H-shaped input.
    Integer-exact power iteration (stages/graph.pagerank): every rank is
    an int64 scaled by 1e9, contributions use floor division, so the
    bucketed engine sums and the SQL GROUP BY agree bit-for-bit with no
    float association caveat.  Top-k is per-block local top-k + a
    driver merge of <= blocks x k rows (never node-sized).

    Returns pandas (part_id, rank_scaled), top-k by rank desc, id asc."""
    from ..stages.graph import pagerank

    ranks = pagerank(_copurchase_edges(sf_dir), iterations=iterations)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["rank_scaled", "node"], ascending=[False, True]).head(k)
        return pa.table({
            "part_id": pa.array(df["node"].to_numpy(np.int64),
                                pa.int64()),
            "rank_scaled": pa.array(df["rank_scaled"].to_numpy(np.int64),
                                    pa.int64())})

    parts = ranks.map_batches(local_topk, batch_format="pyarrow")
    out = _driver_combine(parts, ["part_id"],
                          [("rank_scaled", "max", "rank_scaled")]) \
        .to_pandas()
    return out.sort_values(["rank_scaled", "part_id"],
                           ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def triangle_count_parts(sf_dir: str):
    """Exact triangle count + edge count of the part co-purchase graph
    (community density of the catalog).  Degree-ordered wedge join
    (stages/graph.triangle_count) — every stage edge- or wedge-sized.

    Returns pandas (n_triangles, n_edges) — a single row."""
    from ..stages.graph import triangle_count

    edges = _copurchase_edges(sf_dir).materialize()
    n_tri = triangle_count(edges)
    return pd.DataFrame({"n_triangles": [int(n_tri)],
                         "n_edges": [int(edges.count())]})


PPR_SEED_MOD = 97
PPR_K = 25


def ppr_parts(sf_dir: str, k: int = PPR_K,
              iterations: int = PAGERANK_ITERS,
              seed_mod: int = PPR_SEED_MOD):
    """Personalized PageRank over the part co-purchase graph: teleport
    mass restricted to a SEED set (parts with partkey ≡ 0 mod
    ``seed_mod`` — a deterministic, SQL-expressible anchor set), so the
    ranking answers "how relevant is each part to THESE parts" — the
    seeded-relevance weighting used to upsample corpus neighborhoods
    around known-good documents.  Same integer-exact power iteration
    and BSP shape as :func:`pagerank_parts`; the seed set rides as one
    broadcast sorted array.

    Returns pandas (part_id, rank_scaled), top-k by (rank desc, id)."""
    import pyarrow.parquet as pq
    from ..stages.graph import pagerank

    par = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                        columns=["p_partkey"])
    pk = par["p_partkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    seeds = pk[pk % seed_mod == 0]
    ranks = pagerank(_copurchase_edges(sf_dir), iterations=iterations,
                     seeds=seeds)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["rank_scaled", "node"], ascending=[False, True]).head(k)
        return pa.table({
            "part_id": pa.array(df["node"].to_numpy(np.int64),
                                pa.int64()),
            "rank_scaled": pa.array(df["rank_scaled"].to_numpy(np.int64),
                                    pa.int64())})

    parts = ranks.map_batches(local_topk, batch_format="pyarrow")
    out = _driver_combine(parts, ["part_id"],
                          [("rank_scaled", "max", "rank_scaled")]) \
        .to_pandas()
    return out.sort_values(["rank_scaled", "part_id"],
                           ascending=[False, True]).head(k) \
        .reset_index(drop=True)


SEED_DIST_HOPS = 3


def seed_distance_parts(sf_dir: str, max_hops: int = SEED_DIST_HOPS,
                        seed_mod: int = PPR_SEED_MOD):
    """Hop distance from the PPR anchor set (partkey ≡ 0 mod 97)
    through the co-purchase graph, capped at ``max_hops`` — the
    label-propagation companion to :func:`ppr_parts` (how many
    co-purchase hops separate each part from a known anchor).  Multi-
    source BFS (stages/graph.seed_distance): fixed BSP rounds mirroring
    the SQL oracle's capped recursive CTE.

    Returns pandas (part_id, dist) sorted by part_id."""
    import pyarrow.parquet as pq
    from ..stages.graph import seed_distance

    par = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                        columns=["p_partkey"])
    pk = par["p_partkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    seeds = pk[pk % seed_mod == 0]
    out = seed_distance(_copurchase_edges(sf_dir), seeds,
                        max_hops=max_hops)
    return out.rename(columns={"node": "part_id"}) \
        .reset_index(drop=True)


CN_TOPK = 50


def common_neighbors_parts(sf_dir: str, k: int = CN_TOPK):
    """Link prediction over the part co-purchase graph: the top-k part
    pairs that share the most co-purchase neighbours WITHOUT ever
    co-occurring in an order themselves — "frequently bought alongside
    the same things" recommendation candidates.  Wedge generation is
    bucketed per center, pair counts combine in pair-hash buckets with a
    local top-k, the driver merges ≤ buckets × k rows
    (stages/graph.common_neighbors_topk).

    Returns pandas (id_a, id_b, n_common), ordered by
    (n_common desc, id_a, id_b) — a total order, so the k-boundary is
    deterministic."""
    from ..stages.graph import common_neighbors_topk

    return common_neighbors_topk(_copurchase_edges(sf_dir), k=k)


def clustering_parts(sf_dir: str):
    """Local clustering coefficient of every part in the co-purchase
    graph: deg, triangle count, and cc = 2·tri / (deg·(deg−1)) — the
    community-tightness score per catalog item.  Integer deg/n_tri are
    exact (stages/graph.node_clustering, the degree-ordered wedge join
    with per-corner counts); the float coefficient is ONE division of
    exactly-representable ints in both the engine and the SQL oracle,
    so the bits agree.

    Returns pandas (part_id, deg, n_tri, clustering) sorted by part_id."""
    from ..stages.graph import node_clustering

    df = node_clustering(_copurchase_edges(sf_dir))
    deg = df["deg"].to_numpy(np.int64)
    tri = df["n_tri"].to_numpy(np.int64)
    denom = np.where(deg >= 2, deg * (deg - 1.0), 1.0)
    cc = np.where(deg >= 2, (2.0 * tri) / denom, 0.0)
    return pd.DataFrame({"part_id": df["node"].to_numpy(np.int64),
                         "deg": deg, "n_tri": tri, "clustering": cc})


# ---------------------------------------------------------------------------
# TPC-H completion wave: the six remaining query shapes (Q2, Q9, Q11,
# Q12, Q19, Q20), adapted to the columns this corpus HAS (no partsupp /
# shipmode / commitdate) while preserving each query's distinctive plan
# shape.  All money stays integer 1e-4 dollars (or cents) until one
# final division, mirroring the SQL oracle exactly.
# ---------------------------------------------------------------------------

def _lookup_sorted(keys_sorted, vals, x):
    """vals[searchsorted] + membership mask — the broadcast-dimension
    FK lookup primitive (keys_sorted ascending, possibly non-dense)."""
    if len(keys_sorted) == 0:
        return np.zeros(len(x), dtype=vals.dtype if hasattr(vals, "dtype")
                        else np.int64), np.zeros(len(x), dtype=bool)
    pos = np.minimum(np.searchsorted(keys_sorted, x),
                     len(keys_sorted) - 1)
    return vals[pos], keys_sorted[pos] == x


def _cents(col) -> np.ndarray:
    """Exact integer cents from a 2-decimal float column."""
    return np.round(np.asarray(col, dtype=np.float64) * 100.0) \
        .astype(np.int64)


Q2_REGION = "EUROPE"
Q2_SIZE = 15
Q2_TYPE = "SMALL"
Q2_TOPK = 100


def q2_min_cost_supplier(sf_dir: str, region: str = Q2_REGION,
                         size: int = Q2_SIZE, ptype: str = Q2_TYPE,
                         k: int = Q2_TOPK):
    """TPC-H Q2 shape (minimum-cost supplier): for each part of a given
    size/type, the region's suppliers offering it at the per-part
    MINIMUM line price — the groupwise-argmin-with-join-back plan (this
    corpus has no partsupp, so "cost" is the cheapest lineitem price,
    exact integer cents).  Reference analog: per-group best-detection
    selection (max_det argmax inverted to argmin).

    Physical plan: part filter and region-supplier set are DIMENSIONS —
    loaded once on the driver, shipped once via ``ray.put``, applied as
    sorted-array membership inside ``map_batches`` (never re-shipped
    per batch).  Lineitem reduces per block to per-(part, supplier) min
    cents, then ONE hash(partkey) exchange: every partial of a part
    lands in one bucket, where the global per-pair min, the per-part
    min, and the argmin join-back all happen vectorized.  The driver
    sees only (filtered parts × tied suppliers) rows; supplier/part
    attributes attach from the already-loaded dimension tables.

    Returns pandas (s_acctbal, s_name, n_name, p_partkey, p_name,
    min_cost) ordered by (s_acctbal desc, s_name, p_partkey, min_cost)
    LIMIT k — a total order, so the cut is deterministic."""
    import pyarrow.parquet as pq
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rk = {int(r["r_regionkey"]): r["r_name"]
          for r in reg.to_pylist()}
    nat_name = {int(r["n_nationkey"]): r["n_name"]
                for r in nat.to_pylist()}
    region_nk = {int(r["n_nationkey"]) for r in nat.to_pylist()
                 if rk[int(r["n_regionkey"])] == region}
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"))
    s_df = sup.to_pandas()
    s_df = s_df[s_df["s_nationkey"].isin(region_nk)]
    s_keys = np.sort(s_df["s_suppkey"].to_numpy(np.int64))

    par = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                        columns=["p_partkey", "p_name", "p_size",
                                 "p_type"]).to_pandas()
    par = par[(par["p_size"] == size) & (par["p_type"] == ptype)]
    p_keys = np.sort(par["p_partkey"].to_numpy(np.int64))

    sets_ref = ray.put((s_keys, p_keys))

    def block_min(t: pa.Table) -> pa.Table:
        sk, pk = ray.get(sets_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _, in_p = _lookup_sorted(pk, pk, lp)
        _, in_s = _lookup_sorted(sk, sk, ls)
        keep = in_p & in_s
        if not keep.any():
            return pa.table({"__b": pa.array([], pa.int32()),
                             "p_partkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "cost_c": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "p_partkey": lp[keep], "s_suppkey": ls[keep],
            "cost_c": _cents(t["l_extendedprice"].to_numpy(
                zero_copy_only=False)[keep])})
        g = df.groupby(["p_partkey", "s_suppkey"], sort=False,
                       as_index=False)["cost_c"].min()
        g.insert(0, "__b", int_bucket_of(
            g["p_partkey"].to_numpy(np.int64), nb))
        return arrow_group(g)

    def argmin_join_back(g: pd.DataFrame) -> pa.Table:
        pair = g.groupby(["p_partkey", "s_suppkey"], sort=False,
                         as_index=False)["cost_c"].min()
        mc = pair.groupby("p_partkey", sort=False)["cost_c"] \
            .transform("min")
        out = pair[pair["cost_c"] == mc]
        return arrow_group(out.astype("int64"))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    winners = (li.map_batches(block_min, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("__b").map_groups(argmin_join_back,
                                          batch_format="pandas")) \
        .to_pandas()
    if not len(winners):
        return pd.DataFrame({"s_acctbal": pd.Series(dtype="float64"),
                             "s_name": pd.Series(dtype="object"),
                             "n_name": pd.Series(dtype="object"),
                             "p_partkey": pd.Series(dtype="int64"),
                             "p_name": pd.Series(dtype="object"),
                             "min_cost": pd.Series(dtype="float64")})
    s_attr = s_df.set_index("s_suppkey")
    out = winners.astype("int64")
    out["s_acctbal"] = s_attr["s_acctbal"] \
        .reindex(out["s_suppkey"]).to_numpy()
    out["s_name"] = s_attr["s_name"].reindex(out["s_suppkey"]) \
        .to_numpy()
    out["n_name"] = [nat_name[int(nk)] for nk in
                     s_attr["s_nationkey"].reindex(out["s_suppkey"])]
    out["p_name"] = par.set_index("p_partkey")["p_name"] \
        .reindex(out["p_partkey"]).to_numpy()
    out["min_cost"] = out["cost_c"].to_numpy(np.int64) / 100.0
    out = out.sort_values(["s_acctbal", "s_name", "p_partkey",
                           "min_cost"],
                          ascending=[False, True, True, True]).head(k)
    return out[["s_acctbal", "s_name", "n_name", "p_partkey",
                "p_name", "min_cost"]].reset_index(drop=True)


Q9_NAME_SUB = "red"


def q9_product_type_profit(sf_dir: str, name_sub: str = Q9_NAME_SUB):
    """TPC-H Q9 shape (product-type profit): profit per (supplier
    nation, order year) for parts whose name contains ``name_sub`` —
    the widest fact-dimension star in the suite (lineitem × part ×
    supplier × nation × orders).  No partsupp here, so unit cost is
    p_retailprice: profit = extprice·(1−disc) − retailprice·qty, kept
    in exact integer 1e-4 dollars (qty is integral, retailprice has 2
    decimals), so partial sums commute and the SQL oracle matches
    bit-for-bit.

    Physical plan: part (filtered to the name match) and supplier are
    broadcast sorted-array lookups inside ONE map_batches over
    lineitem, which reduces each surviving row to (orderkey, supp_nk,
    amount4) BEFORE the single big-big exchange (hash join to orders
    on orderkey, year extracted and partially aggregated inside the
    join bucket).  Partials are ≤ |nations|·|years| per bucket →
    driver-combined.

    Returns pandas (supp_nation, o_year, sum_profit) ordered by
    (supp_nation asc, o_year desc)."""
    import pyarrow.parquet as pq
    from ..stages.joins import hash_join

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nat_name = {int(r["n_nationkey"]): r["n_name"]
                for r in nat.to_pylist()}
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    s_k = sup["s_suppkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    s_ord = np.argsort(s_k, kind="stable")
    par = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                        columns=["p_partkey", "p_name",
                                 "p_retailprice"]).to_pandas()
    par = par[par["p_name"].str.contains(name_sub, regex=False)]
    p_k = par["p_partkey"].to_numpy(np.int64)
    p_ord = np.argsort(p_k, kind="stable")
    lookup_ref = ray.put((
        s_k[s_ord],
        sup["s_nationkey"].to_numpy(zero_copy_only=False)
        .astype(np.int64)[s_ord],
        p_k[p_ord],
        _cents(par["p_retailprice"].to_numpy())[p_ord]))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"])

    def prune(t: pa.Table) -> pa.Table:
        sk, sn, pk, pr = ray.get(lookup_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        retail_c, in_p = _lookup_sorted(pk, pr, lp)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        supp_nk, in_s = _lookup_sorted(sk, sn, ls)
        keep = in_p & in_s
        pe = _cents(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep])
        di = _cents(t["l_discount"].to_numpy(
            zero_copy_only=False)[keep])
        qty = np.round(t["l_quantity"].to_numpy(
            zero_copy_only=False)[keep]).astype(np.int64)
        amount4 = pe * (100 - di) - retail_c[keep] * qty * 100
        return pa.table({
            "l_orderkey": t["l_orderkey"].to_numpy(
                zero_copy_only=False)[keep],
            "supp_nk": supp_nk[keep], "amount4": amount4})

    li = li.map_batches(prune, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"]) \
        .rename_columns({"o_orderkey": "l_orderkey"})

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"supp_nk": pd.Series(dtype="int64"),
                              "o_year": pd.Series(dtype="int64"),
                              "p4": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        year = pd.DatetimeIndex(j["o_orderdate"]).year \
            .to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"supp_nk": j["supp_nk"].to_numpy(np.int64),
             "o_year": year,
             "p4": j["amount4"].to_numpy(np.int64)}) \
            .groupby(["supp_nk", "o_year"], as_index=False,
                     sort=False).sum()

    parts = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["l_orderkey", "supp_nk", "amount4"],
        right_cols=["o_orderdate"], post=fused,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nk", pa.int64()),
                               ("amount4", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))
    out = _driver_combine(parts, ["supp_nk", "o_year"],
                          [("p4", "sum", "p4")]).to_pandas()
    out["supp_nation"] = [nat_name[int(nk)] for nk in out["supp_nk"]]
    out["sum_profit"] = out["p4"].to_numpy(np.int64) / 10000.0
    out = out.sort_values(["supp_nation", "o_year"],
                          ascending=[True, False])
    return out[["supp_nation", "o_year", "sum_profit"]] \
        .reset_index(drop=True)


Q11_NATION = "NATION_3"
Q11_FRAC_DENOM = 500


def q11_important_parts(sf_dir: str, nation: str = Q11_NATION,
                        frac_denom: int = Q11_FRAC_DENOM):
    """TPC-H Q11 shape (important stock): parts whose revenue through
    one nation's suppliers exceeds 1/``frac_denom`` of that nation's
    TOTAL — the grouped-sum-vs-global-scalar HAVING plan.  The compare
    is pure int64 (``val4·denom > total4``), so no float threshold can
    flake at the boundary.

    Physical plan: the nation's supplier keys broadcast once; lineitem
    prunes and partially aggregates per block (one pandas groupby per
    block — per-part partials, part is a dimension so the partial set
    is dimension-bounded); the driver combines partials, takes the
    global total from the same combined table, and filters.  No
    all-to-all exchange at all.

    Returns pandas (p_partkey, value) ordered by (value desc,
    p_partkey)."""
    import pyarrow.parquet as pq
    from ..runtime import arrow_group

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nkeys = {int(r["n_nationkey"]) for r in nat.to_pylist()
             if r["n_name"] == nation}
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    s_keys = np.sort(sup.loc[sup["s_nationkey"].isin(nkeys),
                             "s_suppkey"].to_numpy(np.int64))
    keys_ref = ray.put(s_keys)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        sk = ray.get(keys_ref)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _, in_s = _lookup_sorted(sk, sk, ls)
        if not in_s.any():
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        pe = _cents(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[in_s])
        di = _cents(t["l_discount"].to_numpy(
            zero_copy_only=False)[in_s])
        df = pd.DataFrame({
            "p_partkey": t["l_partkey"].to_numpy(
                zero_copy_only=False)[in_s].astype(np.int64),
            "v": pe * (100 - di)})
        return arrow_group(df.groupby("p_partkey", sort=False,
                                      as_index=False)["v"].sum())

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    comb = _driver_combine(parts, ["p_partkey"], [("v", "sum", "val4")]) \
        .to_pandas().astype("int64")
    total = int(comb["val4"].sum())
    out = comb[comb["val4"] * frac_denom > total].copy()
    out["value"] = out["val4"].to_numpy(np.int64) / 10000.0
    out = out.sort_values(["value", "p_partkey"],
                          ascending=[False, True])
    return out[["p_partkey", "value"]].reset_index(drop=True)


Q12_LATE_DAYS = 60
Q12_DATE_LO = "1996-01-01"
Q12_DATE_HI = "1997-01-01"


def q12_ship_latency(sf_dir: str, late_days: int = Q12_LATE_DAYS,
                     date_lo: str = Q12_DATE_LO,
                     date_hi: str = Q12_DATE_HI):
    """TPC-H Q12 shape (shipping modes / order priority): per shipping
    class, how many lines belong to critical-priority orders vs not —
    the dual-CASE-count plan.  This corpus has no l_shipmode, so the
    class is DERIVED: lines shipped more than ``late_days`` after the
    order date are 'SLOW', the rest 'FAST' (the reference's
    skip-interval/decimation predicates are the same derive-then-count
    shape).

    Physical plan: ship-date window pushed to the parquet read; ONE
    big-big exchange (hash join to orders on orderkey) with the CASE
    counts fused inside the join bucket; ≤ 2 partial rows per bucket →
    driver-combined.

    Returns pandas (ship_class, high_line_count, low_line_count)
    sorted by ship_class."""
    from ..stages.joins import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate"],
               filter=((pc.field("l_shipdate")
                        >= pc.scalar(pd.Timestamp(date_lo)))
                       & (pc.field("l_shipdate")
                          < pc.scalar(pd.Timestamp(date_hi)))))
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]) \
        .rename_columns({"o_orderkey": "l_orderkey"})
    late_us = np.int64(late_days) * 86_400_000_000

    def fused(j: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ship_class": pd.Series(dtype="object"),
                              "hi": pd.Series(dtype="int64"),
                              "lo": pd.Series(dtype="int64")})
        if not len(j):
            return empty
        ship = j["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        od = j["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        slow = ship - od > late_us
        high = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]) \
            .to_numpy()
        df = pd.DataFrame({
            "ship_class": np.where(slow, "SLOW", "FAST"),
            "hi": high.astype(np.int64),
            "lo": (~high).astype(np.int64)})
        return df.groupby("ship_class", as_index=False,
                          sort=False).sum()

    parts = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["l_orderkey", "l_shipdate"],
        right_cols=["o_orderdate", "o_orderpriority"], post=fused,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]))
    out = _driver_combine(parts, ["ship_class"],
                          [("hi", "sum", "high_line_count"),
                           ("lo", "sum", "low_line_count")]).to_pandas()
    return out.sort_values("ship_class").reset_index(drop=True)


Q19_TERMS = (("Brand#12", 1, 5, 1, 11),
             ("Brand#23", 1, 10, 10, 20),
             ("Brand#5", 1, 15, 20, 30))


def q19_disjunctive_revenue(sf_dir: str, terms=Q19_TERMS):
    """TPC-H Q19 shape (discounted revenue): ONE scalar — revenue over
    an OR of (brand, size-range, quantity-range) conjunctions — the
    disjunctive-pushdown plan (reference analog: skip-detections'
    OR-composed predicate chain, readers.py compile_predicate).

    Physical plan: part is a dimension — (partkey → brand-term id,
    size) loads once on the driver RESTRICTED to the brands named in
    ``terms``, broadcast via ``ray.put``; each lineitem block resolves
    its parts, evaluates the whole disjunction vectorized, and emits
    one int64 partial; the driver sums block partials.  Zero shuffles.

    Returns pandas (revenue) — a single row, exact 1e-4 dollars until
    the final division."""
    import pyarrow.parquet as pq

    brands = {t[0]: i for i, t in enumerate(terms)}
    par = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                        columns=["p_partkey", "p_brand", "p_size"]) \
        .to_pandas()
    par = par[par["p_brand"].isin(brands)]
    p_k = par["p_partkey"].to_numpy(np.int64)
    p_ord = np.argsort(p_k, kind="stable")
    lookup_ref = ray.put((
        p_k[p_ord],
        par["p_brand"].map(brands).to_numpy(np.int64)[p_ord],
        par["p_size"].to_numpy(np.int64)[p_ord],
        tuple((i, int(s_lo), int(s_hi), int(q_lo), int(q_hi))
              for i, (_, s_lo, s_hi, q_lo, q_hi)
              in enumerate(terms))))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pk, pb, ps, tms = ray.get(lookup_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        brand_id, in_p = _lookup_sorted(pk, pb, lp)
        size, _ = _lookup_sorted(pk, ps, lp)
        qty = np.round(t["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        keep = np.zeros(len(lp), dtype=bool)
        for i, s_lo, s_hi, q_lo, q_hi in tms:
            keep |= (in_p & (brand_id == i)
                     & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        pe = _cents(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep])
        di = _cents(t["l_discount"].to_numpy(
            zero_copy_only=False)[keep])
        s = int((pe * (100 - di)).sum())
        return pa.table({"r4": pa.array([s], pa.int64())})

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    total = int(parts.sum("r4") or 0)
    return pd.DataFrame({"revenue": [total / 10000.0]})


Q20_PREFIX = "small"
Q20_NATION = "NATION_1"
Q20_DATE_LO = "1996-01-01"
Q20_DATE_HI = "1997-01-01"


def q20_promotion_suppliers(sf_dir: str, prefix: str = Q20_PREFIX,
                            nation: str = Q20_NATION,
                            date_lo: str = Q20_DATE_LO,
                            date_hi: str = Q20_DATE_HI):
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation who shipped MORE THAN HALF of some filtered part's total
    volume in a date window — the nested-aggregate semi-join plan (no
    partsupp, so availability is the shipped quantity itself; the >50%
    compare is pure int64 ``2·supp_qty > tot_qty``).

    Physical plan: the name-filtered part keys broadcast once; the
    ship-window pushes to the read; blocks partially aggregate
    (part, supplier) quantities; ONE hash(partkey) exchange folds the
    partials, computes each part's total inside the bucket (all
    partials of a part co-locate), applies the dominance test, and
    emits qualifying supplier keys; the driver dedups a
    supplier-dimension-bounded set and attaches names for the
    nation's suppliers.

    Returns pandas (s_name, s_acctbal) sorted by s_name."""
    import pyarrow.parquet as pq
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    par = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                        columns=["p_partkey", "p_name"]).to_pandas()
    p_keys = np.sort(par.loc[par["p_name"].str.startswith(prefix),
                             "p_partkey"].to_numpy(np.int64))
    keys_ref = ray.put(p_keys)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"],
               filter=((pc.field("l_shipdate")
                        >= pc.scalar(pd.Timestamp(date_lo)))
                       & (pc.field("l_shipdate")
                          < pc.scalar(pd.Timestamp(date_hi)))))

    def partial(t: pa.Table) -> pa.Table:
        pk = ray.get(keys_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _, in_p = _lookup_sorted(pk, pk, lp)
        if not in_p.any():
            return pa.table({"__b": pa.array([], pa.int32()),
                             "p_partkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "p_partkey": lp[in_p],
            "s_suppkey": t["l_suppkey"].to_numpy(
                zero_copy_only=False)[in_p].astype(np.int64),
            "q": np.round(t["l_quantity"].to_numpy(
                zero_copy_only=False)[in_p]).astype(np.int64)})
        g = df.groupby(["p_partkey", "s_suppkey"], sort=False,
                       as_index=False)["q"].sum()
        g.insert(0, "__b", int_bucket_of(
            g["p_partkey"].to_numpy(np.int64), nb))
        return arrow_group(g)

    def dominant(g: pd.DataFrame) -> pa.Table:
        pair = g.groupby(["p_partkey", "s_suppkey"], sort=False,
                         as_index=False)["q"].sum()
        tot = pair.groupby("p_partkey", sort=False)["q"] \
            .transform("sum")
        ok = pair.loc[2 * pair["q"] > tot, ["s_suppkey"]] \
            .drop_duplicates()
        return arrow_group(ok.astype("int64"))

    winners = (li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("__b").map_groups(dominant,
                                          batch_format="pandas")) \
        .to_pandas()
    if not len(winners):
        return pd.DataFrame({"s_name": pd.Series(dtype="object"),
                             "s_acctbal": pd.Series(dtype="float64")})
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nkeys = {int(r["n_nationkey"]) for r in nat.to_pylist()
             if r["n_name"] == nation}
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet")) \
        .to_pandas()
    sup = sup[sup["s_nationkey"].isin(nkeys)
              & sup["s_suppkey"].isin(set(winners["s_suppkey"]
                                          .astype("int64")))]
    out = sup[["s_name", "s_acctbal"]].sort_values("s_name")
    return out.reset_index(drop=True)


def range_window_revenue(sf_dir: str, days: int = 30):
    """Per-customer trailing time-RANGE window (SQL: SUM(cents) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL
    ``days`` DAY PRECEDING AND CURRENT ROW)) — the TIME-based frame
    sibling of :func:`moving_window_revenue`'s ROWS frame: the frame
    holds however many orders fall in the window, and date-tied rows
    all see the full tied set (RANGE semantics).

    Per bucket: one sort by (custkey, date), then frame bounds come
    from TWO vectorized searchsorted probes over a composite
    ``group_code * SPAN + date_offset`` key (monotone across the whole
    bucket because SPAN exceeds any date offset, so per-group binary
    search needs no Python loop): start = leftmost index with date >=
    current - window, end = rightmost index with date <= current.  The
    window sum is one cumsum gather, integer cents throughout.

    Returns pandas (o_custkey, o_orderkey, o_orderdate, win_cents)
    sorted by (o_custkey, o_orderdate, o_orderkey).
    """
    from ..runtime import arrow_group, num_hash_buckets
    nb = num_hash_buckets(None)
    win_us = np.int64(days) * np.int64(86_400_000_000)

    def frames(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
            .reset_index(drop=True)
        n = len(g)
        if not n:
            return arrow_group(g.assign(win_cents=pd.Series(
                dtype=np.int64))[["o_custkey", "o_orderkey",
                                  "o_orderdate", "win_cents"]])
        cents = g["cents"].to_numpy(np.int64)
        us = g["o_orderdate"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        d = us - us.min()
        starts, counts = _group_starts(g["o_custkey"].to_numpy(np.int64))
        codes = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        span = np.int64(d.max()) + win_us + np.int64(2)
        comp = codes * span + d
        lo = np.searchsorted(comp, codes * span + np.maximum(
            d - win_us, 0), side="left")
        hi = np.searchsorted(comp, comp, side="right")
        cs = np.cumsum(cents)
        g["win_cents"] = cs[hi - 1] - np.where(lo > 0, cs[lo - 1], 0)
        return arrow_group(g[["o_custkey", "o_orderkey", "o_orderdate",
                              "win_cents"]])

    out = (_orders_cents_bucketed(sf_dir, nb)
           .groupby("__bucket")
           .map_groups(frames, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)


def acctbal_percent_rank(sf_dir: str):
    """PERCENT_RANK of customer account balance within each nation —
    ``(rank - 1) / (n - 1)`` with ties sharing their minimum rank, 0.0
    for single-row partitions (the SQL rule).  Exact: rank and n are
    integers from one in-bucket lexsort (balance in cents), and the
    percent is ONE float64 division of those integers — the identical
    operation DuckDB's percent_rank performs, so the float column
    hash-matches.

    One hash(nationkey) exchange; per bucket, tie runs share the run
    head's rank via a repeat over `_group_starts` of the (nation,
    cents) composite.  Returns pandas (c_custkey, c_nationkey,
    bal_cents, pct_rank) sorted by c_custkey.
    """
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        nat = t["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return pa.table({"__bucket": int_bucket_of(
                             nat.astype(np.int64), nb),
                         "c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "bal_cents": pa.array(cents)})

    def ranks(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["c_nationkey", "bal_cents", "c_custkey"]) \
            .reset_index(drop=True)
        n_rows = len(g)
        if not n_rows:
            return arrow_group(g.assign(pct_rank=pd.Series(
                dtype=np.float64))[["c_custkey", "c_nationkey",
                                    "bal_cents", "pct_rank"]])
        nat = g["c_nationkey"].to_numpy(np.int64)
        starts, counts = _group_starts(nat)
        n = np.repeat(counts, counts).astype(np.int64)
        gstart = np.repeat(starts, counts)
        # tie runs over (nation, cents): rank = run start - group start + 1
        cents = g["bal_cents"].to_numpy(np.int64)
        comp_change = np.r_[True, (nat[1:] != nat[:-1])
                            | (cents[1:] != cents[:-1])]
        run_start = np.maximum.accumulate(
            np.where(comp_change, np.arange(n_rows), 0))
        rank = run_start - gstart + 1
        pct = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        g["pct_rank"] = pct
        return arrow_group(g[["c_custkey", "c_nationkey", "bal_cents",
                              "pct_rank"]])

    out = (cust.map_batches(to_cents, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("__bucket").map_groups(ranks, batch_format="pandas")
           .to_pandas())
    return out.sort_values("c_custkey").reset_index(drop=True)


TRIGRAM_K = 15


def event_trigram_paths(sf_dir: str, k: int = TRIGRAM_K):
    """Top-k event-type TRIGRAM paths (the 3-step generalization of
    :func:`event_transition_counts`'s Markov pairs — "what do users do
    next-next?"): for each user's (ts, event_id)-ordered stream, count
    consecutive (t1 → t2 → t3) triples corpus-wide and keep the k most
    frequent, ties by (t1, t2, t3) asc.

    Same ONE hash(user) exchange; per bucket one lexsort + two shifted
    same-user compares build every triple vectorized, partial counts
    are ≤ |types|³ per bucket, driver-combined, then one driver top-k
    over the ≤ |types|³ combined rows.

    Returns pandas (t1, t2, t3, n) sorted by (n desc, t1, t2, t3).
    """
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def bucketed(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return t.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def triples(g: pd.DataFrame) -> pa.Table:
        user = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, user))
        u_s, ty_s = user[order], ty[order]
        ok = (u_s[2:] == u_s[:-2]) & (u_s[1:-1] == u_s[:-2]) \
            if len(u_s) > 2 else np.zeros(0, bool)
        out = pd.DataFrame({"t1": ty_s[:-2][ok], "t2": ty_s[1:-1][ok],
                            "t3": ty_s[2:][ok]})
        agg = out.groupby(["t1", "t2", "t3"], as_index=False,
                          sort=False).size().rename(
            columns={"size": "n_p"})
        return pa.table({
            "t1": pa.array(agg["t1"], pa.string()),
            "t2": pa.array(agg["t2"], pa.string()),
            "t3": pa.array(agg["t3"], pa.string()),
            "n_p": pa.array(agg["n_p"].to_numpy(np.int64))})

    parts = (ds.map_batches(bucketed, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("__b").map_groups(triples, batch_format="pandas"))
    out = _driver_combine(parts, ["t1", "t2", "t3"],
                          [("n_p", "sum", "n")]).to_pandas()
    out = out.sort_values(["n", "t1", "t2", "t3"],
                          ascending=[False, True, True, True]).head(k)
    return out.reset_index(drop=True)


def user_activity_gini(sf_dir: str):
    """Gini coefficient of events-per-user — the one-row inequality
    number every abuse/engagement report leads with (0 = uniform
    activity, →1 = a few users generate everything).

    Exact end-to-end: per-user counts via one hash(user) exchange,
    a DISTRIBUTED sort on (count asc, user asc), global ranks from
    :func:`~vframe_ray.stages.scan.global_prefix_scan` (n and Σx ride
    along as the scan's grand totals), and Σ i·x_i accumulates as
    per-block int64 partials — the classic rank formula
    G = 2·Σi·x_i / (n·Σx) − (n+1)/n 
    is then ONE float expression, reproduced verbatim by the oracle.

    Returns pandas with one row: (n_users, total_events, gini_r)."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from ..stages.scan import global_prefix_scan
    nb = num_hash_buckets(None)

    ev = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "x"])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return g.add_column(0, "__b", pa.array(
            int_bucket_of(u.astype(np.int64), nb)))

    def exact(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("user_id", as_index=False, sort=False)["x"].sum()
        out = arrow_group(agg)
        return out.append_column("one", pa.array(
            np.ones(len(agg), dtype=np.int64)))

    counts = (ev.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("__b").map_groups(exact, batch_format="pandas"))
    ranked = counts.sort(["x", "user_id"])
    scanned, grand = global_prefix_scan(ranked, ["one", "x"])
    n, sx = int(grand[0]), int(grand[1])
    if not n:
        return pd.DataFrame({"n_users": pd.array([0], dtype="int64"),
                             "total_events": pd.array([0],
                                                      dtype="int64"),
                             "gini_r": [float("nan")]})

    def ixi_partial(t: pa.Table) -> pa.Table:
        i = t["cum_one"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        return pa.table({"p": pa.array(
            [int((i.astype(np.int64) * x.astype(np.int64)).sum())],
            pa.int64())})

    parts = scanned.map_batches(ixi_partial, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    sixi = int(parts["p"].sum())
    gini = round((2.0 * sixi) / (float(n) * sx) - (n + 1) / float(n), 6)
    return pd.DataFrame({"n_users": pd.array([n], dtype="int64"),
                         "total_events": pd.array([sx], dtype="int64"),
                         "gini_r": [gini]})
