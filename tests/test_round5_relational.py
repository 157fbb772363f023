"""Round-5 operator wave: TPC-H Q7 (two-nation volume shipping), Q10
(returned-item top-k), Q19-ish brand revenue over the part table, and
exact count-distinct (daily active users) — each against duckdb/pandas
brute force on a hostile synthetic corpus (nation pairs in both
directions and mismatched, revenue ties at the top-k cut, boundary
dates, duplicated user-day events across blocks), plus forced big-big
fallback paths asserted identical to the broadcast paths."""

import os

import numpy as np
import pandas as pd
import pytest

duckdb = pytest.importorskip("duckdb")


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("round5_sf")
    rng = np.random.default_rng(55)
    n_cust, n_orders, n_li = 14, 150, 600
    nation = pd.DataFrame({
        "n_nationkey": np.arange(4, dtype=np.int32),
        "n_name": ["NATION_0", "NATION_1", "NATION_2", "NATION_3"],
        "n_regionkey": np.array([0, 0, 1, 1], dtype=np.int32)})
    cust = pd.DataFrame({
        "c_custkey": np.arange(1, n_cust + 1, dtype=np.int64),
        "c_name": [f"cust{i}" for i in range(n_cust)],
        "c_nationkey": (np.arange(n_cust) % 4).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": ["BUILDING"] * n_cust})
    sup = pd.DataFrame({
        "s_suppkey": np.arange(1, 9, dtype=np.int64),
        "s_name": [f"sup{i}" for i in range(8)],
        "s_nationkey": np.array([0, 1, 2, 3, 1, 2, 1, 2],
                                dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(0, 5000, 8), 2)})
    days = rng.integers(0, 4 * 365, n_orders)
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int64),
        "o_custkey": rng.integers(1, n_cust + 1,
                                  n_orders).astype(np.int64),
        "o_orderstatus": ["O"] * n_orders,
        "o_totalprice": np.round(rng.uniform(900, 200_000, n_orders), 2),
        "o_orderdate": pd.Timestamp("1995-06-01")
        + pd.to_timedelta(days, unit="D"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_orders)})
    # boundary dates: one order exactly at Q10's date_lo, one at date_hi
    orders.loc[0, "o_orderdate"] = pd.Timestamp("1996-01-01")
    orders.loc[1, "o_orderdate"] = pd.Timestamp("1996-07-01")
    part = pd.DataFrame({
        "p_partkey": np.arange(1, 41, dtype=np.int64),
        "p_name": [f"part{i}" for i in range(40)],
        "p_brand": [f"Brand#{1 + i % 5}" for i in range(40)],
        "p_type": ["PROMO" if i % 3 == 0 else "STANDARD"
                   for i in range(40)],
        "p_size": (1 + np.arange(40) % 40).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(100, 2000, 40), 2)})
    ship = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 4 * 365, n_li), unit="D")
    li = pd.DataFrame({
        "l_orderkey": rng.integers(1, n_orders + 1,
                                   n_li).astype(np.int64),
        "l_partkey": rng.integers(1, 41, n_li).astype(np.int64),
        "l_suppkey": rng.integers(1, 9, n_li).astype(np.int64),
        "l_linenumber": np.arange(n_li, dtype=np.int32) % 7,
        "l_quantity": rng.integers(1, 50, n_li).astype(float),
        "l_extendedprice": np.round(rng.uniform(100, 90_000, n_li), 2),
        "l_discount": np.round(rng.choice([0.0, 0.02, 0.05, 0.1],
                                          n_li), 2),
        "l_tax": np.zeros(n_li),
        "l_returnflag": rng.choice(["R", "N", "A"], n_li,
                                   p=[0.4, 0.4, 0.2]),
        "l_linestatus": ["O"] * n_li,
        "l_shipdate": ship})
    # boundary shipdates for Q7's window edges
    li.loc[0, "l_shipdate"] = pd.Timestamp("1996-01-01")
    li.loc[1, "l_shipdate"] = pd.Timestamp("1998-01-01")
    # events with planted duplicate (user, day, type) triples that land
    # in different blocks (contiguous rows split by repartition)
    n_ev = 800
    ev_ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10 * 86400, n_ev), unit="s")
    ev = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ev_ts,
        "user_id": rng.integers(0, 25, n_ev).astype(np.int64),
        "event_type": rng.choice(["view", "click", "buy"], n_ev),
        "value": np.round(rng.uniform(0, 50, n_ev), 3),
        "props": ['{"k": 1}'] * n_ev})
    # planted ts ties within a user (event_id breaks them) for the
    # keep-latest operator
    ev.loc[10, ["user_id", "ts"]] = ev.loc[11, ["user_id", "ts"]]
    docs = pd.DataFrame({
        "doc_id": np.arange(120, dtype=np.int64),
        "text": ["t"] * 120,
        "lang": ["en"] * 120,
        "source": ["s"] * 120,
        # powers of two sit exactly on log2 bucket boundaries
        "n_chars": np.r_[rng.integers(1, 5000, 116),
                         [64, 64, 128, 4096]].astype(np.int64)})
    for name, df in [("customer", cust), ("orders", orders),
                     ("nation", nation), ("supplier", sup),
                     ("lineitem", li), ("part", part), ("events", ev),
                     ("documents", docs)]:
        df.to_parquet(d / f"{name}.parquet", index=False)
    return str(d)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ["customer", "orders", "nation", "supplier", "lineitem",
              "part", "events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
       / 10000.0 AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year"""


def test_q7_vs_duckdb(sf_dir, monkeypatch):
    from vframe_ray.pipelines.relational import q7_volume_shipping
    got = q7_volume_shipping(sf_dir)
    want = _duck(sf_dir, Q7_SQL)
    assert len(want) >= 4          # both directions, multiple years
    pd.testing.assert_frame_equal(got, want)
    # forced big-big path: customer resolved by a second hash_join
    monkeypatch.setenv("VFRAME_RAY_DIM_BROADCAST_MAX_ROWS", "0")
    pd.testing.assert_frame_equal(q7_volume_shipping(sf_dir), want)


def test_q10_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import q10_returned_items
    got = q10_returned_items(sf_dir, k=5)
    want = _duck(sf_dir, """
SELECT c.c_custkey, c.c_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
       / 10000.0 AS revenue,
       c.c_acctbal, n.n_name
FROM customer c, orders o, lineitem l, nation n
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 5""")
    assert len(want) == 5
    pd.testing.assert_frame_equal(got, want)
    # the boundary order at date_hi is excluded (half-open window)
    assert (got["revenue"] > 0).all()


def test_brand_revenue_vs_duckdb(sf_dir, monkeypatch):
    from vframe_ray.pipelines.relational import brand_revenue
    got = brand_revenue(sf_dir)
    want = _duck(sf_dir, """
SELECT p_brand,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
       / 10000.0 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem, part
WHERE l_partkey = p_partkey AND p_size BETWEEN 1 AND 15
  AND l_quantity BETWEEN 5 AND 30
GROUP BY p_brand ORDER BY p_brand""")
    assert len(want) >= 3
    pd.testing.assert_frame_equal(got, want)
    # the size filter genuinely pruned parts (sizes 16..40 exist)
    assert want["n_items"].sum() < len(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet"))
    # forced big-big path: part side joins via shuffle hash join
    monkeypatch.setenv("VFRAME_RAY_DIM_BROADCAST_MAX_ROWS", "0")
    pd.testing.assert_frame_equal(brand_revenue(sf_dir), want)


def test_daily_active_users_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import daily_active_users
    got = daily_active_users(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    want = (ev.groupby(["event_type", "day"])["user_id"].nunique()
            .rename("n_users").reset_index()
            .sort_values(["event_type", "day"]).reset_index(drop=True))
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["day"].astype("datetime64[us]").tolist() == \
        want["day"].astype("datetime64[us]").tolist()
    assert got["n_users"].to_numpy(np.int64).tolist() == \
        want["n_users"].to_numpy(np.int64).tolist()
    # distinct actually deduped: raw event counts exceed user counts
    raw = ev.groupby(["event_type", "day"]).size()
    assert (raw.to_numpy() > want["n_users"].to_numpy()).any()


def test_latest_event_per_user_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import latest_event_per_user
    got = latest_event_per_user(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = (ev.sort_values(["user_id", "ts", "event_id"])
            .drop_duplicates("user_id", keep="last")
            .sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["ts"].tolist() == want["ts"].tolist()
    # the planted within-user ts tie resolved by the larger event_id
    dup = ev[ev.duplicated(["user_id", "ts"], keep=False)]
    assert len(dup) >= 2


def test_user_event_pivot_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import (PIVOT_EVENT_TYPES,
                                                 user_event_pivot)
    # fixture events only use view/click/buy — 'buy' is NOT in the
    # known-types list, so it must still count toward n_events while
    # getting no column of its own
    got = user_event_pivot(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want_tot = ev.groupby("user_id").size()
    assert got["user_id"].tolist() == sorted(want_tot.index.tolist())
    assert got["n_events"].tolist() == \
        want_tot.loc[got["user_id"]].tolist()
    for ty in PIVOT_EVENT_TYPES:
        w = (ev[ev["event_type"] == ty].groupby("user_id").size()
             .reindex(got["user_id"], fill_value=0))
        assert got[f"n_{ty}"].tolist() == w.tolist(), ty
    assert (ev["event_type"] == "buy").any()
    assert got["n_events"].sum() > sum(
        got[f"n_{t}"].sum() for t in PIVOT_EVENT_TYPES)


def test_doc_length_histogram_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import doc_length_histogram
    got = doc_length_histogram(sf_dir)
    want = _duck(sf_dir, """
SELECT (floor(log2(n_chars)))::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents WHERE n_chars > 0
GROUP BY bucket ORDER BY bucket""")
    pd.testing.assert_frame_equal(got, want)
    # planted exact powers of two landed in their own buckets (boundary
    # check: log2(64) == 6.0 exactly)
    assert 6 in got["bucket"].tolist()


def test_revenue_pareto_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import revenue_pareto
    got = revenue_pareto(sf_dir)
    want = _duck(sf_dir, """
WITH c AS (SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS cents
           FROM orders GROUP BY o_custkey),
 w AS (SELECT o_custkey, cents,
              sum(cents) OVER (ORDER BY cents DESC, o_custkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
       FROM c)
SELECT o_custkey, cents / 100.0 AS revenue, cum / 100.0 AS cum_revenue,
       cum::DOUBLE / (SELECT sum(cents) FROM c) AS cum_share
FROM w ORDER BY cents DESC, o_custkey""")
    pd.testing.assert_frame_equal(got, want)
    # it is a genuine Pareto curve: monotone rank order, share ends at 1
    assert (np.diff(got["cum_revenue"].to_numpy()) > 0).all()
    assert abs(got["cum_share"].iloc[-1] - 1.0) < 1e-12


def test_global_prefix_scan_many_blocks(ray_session):
    """The scan primitive itself: offsets carried across MANY blocks
    (including empty ones) must reproduce a single-process cumsum."""
    import ray
    from vframe_ray.stages.scan import global_prefix_scan
    rng = np.random.default_rng(9)
    v = rng.integers(-50, 100, 5000).astype(np.int64)
    ds = ray.data.from_pandas(
        pd.DataFrame({"i": np.arange(5000, dtype=np.int64), "v": v})) \
        .repartition(37)
    scanned, totals = global_prefix_scan(ds, ["v"])
    out = scanned.to_pandas()
    assert totals[0] == v.sum()
    # dataset order preserved: rows come back in input order
    assert out["i"].tolist() == list(range(5000))
    assert out["cum_v"].to_numpy().tolist() == np.cumsum(v).tolist()


def test_event_transition_counts_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import event_transition_counts
    got = event_transition_counts(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    mask = nxt.notna()
    want = (pd.DataFrame({"from_type": ev["event_type"][mask],
                          "to_type": nxt[mask]})
            .groupby(["from_type", "to_type"]).size().rename("n")
            .reset_index().sort_values(["from_type", "to_type"])
            .reset_index(drop=True))
    assert got["from_type"].tolist() == want["from_type"].tolist()
    assert got["to_type"].tolist() == want["to_type"].tolist()
    assert got["n"].to_numpy(np.int64).tolist() == \
        want["n"].to_numpy(np.int64).tolist()
    # transitions cover the full 3x3 type matrix in this corpus
    assert len(got) == 9


def test_late_shipment_rate_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import late_shipment_rate
    got = late_shipment_rate(sf_dir, late_days=90)
    want = _duck(sf_dir, """
SELECT o_orderpriority,
       (sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                 THEN 1 ELSE 0 END))::BIGINT AS n_late,
       count(*)::BIGINT AS n_items,
       (sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                 THEN 1 ELSE 0 END))::DOUBLE / count(*) AS late_rate
FROM lineitem, orders WHERE l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    pd.testing.assert_frame_equal(got, want)
    # the fixture's random ship/order dates produce both late and
    # on-time items in every class
    assert (got["n_late"] > 0).all() and \
        (got["n_late"] < got["n_items"]).all()


def test_monthly_revenue_growth_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import monthly_revenue_growth
    got = monthly_revenue_growth(sf_dir)
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["month"] = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    m = o.groupby("month").apply(
        lambda g: np.round(g["o_totalprice"] * 100).astype(np.int64)
        .sum()).rename("cents").reset_index().sort_values("month")
    cents = m["cents"].to_numpy(np.int64)
    assert got["month"].astype("datetime64[us]").tolist() == \
        m["month"].astype("datetime64[us]").tolist()[1:]
    assert got["revenue"].tolist() == (cents[1:] / 100.0).tolist()
    assert got["growth"].tolist() == \
        ((cents[1:] - cents[:-1]) / cents[:-1]).tolist()
    # growth swings both ways on the random fixture
    assert (got["growth"] > 0).any() and (got["growth"] < 0).any()


def test_customer_rfm_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import customer_rfm
    got = customer_rfm(sf_dir)
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    gmax = o["o_orderdate"].max()
    w = o.groupby("o_custkey").agg(
        last=("o_orderdate", "max"), frequency=("cents", "size"),
        cents=("cents", "sum")).reset_index().sort_values("o_custkey")
    rec = ((gmax - w["last"]).dt.total_seconds() * 1e6
           // 86_400_000_000).astype(np.int64)
    assert got["o_custkey"].tolist() == w["o_custkey"].tolist()
    assert got["recency_days"].tolist() == rec.tolist()
    assert got["frequency"].tolist() == \
        w["frequency"].astype(np.int64).tolist()
    assert got["monetary"].tolist() == \
        (w["cents"].to_numpy(np.int64) / 100.0).tolist()
    assert got["avg_order"].tolist() == \
        (w["cents"].to_numpy(np.int64) / 100.0
         / w["frequency"].to_numpy(np.int64)).tolist()
    # the corpus-max customer has recency 0
    assert (got["recency_days"] == 0).any()


def test_hourly_event_profile_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import hourly_event_profile
    got = hourly_event_profile(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hour"] = ev["ts"].dt.hour.astype(np.int64)
    want = (ev.groupby(["event_type", "hour"]).size().rename("n_events")
            .reset_index().sort_values(["event_type", "hour"])
            .reset_index(drop=True))
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["hour"].tolist() == want["hour"].tolist()
    assert got["n_events"].to_numpy(np.int64).tolist() == \
        want["n_events"].to_numpy(np.int64).tolist()
    assert got["hour"].between(0, 23).all()


def test_degenerate_new_ops(ray_session, tmp_path):
    """Every user has exactly ONE event → the transition matrix is
    empty but schema-stable (no null-typed columns from an empty
    bucket); a window with zero returned lineitems → q10 returns a
    typed empty frame WITHOUT scanning the customer table."""
    d = tmp_path / "deg"
    d.mkdir()
    ev = pd.DataFrame({
        "event_id": np.arange(50, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.arange(50), unit="h"),
        "user_id": np.arange(50, dtype=np.int64),   # all singletons
        "event_type": ["view"] * 50,
        "value": np.zeros(50),
        "props": ["{}"] * 50})
    ev.to_parquet(d / "events.parquet", index=False)
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2], dtype=np.int64),
        "o_custkey": np.array([1, 2], dtype=np.int64),
        "o_orderstatus": ["O", "O"],
        "o_totalprice": [10.0, 20.0],
        "o_orderdate": [pd.Timestamp("1996-02-01")] * 2,
        "o_orderpriority": ["1-URGENT"] * 2})
    orders.to_parquet(d / "orders.parquet", index=False)
    li = pd.DataFrame({
        "l_orderkey": np.array([1, 2], dtype=np.int64),
        "l_partkey": np.array([1, 1], dtype=np.int64),
        "l_suppkey": np.array([1, 1], dtype=np.int64),
        "l_linenumber": np.array([0, 0], dtype=np.int32),
        "l_quantity": [1.0, 1.0],
        "l_extendedprice": [5.0, 5.0],
        "l_discount": [0.0, 0.0],
        "l_tax": [0.0, 0.0],
        "l_returnflag": ["N", "N"],                 # nothing returned
        "l_linestatus": ["O", "O"],
        "l_shipdate": [pd.Timestamp("1996-03-01")] * 2})
    li.to_parquet(d / "lineitem.parquet", index=False)
    # customer file deliberately ABSENT: q10's empty-finalist path must
    # return before any customer read
    from vframe_ray.pipelines.relational import (event_transition_counts,
                                                 q10_returned_items)
    t = event_transition_counts(str(d))
    assert len(t) == 0
    assert list(t.columns) == ["from_type", "to_type", "n"]
    q = q10_returned_items(str(d))
    assert len(q) == 0
    assert list(q.columns) == ["c_custkey", "c_name", "revenue",
                               "c_acctbal", "n_name"]


def test_q4_order_priority_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import q4_order_priority
    got = q4_order_priority(sf_dir, late_days=90)
    want = _duck(sf_dir, """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    assert len(want) == 3
    pd.testing.assert_frame_equal(got, want)
    # EXISTS, not a count of lines: orders with MANY late lines count once
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    late_lines = (j["l_shipdate"] - j["o_orderdate"]
                  > pd.Timedelta(days=90)).sum()
    assert late_lines > want["n_orders"].sum()


def test_q22_idle_customers_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import q22_idle_customers
    # self-calibrating threshold: the cheapest-spending above-average
    # customer's max order price — their orders all fail the strict
    # `>`, so the idle set is non-empty by construction
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ct = np.round(cust["c_acctbal"] * 100).astype(np.int64)
    av = ct[ct > 0].sum() / (ct > 0).sum()
    above = cust.loc[ct.to_numpy() > av, "c_custkey"]
    price = float(od[od["o_custkey"].isin(above)]
                  .groupby("o_custkey")["o_totalprice"].max().min())
    got = q22_idle_customers(sf_dir, price=price)
    want = _duck(sf_dir, f"""
WITH c AS (SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS ct
           FROM customer),
 idle AS (SELECT * FROM c
          WHERE ct > (SELECT sum(ct)::DOUBLE / count(*)
                      FROM c WHERE ct > 0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_totalprice > {price}))
SELECT c_nationkey, count(*)::BIGINT AS n_cust,
       sum(ct)::DOUBLE / 100 AS total_acctbal
FROM idle GROUP BY c_nationkey ORDER BY c_nationkey""")
    assert want["n_cust"].sum() >= 1     # non-degenerate anti side
    pd.testing.assert_frame_equal(got, want)
    # degenerate direction: threshold below every order price → every
    # above-average customer is excluded (schema-stable empty result)
    empty = q22_idle_customers(sf_dir, price=0.0)
    assert len(empty) == 0
    assert list(empty.columns) == ["c_nationkey", "n_cust",
                                   "total_acctbal"]


def test_cohort_retention_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import cohort_retention
    got = cohort_retention(sf_dir)
    want = _duck(sf_dir, """
WITH uw AS (SELECT DISTINCT user_id,
                   date_trunc('week', ts)::TIMESTAMP AS wk
            FROM events),
 f AS (SELECT user_id, min(wk) AS cohort_week FROM uw
       GROUP BY user_id)
SELECT f.cohort_week,
       (date_diff('day', f.cohort_week, uw.wk) / 7)::BIGINT
           AS week_offset,
       count(*)::BIGINT AS n_users
FROM uw JOIN f USING (user_id)
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset""")
    assert (want["week_offset"] > 0).any()   # real retention rows
    pd.testing.assert_frame_equal(got, want)
    # offset-0 row of every cohort counts the whole cohort: each user
    # is active in their own first week by construction
    zero = got[got["week_offset"] == 0]["n_users"].sum()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert zero == ev["user_id"].nunique()


def test_copurchase_pairs_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import copurchase_pairs
    got = copurchase_pairs(sf_dir, k=25)
    want = _duck(sf_dir, """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*)::BIGINT AS n_orders
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b LIMIT 25""")
    assert len(want) == 25
    # ties at the cut exist in this corpus — the deterministic
    # (count desc, part_a, part_b) break must agree exactly
    assert (want["n_orders"] == want["n_orders"].iloc[-1]).sum() > 1
    pd.testing.assert_frame_equal(got, want)
    # duplicated (order, part) lines count once per order
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    dup = li.groupby(["l_orderkey", "l_partkey"]).size()
    assert (dup > 1).any()


def test_revenue_deciles_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import revenue_deciles
    # 14 customers into 10 tiles exercises the remainder rule: the
    # first n%k tiles carry the extra row
    got = revenue_deciles(sf_dir, k=10)
    want = _duck(sf_dir, """
WITH r AS (SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS cents
           FROM orders GROUP BY o_custkey),
 d AS (SELECT cents,
              NTILE(10) OVER (ORDER BY cents DESC, o_custkey)
                  AS decile
       FROM r)
SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_cust,
       sum(cents)::DOUBLE / 100 AS total_revenue
FROM d GROUP BY decile ORDER BY decile""")
    assert sorted(want["n_cust"].tolist(), reverse=True) \
        == want["n_cust"].tolist() and set(want["n_cust"]) == {1, 2}
    pd.testing.assert_frame_equal(got, want)
    # k > n: every customer its own tile
    one_each = revenue_deciles(sf_dir, k=50)
    assert (one_each["n_cust"] == 1).all() and len(one_each) == 14


def test_customer_order_profile_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import customer_order_profile
    # self-calibrating threshold: some customer's max order price, so
    # at least one zero-filled LEFT row exists
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    price = float(od.groupby("o_custkey")["o_totalprice"].max().min())
    got = customer_order_profile(sf_dir, price=price)
    want = _duck(sf_dir, f"""
SELECT c_custkey, count(o_orderkey)::BIGINT AS n_big,
       coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)),
                0)::DOUBLE / 100 AS big_total
FROM customer LEFT JOIN orders
  ON o_custkey = c_custkey AND o_totalprice > {price}
GROUP BY c_custkey ORDER BY c_custkey""")
    assert (want["n_big"] == 0).any()        # LEFT semantics exercised
    assert (want["n_big"] > 0).any()
    pd.testing.assert_frame_equal(got, want)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    assert len(got) == len(cust)             # every customer kept


def test_first_last_order_price_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import first_last_order_price
    got = first_last_order_price(sf_dir)
    want = _duck(sf_dir, """
SELECT DISTINCT o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey""")
    pd.testing.assert_frame_equal(got, want)
    # multi-order customers where first != last prove the frame is the
    # whole partition, not the default up-to-current-row frame
    assert (want["first_price"] != want["last_price"]).any()


def test_monthly_activity_overview_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import monthly_activity_overview
    got = monthly_activity_overview(sf_dir)
    want = _duck(sf_dir, """
WITH o AS (SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS m,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS cents
           FROM orders GROUP BY m),
 e AS (SELECT date_trunc('month', ts)::TIMESTAMP AS m,
              count(*)::BIGINT AS n_events
       FROM events GROUP BY m)
SELECT coalesce(o.m, e.m) AS month,
       coalesce(o.cents, 0)::DOUBLE / 100 AS revenue,
       coalesce(e.n_events, 0) AS n_events
FROM o FULL OUTER JOIN e ON o.m = e.m ORDER BY month""")
    # order months (1995-99) and event months (2024) are disjoint, so
    # both NULL sides of the FULL OUTER are exercised
    assert (want["revenue"] == 0).any() and (want["n_events"] == 0).any()
    got["month"] = got["month"].astype("datetime64[us]")
    want["month"] = want["month"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)


def test_q6_forecast_revenue_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import q6_forecast_revenue
    got = q6_forecast_revenue(sf_dir)
    want = _duck(sf_dir, """
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT))
       / 10000.0 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 24.0
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 4 AND 6""")
    assert int(want["n_items"].iloc[0]) > 0
    pd.testing.assert_frame_equal(got, want)
    # the filters genuinely prune: fewer qualifying rows than lineitems
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    assert int(want["n_items"].iloc[0]) < len(li)


def test_q14_promo_revenue_vs_duckdb(sf_dir, monkeypatch):
    from vframe_ray.pipelines.relational import q14_promo_revenue
    got = q14_promo_revenue(sf_dir, date_lo="1996-01-01",
                            date_hi="1997-01-01")
    want = _duck(sf_dir, """
WITH w AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      AS rev,
                  p.p_type
           FROM lineitem l LEFT JOIN part p
             ON l.l_partkey = p.p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01')
SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) / 10000.0
           AS promo_revenue,
       sum(rev) / 10000.0 AS total_revenue,
       100.0 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
             / sum(rev) AS promo_share
FROM w""")
    share = float(want["promo_share"].iloc[0])
    assert 0 < share < 100           # both classes genuinely present
    pd.testing.assert_frame_equal(got, want)
    # forced big-big path: part resolved by the shuffle hash join
    monkeypatch.setenv("VFRAME_RAY_DIM_BROADCAST_MAX_ROWS", "0")
    pd.testing.assert_frame_equal(
        q14_promo_revenue(sf_dir, date_lo="1996-01-01",
                          date_hi="1997-01-01"), want)


def test_q15_top_supplier_vs_duckdb(sf_dir, tmp_path):
    from vframe_ray.pipelines.relational import q15_top_supplier
    got = q15_top_supplier(sf_dir, date_lo="1995-01-01",
                           date_hi="1999-01-01")
    want = _duck(sf_dir, """
WITH rev AS (SELECT l_suppkey,
                    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100)
                                      AS BIGINT))) AS cents
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1995-01-01'
               AND l_shipdate < TIMESTAMP '1999-01-01'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name, cents / 10000.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE cents = (SELECT max(cents) FROM rev)
ORDER BY s_suppkey""")
    assert len(want) >= 1
    pd.testing.assert_frame_equal(got, want)
    # planted exact tie: two suppliers, one line each, same price —
    # BOTH must surface (integer cents keep the tie exact)
    li = pd.DataFrame({
        "l_suppkey": np.array([1, 2], dtype=np.int64),
        "l_extendedprice": [500_000.37, 500_000.37],
        "l_discount": [0.0, 0.0],
        "l_shipdate": [pd.Timestamp("1996-02-01")] * 2})
    sup = pd.DataFrame({"s_suppkey": np.array([1, 2], dtype=np.int64),
                        "s_name": ["supA", "supB"]})
    d = tmp_path / "q15tie"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet", index=False)
    sup.to_parquet(d / "supplier.parquet", index=False)
    tie = q15_top_supplier(str(d))
    assert tie["s_suppkey"].tolist() == [1, 2]
    assert tie["total_revenue"].nunique() == 1
