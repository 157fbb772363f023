"""Round-5 third operator wave: TPC-H Q8 (national market share), Q13
(customer order-count distribution), Q17 (small-quantity revenue with
an in-group average threshold), Q21 (sole-late-supplier blame) — each
against duckdb brute force on a hostile synthetic corpus: zero-order
customers for Q13's zero bucket, Q17 rows planted EXACTLY ON the
integer threshold boundary (5·n·q == sum is not small; one unit under
is), Q21 orders planted for every blame rule (sole late supplier,
two late suppliers, single-supplier order, non-'F' status, a blame
tie resolved by name), and Q8's forced big-big customer fallback."""

import numpy as np
import pandas as pd
import pytest

duckdb = pytest.importorskip("duckdb")


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("round5_sf3")
    rng = np.random.default_rng(58)
    n_cust, n_orders, n_li = 16, 140, 500
    region = pd.DataFrame({
        "r_regionkey": np.array([0, 1], dtype=np.int32),
        "r_name": ["AFRICA", "ASIA"]})
    nation = pd.DataFrame({
        "n_nationkey": np.arange(4, dtype=np.int32),
        "n_name": ["NATION_0", "NATION_1", "NATION_2", "NATION_3"],
        "n_regionkey": np.array([0, 0, 1, 1], dtype=np.int32)})
    # custkeys 15,16 never get an order -> Q13's zero bucket
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
        "o_custkey": rng.integers(1, n_cust - 1,
                                  n_orders).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_orders),
        "o_totalprice": np.round(rng.uniform(900, 200_000, n_orders), 2),
        "o_orderdate": pd.Timestamp("1995-06-01")
        + pd.to_timedelta(days, unit="D"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_orders)})
    part = pd.DataFrame({
        "p_partkey": np.arange(1, 45, dtype=np.int64),
        "p_name": [f"part{i}" for i in range(44)],
        "p_brand": [f"Brand#{1 + i % 5}" for i in range(44)],
        "p_type": ["PROMO" if i % 3 == 0 else "STANDARD"
                   for i in range(44)],
        "p_size": (1 + np.arange(44) % 40).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(100, 2000, 44), 2)})
    # partkeys 41..44 are reserved for the Q17 boundary plants: rng
    # lineitems draw partkey <= 40 only
    part.loc[40:43, "p_brand"] = "Brand#2"
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
        "l_returnflag": rng.choice(["R", "N", "A"], n_li),
        "l_linestatus": ["O"] * n_li,
        "l_shipdate": ship})

    # ---- Q17 boundary plants (Brand#2, reserved partkeys) ----
    # part 41: quantities [1, 9] -> n=2, sum=10, 5*1*2 == 10 (NOT small)
    # part 42: quantities [1, 10] -> n=2, sum=11, 5*1*2 < 11 (small)
    # part 43: single row -> 5*q*1 == q*5 > q, never small
    # part 44: no lineitems at all (parts-without-lines edge)
    plant17 = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 1, 1],
        "l_partkey": [41, 41, 42, 42, 43],
        "l_suppkey": [1, 1, 1, 1, 1],
        "l_linenumber": [0, 1, 2, 3, 4],
        "l_quantity": [1.0, 9.0, 1.0, 10.0, 3.0],
        "l_extendedprice": [111.11, 222.22, 333.33, 444.44, 555.55],
        "l_discount": [0.0] * 5, "l_tax": [0.0] * 5,
        "l_returnflag": ["N"] * 5, "l_linestatus": ["O"] * 5,
        "l_shipdate": [pd.Timestamp("1996-06-01")] * 5})

    # ---- Q21 plants (orderkeys beyond the rng range) ----
    base = pd.Timestamp("1999-01-01")
    extra_orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders + 1, n_orders + 7,
                                dtype=np.int64),
        "o_custkey": np.int64(1),
        "o_orderstatus": ["F", "F", "F", "O", "F", "F"],
        "o_totalprice": 1000.0,
        "o_orderdate": base,
        "o_orderpriority": "2-HIGH"})
    late = base + pd.Timedelta(days=120)   # > 90d after orderdate
    ok = base + pd.Timedelta(days=10)
    k0 = n_orders

    def li_row(ok_, sk, sd, ln):
        return {"l_orderkey": np.int64(ok_), "l_partkey": np.int64(1),
                "l_suppkey": np.int64(sk), "l_linenumber": ln,
                "l_quantity": 1.0, "l_extendedprice": 100.0,
                "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
                "l_linestatus": "O", "l_shipdate": sd}

    plant21 = pd.DataFrame([
        # k0+1 (F): sup1 late, sup2 on time  -> blame sup1
        li_row(k0 + 1, 1, late, 0), li_row(k0 + 1, 2, ok, 1),
        # k0+2 (F): sup1 AND sup2 late       -> no blame (two late)
        li_row(k0 + 2, 1, late, 0), li_row(k0 + 2, 2, late, 1),
        # k0+3 (F): only sup3, late          -> excluded (n_s < 2)
        li_row(k0 + 3, 3, late, 0),
        # k0+4 (O): sup4 late, sup5 on time  -> excluded (status)
        li_row(k0 + 4, 4, late, 0), li_row(k0 + 4, 5, ok, 1),
        # k0+5 (F): sup4 late (2 late lines, ONE late supplier), sup5 ok
        li_row(k0 + 5, 4, late, 0), li_row(k0 + 5, 4, late, 1),
        li_row(k0 + 5, 5, ok, 2),
        # k0+6 (F): sup5 late, sup4 ok -> ties sup4/sup5 at numwait=1,
        # resolved by name (sup3 < sup4 alphabetically)
        li_row(k0 + 6, 5, late, 0), li_row(k0 + 6, 4, ok, 1)])
    plant21["l_linenumber"] = plant21["l_linenumber"].astype(np.int32)

    orders = pd.concat([orders, extra_orders], ignore_index=True)
    li = pd.concat([li, plant17, plant21], ignore_index=True)
    for name, df in [("region", region), ("nation", nation),
                     ("customer", cust), ("orders", orders),
                     ("supplier", sup), ("lineitem", li),
                     ("part", part)]:
        df.to_parquet(d / f"{name}.parquet", index=False)
    return str(d)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "orders", "supplier",
              "lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def test_q8_vs_duckdb(sf_dir, monkeypatch):
    from vframe_ray.pipelines.relational import q8_market_share
    got = q8_market_share(sf_dir)
    want = _duck(sf_dir, """
SELECT year(o_orderdate)::BIGINT AS o_year,
       sum(CASE WHEN n2.n_name = 'NATION_2'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                ELSE 0 END)::DOUBLE
       / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS mkt_share
FROM part, supplier, lineitem, orders, customer,
     nation n1, nation n2, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
  AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND p_type = 'PROMO'
GROUP BY o_year ORDER BY o_year""")
    assert len(want) == 2                       # both window years
    assert ((want["mkt_share"] > 0)
            & (want["mkt_share"] < 1)).any()    # genuinely fractional
    pd.testing.assert_frame_equal(got, want)
    # forced big-big path: customer region resolves via a 2nd hash join
    monkeypatch.setenv("VFRAME_RAY_DIM_BROADCAST_MAX_ROWS", "0")
    pd.testing.assert_frame_equal(q8_market_share(sf_dir), want)


def test_q13_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import q13_customer_distribution
    got = q13_customer_distribution(sf_dir)
    want = _duck(sf_dir, """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (SELECT c_custkey, count(o_custkey)::BIGINT AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
    pd.testing.assert_frame_equal(got, want)
    # the two orderless customers populate the zero bucket
    zero = got.loc[got["c_count"] == 0, "custdist"]
    assert len(zero) == 1 and int(zero.iloc[0]) >= 2
    # every customer lands in exactly one bucket
    assert int(got["custdist"].sum()) == 16


def test_q17_boundary_and_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import q17_small_quantity_revenue
    got = q17_small_quantity_revenue(sf_dir, brand="Brand#2")
    want = _duck(sf_dir, """
WITH pl AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#2'),
 st AS (SELECT l_partkey, count(*)::BIGINT AS n,
               sum(q)::BIGINT AS sq FROM pl GROUP BY l_partkey)
SELECT (sum(cents)::DOUBLE / 100) / 7 AS avg_yearly
FROM pl JOIN st USING (l_partkey) WHERE 5 * q * n < sq""")
    pd.testing.assert_frame_equal(got, want)
    # the planted boundary rows: part 42's q=1 row IS small (its
    # 333.33 contributes), part 41's q=1 row sits EXACTLY on the
    # threshold (5*1*2 == 10) and must NOT contribute
    pl = _duck(sf_dir, """
WITH pl AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#2'),
 st AS (SELECT l_partkey, count(*)::BIGINT AS n,
               sum(q)::BIGINT AS sq FROM pl GROUP BY l_partkey)
SELECT l_partkey, cents FROM pl JOIN st USING (l_partkey)
WHERE 5 * q * n < sq""")
    assert 42 in set(pl["l_partkey"]) and 41 not in set(pl["l_partkey"])


def test_q17_absent_brand_is_null(sf_dir):
    from vframe_ray.pipelines.relational import q17_small_quantity_revenue
    got = q17_small_quantity_revenue(sf_dir, brand="Brand#99")
    assert len(got) == 1 and np.isnan(got["avg_yearly"].iloc[0])


def test_q21_vs_duckdb_and_plants(sf_dir):
    from vframe_ray.pipelines.relational import q21_waiting_suppliers
    got = q21_waiting_suppliers(sf_dir)
    want = _duck(sf_dir, """
WITH lo AS (SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'),
 per AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_s,
                count(DISTINCT l_suppkey) FILTER (WHERE late) AS n_late,
                max(l_suppkey) FILTER (WHERE late) AS blame
         FROM lo GROUP BY l_orderkey)
SELECT s_name, count(*)::BIGINT AS numwait
FROM per JOIN supplier ON s_suppkey = blame
WHERE n_s >= 2 AND n_late = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""")
    pd.testing.assert_frame_equal(got, want)
    # planted blame rules, checked directly on the planted orders:
    # sole-late sup1 in k0+1 and sole-late-supplier-with-2-late-lines
    # sup4 in k0+5 count; two-late k0+2, single-supplier k0+3 and
    # status-'O' k0+4 do not
    per = _duck(sf_dir, """
WITH lo AS (SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F' AND l_orderkey > 140)
SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_s,
       count(DISTINCT l_suppkey) FILTER (WHERE late) AS n_late
FROM lo GROUP BY l_orderkey ORDER BY l_orderkey""")
    blamed = per[(per["n_s"] >= 2) & (per["n_late"] == 1)][
        "l_orderkey"].tolist()
    assert blamed == [141, 145, 146]
    assert 144 not in per["l_orderkey"].tolist()   # 'O' status dropped


@pytest.fixture(scope="module")
def events_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("roll_ev")
    rng = np.random.default_rng(9)
    n = 600
    ts = (pd.Timestamp("2024-03-01")
          + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"))
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "event_type": rng.choice(["view", "click"], n),
        "value": rng.uniform(0, 1, n),
        "props": ["{}"] * n})
    # hostile: user 99 active on two days INSIDE one window (their
    # coverage intervals overlap -> the union sweep must not
    # double-count), and a sparse user with isolated days
    extra = pd.DataFrame({
        "event_id": np.arange(n, n + 3, dtype=np.int64),
        "ts": pd.to_datetime(["2024-03-05", "2024-03-07",
                              "2024-03-25"]),
        "user_id": np.int64(99),
        "event_type": "view", "value": 0.5, "props": "{}"})
    pd.concat([ev, extra], ignore_index=True).to_parquet(
        d / "events.parquet", index=False)
    return str(d)


def _brute_rolling(events_dir, w):
    ev = pd.read_parquet(f"{events_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    days = sorted(ev["day"].unique())
    rows = []
    for d in days:
        lo = d - pd.Timedelta(days=w - 1)
        rows.append((d, ev.loc[(ev["day"] >= lo) & (ev["day"] <= d),
                               "user_id"].nunique()))
    return pd.DataFrame(rows, columns=["day", "n_users"]).astype(
        {"day": "datetime64[us]", "n_users": "int64"})


def test_rolling_active_users_vs_brute(events_dir):
    from vframe_ray.pipelines.relational import rolling_active_users
    got = rolling_active_users(events_dir)
    want = _brute_rolling(events_dir, 7)
    pd.testing.assert_frame_equal(got, want)


def test_rolling_window_one_is_plain_dau(events_dir):
    from vframe_ray.pipelines.relational import rolling_active_users
    got = rolling_active_users(events_dir, window_days=1)
    want = _brute_rolling(events_dir, 1)
    pd.testing.assert_frame_equal(got, want)
    # and a huge window saturates at the full distinct-user count
    ev = pd.read_parquet(f"{events_dir}/events.parquet")
    got_all = rolling_active_users(events_dir, window_days=60)
    assert got_all["n_users"].iloc[-1] == ev["user_id"].nunique()


def test_q16_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import (
        q16_parts_supplier_relationship)
    got = q16_parts_supplier_relationship(sf_dir)
    want = _duck(sf_dir, """
SELECT p_brand, p_type, p_size::BIGINT AS p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_size IN (10, 20, 30, 40)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    assert len(want) >= 3
    # duplicate (supplier, part) lines collapse to one relationship
    assert (want["supplier_cnt"] <= 8).all()
    pd.testing.assert_frame_equal(got, want)
    # the excluded brand never appears
    assert "Brand#3" not in set(got["p_brand"])


def test_event_gap_stats_vs_scalar_oracle(events_dir):
    from vframe_ray.pipelines.relational import event_gap_stats
    got = event_gap_stats(events_dir)
    ev = pd.read_parquet(f"{events_dir}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    rows = {}
    for _, g in ev.groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ty = g["event_type"].to_numpy()
        for i in range(len(g) - 1):
            k = (ty[i], ty[i + 1])
            n, s = rows.get(k, (0, 0))
            rows[k] = (n + 1, s + int(t[i + 1] - t[i]))
    want = pd.DataFrame(
        [(a, b, n, s, round((s / n) / 1e6, 6))
         for (a, b), (n, s) in sorted(rows.items())],
        columns=["from_type", "to_type", "n", "total_gap_us",
                 "mean_gap_s"])
    pd.testing.assert_frame_equal(got, want)


def test_role_alternation_on_transcripts_corpus(ray_session):
    # the north-star transcripts schema (conv_id, turn_idx, role, ...)
    # from the seeded fixture corpus, verified against a scalar oracle
    import pyarrow as pa
    import ray.data
    from vframe_ray.corpus import generate_transcripts
    from vframe_ray.stages.sessionize import role_alternation_violations
    tbl = generate_transcripts(3000, seed=5)
    # shuffle input rows: adjacency must come from turn_idx, not order
    rng = np.random.default_rng(3)
    perm = rng.permutation(tbl.num_rows)
    ds = ray.data.from_arrow(tbl.take(pa.array(perm))).repartition(7)
    got = role_alternation_violations(ds).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"])
    rows = []
    for cid, g in df.groupby("conv_id", sort=True):
        r = g["role"].to_numpy()
        rows.append((cid, len(r) - 1,
                     int((r[1:] == r[:-1]).sum())))
    want = pd.DataFrame(rows, columns=["conv_id", "n_pairs",
                                       "n_violations"])
    want[["n_pairs", "n_violations"]] = \
        want[["n_pairs", "n_violations"]].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert got["n_violations"].sum() > 0     # corpus has real stutters


def test_windowed_funnel_beats_greedy_chain(ray_session):
    # user 1: view@0 AND view@50, click@60, window 30 — the greedy
    # earliest chain (0 -> 60, gap 60) fails; the DP converts via the
    # view@50.  user 2: only the early view — must NOT convert.
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.sessionize import event_funnel_windowed
    base = pd.Timestamp("2024-06-01")
    rows = [(1, base, "view"), (1, base + pd.Timedelta(seconds=50), "view"),
            (1, base + pd.Timedelta(seconds=60), "click"),
            (2, base, "view"), (2, base + pd.Timedelta(seconds=60), "click")]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows])})
    parts = event_funnel_windowed(
        ray.data.from_arrow(tbl), steps=("view", "click"),
        window_s=30).to_pandas()
    sums = parts.groupby("step")["n_users_p"].sum()
    assert int(sums[1]) == 2         # both users viewed
    assert int(sums[2]) == 1         # only user 1 converts (via view@50)


def test_windowed_funnel_matches_plain_when_window_huge(events_dir):
    # an effectively infinite window degenerates to the plain funnel
    import ray.data
    from vframe_ray.stages.sessionize import (event_funnel,
                                              event_funnel_windowed)
    ds = ray.data.read_parquet(f"{events_dir}/events.parquet")
    sums = event_funnel_windowed(ds, steps=("view", "click"),
                                 window_s=10**9).to_pandas() \
        .groupby("step")["n_users_p"].sum()
    sums_p = event_funnel(ds, steps=("view", "click")).to_pandas() \
        .groupby("step")["n_users_p"].sum()
    assert list(sums) == list(sums_p)


def test_gini_closed_forms(ray_session, tmp_path):
    # uniform counts -> G = 0 exactly; extreme concentration -> G near
    # (n-1)/n; verified against the scalar rank formula
    from vframe_ray.pipelines.relational import user_activity_gini
    d = tmp_path / "gini"
    d.mkdir()

    def write(counts):
        rows = []
        eid = 0
        for u, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, u))
                eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "user_id"])
        df["ts"] = pd.Timestamp("2024-01-01")
        df["event_type"] = "view"
        df["value"] = 0.5
        df["props"] = "{}"
        df.to_parquet(d / "events.parquet", index=False)

    write([5] * 12)                                   # uniform
    out = user_activity_gini(str(d))
    assert int(out["n_users"][0]) == 12
    assert out["gini_r"][0] == 0.0
    counts = [1] * 9 + [991]                          # concentrated
    write(counts)
    out = user_activity_gini(str(d))
    x = np.sort(np.array(counts))
    n, sx = len(x), x.sum()
    sixi = int((np.arange(1, n + 1) * x).sum())
    want = round((2.0 * sixi) / (float(n) * sx) - (n + 1) / float(n), 6)
    assert out["gini_r"][0] == want and want > 0.85
