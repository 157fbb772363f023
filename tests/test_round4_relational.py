"""Round-4 second wave: Q5 multi-join, bounded/navigation windows,
INTERSECT, month rollup, above-nation-average filter — each against a
plain pandas/duckdb brute force on a hostile synthetic corpus (date
ties, single-order customers, boundary window widths, matching and
mismatching supplier/customer nations)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("round4b_sf")
    rng = np.random.default_rng(7)
    n_cust, n_orders = 12, 120
    cust = pd.DataFrame({
        "c_custkey": np.arange(1, n_cust + 1, dtype=np.int64),
        "c_name": [f"cust{i}" for i in range(n_cust)],
        "c_nationkey": np.array([0, 0, 1, 1, 2, 2, 3, 3, 0, 1, 2, 3],
                                dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": ["BUILDING"] * n_cust})
    # date ties: every 4th order shares a date with its neighbor;
    # customer 12 has exactly one order
    custkeys = np.r_[rng.integers(1, n_cust, n_orders - 1), 12] \
        .astype(np.int64)
    days = rng.integers(0, 365, n_orders)
    dates = (pd.Timestamp("1994-01-01")
             + pd.to_timedelta(days, unit="D")).to_numpy()
    dates[4] = dates[5]          # explicit same-(cust?)-date tie pair
    custkeys[4] = custkeys[5]
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int64),
        "o_custkey": custkeys,
        "o_orderstatus": ["O"] * n_orders,
        "o_totalprice": np.round(rng.uniform(900, 200_000, n_orders), 2),
        "o_orderdate": pd.Series(dates).dt.floor("D"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_orders)})
    nation = pd.DataFrame({
        "n_nationkey": np.arange(4, dtype=np.int32),
        "n_name": ["AAA", "BBB", "CCC", "DDD"],
        "n_regionkey": np.array([0, 0, 1, 1], dtype=np.int32)})
    region = pd.DataFrame({"r_regionkey": np.array([0, 1], dtype=np.int32),
                           "r_name": ["ASIA", "EUROPE"]})
    sup = pd.DataFrame({
        "s_suppkey": np.arange(1, 7, dtype=np.int64),
        "s_name": [f"sup{i}" for i in range(6)],
        "s_nationkey": np.array([0, 1, 2, 3, 0, 1], dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(0, 5000, 6), 2)})
    n_li = 400
    li = pd.DataFrame({
        "l_orderkey": rng.integers(1, n_orders + 1, n_li).astype(np.int64),
        "l_partkey": rng.integers(1, 50, n_li).astype(np.int64),
        "l_suppkey": rng.integers(1, 7, n_li).astype(np.int64),
        "l_linenumber": np.arange(n_li, dtype=np.int32) % 7,
        "l_quantity": rng.integers(1, 50, n_li).astype(float),
        "l_extendedprice": np.round(rng.uniform(100, 90_000, n_li), 2),
        "l_discount": np.round(rng.choice(
            [0.0, 0.02, 0.05, 0.1], n_li), 2),
        "l_tax": np.zeros(n_li),
        "l_returnflag": ["N"] * n_li,
        "l_linestatus": ["O"] * n_li,
        "l_shipdate": pd.Timestamp("1994-06-01")})
    for name, df in [("customer", cust), ("orders", orders),
                     ("nation", nation), ("region", region),
                     ("supplier", sup), ("lineitem", li)]:
        df.to_parquet(d / f"{name}.parquet", index=False)
    return str(d)


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def test_moving_window_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import moving_window_revenue
    got = moving_window_revenue(sf_dir, window=4)
    o = _orders(sf_dir)
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)
    g = o.groupby("o_custkey")["cents"]
    want_sum = g.rolling(4, min_periods=1).sum() \
        .reset_index(drop=True).to_numpy() / 100.0
    want_n = g.rolling(4, min_periods=1).count() \
        .reset_index(drop=True).to_numpy().astype(np.int64)
    assert (got["o_orderkey"].to_numpy()
            == o["o_orderkey"].to_numpy()).all()
    assert got["win_sum"].to_numpy().tolist() == want_sum.tolist()
    assert got["win_n"].to_numpy().tolist() == want_n.tolist()
    # single-order customer: window of itself
    one = got[got["o_custkey"] == 12]
    assert len(one) == 1 and one["win_n"].iloc[0] == 1


def test_order_gap_days_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import order_gap_days
    got = order_gap_days(sf_dir)
    o = _orders(sf_dir).sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]).reset_index(drop=True)
    prev = o.groupby("o_custkey")["o_orderdate"].shift(1)
    want = ((o["o_orderdate"] - prev).dt.days
            .fillna(-1).astype(np.int64).to_numpy())
    assert (got["o_orderkey"].to_numpy()
            == o["o_orderkey"].to_numpy()).all()
    assert got["gap_days"].to_numpy().tolist() == want.tolist()
    # the planted same-date tie inside one customer: gap 0, ordered by key
    assert (got["gap_days"] == 0).any()
    # every customer's first order is the -1 sentinel
    firsts = got.groupby("o_custkey").head(1)
    assert (firsts["gap_days"] == -1).all()


def test_intersect_customers_vs_setop(sf_dir):
    from vframe_ray.pipelines.relational import intersect_customers
    got = intersect_customers(sf_dir, price=190_000.0)
    o = _orders(sf_dir)
    urgent = set(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    high = set(o.loc[o["o_totalprice"] > 190_000.0, "o_custkey"])
    assert got["o_custkey"].tolist() == sorted(urgent & high)
    assert urgent - high or high - urgent   # the op actually filtered


def test_monthly_trend_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import monthly_revenue_trend
    got = monthly_revenue_trend(sf_dir)
    o = _orders(sf_dir)
    o["month"] = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    want = o.groupby("month").agg(
        revenue=("cents", "sum"), n_orders=("cents", "size")) \
        .reset_index().sort_values("month")
    assert got["month"].astype("datetime64[us]").tolist() == \
        want["month"].astype("datetime64[us]").tolist()
    assert got["revenue"].tolist() == \
        (want["revenue"].to_numpy() / 100.0).tolist()
    assert got["n_orders"].tolist() == want["n_orders"].tolist()


def test_above_nation_avg_vs_pandas(sf_dir):
    from vframe_ray.pipelines.relational import above_nation_avg_customers
    got = above_nation_avg_customers(sf_dir)
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    ct = np.round(c["c_acctbal"] * 100).astype(np.int64)
    avg = pd.Series(ct).groupby(c["c_nationkey"]).transform(
        lambda s: s.sum() / len(s))
    want = c.loc[ct.to_numpy() > avg.to_numpy(), "c_custkey"] \
        .sort_values().tolist()
    assert got["c_custkey"].tolist() == want
    assert 0 < len(got) < len(c)


def test_q5_vs_duckdb(sf_dir):
    import duckdb
    from vframe_ray.pipelines.relational import q5_local_supplier_revenue
    got = q5_local_supplier_revenue(sf_dir, region="ASIA",
                                    date_lo="1994-01-01",
                                    date_hi="1995-01-01")
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier",
              "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute("""
        SELECT n_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               / 10000.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1994-01-01'
          AND o_orderdate < TIMESTAMP '1995-01-01'
        GROUP BY n_name ORDER BY revenue DESC""").fetchdf()
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["revenue"].tolist() == want["revenue"].tolist()
    # only ASIA nations appear, and only where cust+supp nations match
    assert set(got["n_name"]) <= {"AAA", "BBB"}
    assert len(got)                      # join is non-empty


def test_q5_empty_region(sf_dir):
    """A region with no matching pairs returns an empty, well-typed
    frame instead of raising."""
    from vframe_ray.pipelines.relational import q5_local_supplier_revenue
    got = q5_local_supplier_revenue(sf_dir, region="EUROPE",
                                    date_lo="2050-01-01",
                                    date_hi="2051-01-01")
    assert list(got.columns) == ["n_name", "revenue"]
    assert len(got) == 0


def test_json_field_rollup(ray_session, tmp_path):
    """Vectorized regex JSON extraction matches per-row json.loads."""
    import json

    from vframe_ray.pipelines.relational import json_field_rollup
    rng = np.random.default_rng(3)
    n = 300
    types = rng.choice(["a", "b", "c"], n)
    ks = rng.integers(-50, 100, n)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01"),
        "user_id": np.zeros(n, dtype=np.int64),
        "event_type": types,
        "value": np.zeros(n),
        "props": [json.dumps({"k": int(k)}) for k in ks]})
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    got = json_field_rollup(str(tmp_path))
    want = pd.DataFrame({"event_type": types, "k": ks}).groupby(
        "event_type", as_index=False).agg(sum_k=("k", "sum"),
                                          n_events=("k", "size"))
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["sum_k"].tolist() == want["sum_k"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()


def test_hash_join_string_keys(ray_session):
    """hash_join on STRING keys (unicode, empty, comma-bearing) matches
    a pandas merge; int path unchanged."""
    import ray.data

    from vframe_ray.stages.joins import hash_join
    left = [{"k": k, "lv": i} for i, k in enumerate(
        ["", "a", "b,b", "ünï", "a", "missing-right", "ünï"])]
    right = [{"k": k, "rv": 10 * i} for i, k in enumerate(
        ["a", "ünï", "", "b,b", "missing-left"])]
    got = hash_join(ray.data.from_items(left).repartition(3),
                    ray.data.from_items(right).repartition(2),
                    key="k", left_cols=["k", "lv"], right_cols=["rv"]) \
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    want = pd.DataFrame(left).merge(pd.DataFrame(right), on="k") \
        .sort_values(["k", "lv"]).reset_index(drop=True)
    assert got[["k", "lv", "rv"]].to_dict("list") == \
        want[["k", "lv", "rv"]].to_dict("list")


def test_degenerate_parameters(ray_session, sf_dir):
    """Window=1 frames equal each row; single-step funnel counts step-1
    users; empty correction list returns an empty typed table."""
    import ray.data

    from vframe_ray.pipelines.relational import moving_window_revenue
    from vframe_ray.stages.sessionize import event_funnel
    got = moving_window_revenue(sf_dir, window=1)
    o = _orders(sf_dir)
    cents = np.round(o["o_totalprice"] * 100).astype(np.int64)
    assert (got["win_n"] == 1).all()
    assert sorted(got["win_sum"].tolist()) == \
        sorted((cents / 100.0).tolist())

    ev = ray.data.from_items([
        {"user_id": 1, "ts": pd.Timestamp("2024-01-01"),
         "event_type": "view"},
        {"user_id": 2, "ts": pd.Timestamp("2024-01-01"),
         "event_type": "click"}])
    parts = event_funnel(ev, steps=("view",)).to_pandas()
    assert parts.groupby("step")["n_users_p"].sum().tolist() == [1]


def test_suggest_corrections_empty_terms(ray_session, tmp_path):
    import ray.data

    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import suggest_corrections
    idx = str(tmp_path / "empty_sugg_idx")
    build_index(ray.data.from_items(
        [{"conv_id": "c0", "turn_idx": 0, "text": "alpha"}]), idx,
        SMALL_CFG)
    out = suggest_corrections(idx, [])
    assert out.num_rows == 0
    assert out.column_names == ["query_term", "suggestion", "df"]


def test_q18_vs_duckdb(sf_dir):
    import duckdb

    from vframe_ray.pipelines.relational import q18_large_orders
    got = q18_large_orders(sf_dir, qty=100.0, k=10)
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute("""
        WITH big AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                     FROM lineitem GROUP BY l_orderkey
                     HAVING sum(l_quantity) > 100)
        SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.sum_qty
        FROM orders o
        JOIN big ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT 10""").fetchdf()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["sum_qty"].tolist() == want["sum_qty"].tolist()
    assert got["c_name"].tolist() == want["c_name"].tolist()
    assert 0 < len(got) <= 10


def test_priority_sequence_ordered_agg(sf_dir):
    from vframe_ray.pipelines.relational import priority_sequence
    got = priority_sequence(sf_dir)
    o = _orders(sf_dir).sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"])
    want = o.groupby("o_custkey").agg(
        n_orders=("o_orderpriority", "size"),
        priority_seq=("o_orderpriority", " ".join)).reset_index()
    assert got["o_custkey"].tolist() == want["o_custkey"].tolist()
    assert got["priority_seq"].tolist() == want["priority_seq"].tolist()
    # the planted same-date tie pair resolves by orderkey on both sides
    assert got["n_orders"].sum() == len(o)
