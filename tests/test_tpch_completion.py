"""TPC-H completion wave (Q2/Q9/Q11/Q12/Q19/Q20 shapes) on a hostile
synthetic corpus: argmin ties across suppliers and across lines (Q2),
the strict-inequality boundaries (Q11 value == threshold, Q20 supplier
at EXACTLY half a part's volume, Q12 line at exactly late_days), a
negative-profit part (Q9), and overlapping disjuncts that must not
double-count (Q19).  Each engine pipeline is compared against the SAME
oracle SQL the driver runs (`__ray_entry__.oracle_sql()`), executed by
DuckDB over the synthetic tables — one corpus exercises both sides."""

import numpy as np
import pandas as pd
import pytest

duckdb = pytest.importorskip("duckdb")


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("tpch_sf")
    pd.DataFrame({"r_regionkey": [0, 1],
                  "r_name": ["EUROPE", "ASIA"]}) \
        .to_parquet(d / "region.parquet", index=False)
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_name": ["NATION_1", "NATION_3", "NATION_9"],
                  "n_regionkey": [0, 0, 1]}) \
        .to_parquet(d / "nation.parquet", index=False)
    pd.DataFrame({
        "s_suppkey": [1, 2, 3, 4],
        "s_name": [f"Supplier#{i}" for i in (1, 2, 3, 4)],
        "s_nationkey": [0, 1, 2, 0],      # 3 is outside EUROPE
        "s_acctbal": [100.0, 100.0, 50.0, -7.25],  # acctbal TIE 1 vs 2
    }).to_parquet(d / "supplier.parquet", index=False)
    pd.DataFrame({
        "p_partkey": [10, 11, 12, 13],
        "p_name": ["small ring", "small bolt", "red gear", "hot rod"],
        "p_brand": ["Brand#12", "Brand#23", "Brand#5", "Brand#12"],
        "p_type": ["SMALL", "SMALL", "ECONOMY", "SMALL"],
        "p_size": [15, 15, 5, 4],         # 13 fails the size filter
        "p_retailprice": [1000.00, 2000.00, 50000.00, 10.00],
    }).to_parquet(d / "part.parquet", index=False)
    pd.DataFrame({
        "o_orderkey": [100, 101, 102],
        "o_custkey": [1, 1, 2],
        "o_orderstatus": ["F", "O", "F"],
        "o_totalprice": [1000.0, 2000.0, 3000.0],
        "o_orderdate": pd.to_datetime(
            ["1996-01-01", "1996-03-01", "1996-05-01"]),
        "o_orderpriority": ["1-URGENT", "3-MEDIUM", "2-HIGH"],
    }).to_parquet(d / "orders.parquet", index=False)
    li = pd.DataFrame({
        # part 10: suppliers 1 and 2 TIE at min cost 500.00 (supplier 2
        #   also has a worse line); part 11: supplier 4 alone.
        # Q20 window: supplier 1 ships EXACTLY half of part 10's
        #   quantity (must NOT qualify), supplier 2 ships 2/3 of part
        #   11's (qualifies); Q12: line at exactly 60 days is FAST.
        "l_orderkey": [100, 100, 101, 101, 102, 102, 100],
        "l_partkey":  [10,  10,  10,  11,  11,  12,  13],
        "l_suppkey":  [1,   2,   2,   4,   2,   3,   1],
        "l_linenumber": [1, 2, 1, 2, 1, 2, 3],
        "l_quantity": [4.0, 4.0, 4.0, 2.0, 4.0, 25.0, 3.0],
        "l_extendedprice": [500.00, 500.00, 600.00, 700.00,
                            800.00, 900.00, 30.00],
        "l_discount": [0.05, 0.00, 0.10, 0.00, 0.02, 0.04, 0.00],
        "l_tax": [0.0] * 7,
        "l_returnflag": ["N"] * 7,
        "l_linestatus": ["O"] * 7,
        "l_shipdate": pd.to_datetime(
            ["1996-03-01",   # 60 days after 1996-01-01 -> FAST
             "1996-03-02",   # 61 days -> SLOW
             "1996-03-05", "1996-04-01", "1996-06-01",
             "1996-06-15", "1996-02-01"]),
    })
    li.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def _oracle(sf_dir, key):
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "orders",
              "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    return con.sql(E.oracle_sql()[key]).df()


def _check(sf_dir, key, fn, **kw):
    got = fn(sf_dir, **kw).reset_index(drop=True)
    want = _oracle(sf_dir, key)
    for c in want.columns:
        if want[c].dtype != got[c].dtype and \
                str(want[c].dtype).startswith("int"):
            want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)
    return got


def test_q2_argmin_ties(sf_dir):
    from vframe_ray.pipelines.relational import q2_min_cost_supplier
    got = _check(sf_dir, "q2_min_cost_supplier", q2_min_cost_supplier)
    # both tied suppliers of part 10 survive; the acctbal tie breaks
    # on s_name; part 13 (wrong size) and supplier 3 (wrong region)
    # never appear
    assert list(got["p_partkey"]) == [10, 10, 11]
    assert list(got["s_name"])[:2] == ["Supplier#1", "Supplier#2"]
    assert got["min_cost"].iloc[0] == 500.0


def test_q9_profit_sign(sf_dir):
    from vframe_ray.pipelines.relational import q9_product_type_profit
    got = _check(sf_dir, "q9_product_type_profit",
                 q9_product_type_profit)
    # only part 12 matches '%red%'; retail 50000 * qty 25 dwarfs the
    # line revenue -> profit is NEGATIVE and must survive exactly
    assert len(got) == 1
    assert got["sum_profit"].iloc[0] < 0


def test_q11_threshold_strict(sf_dir):
    from vframe_ray.pipelines.relational import q11_important_parts
    # NATION_3 = supplier 2 only; parts 10 (500*100 + 600*90 = 104000
    # cents4-ish) and 11 (800*98).  With denom=2 the test is
    # val*2 > total: the larger passes, the smaller fails; a part at
    # EXACTLY half (not constructible here with distinct sums) would
    # fail the strict >.
    got = q11_important_parts(sf_dir, frac_denom=2)
    assert list(got["p_partkey"]) == [10]
    # parity with the driver oracle at the default denom
    _check(sf_dir, "q11_important_parts", q11_important_parts)


def test_q12_late_boundary(sf_dir):
    from vframe_ray.pipelines.relational import q12_ship_latency
    got = _check(sf_dir, "q12_ship_latency", q12_ship_latency)
    row = got.set_index("ship_class")
    # the 60-day line is FAST (strict >); the 61-day line is SLOW
    assert row.loc["FAST", "high_line_count"] >= 1
    assert row.loc["SLOW", "high_line_count"] == 1


def test_q19_no_double_count(sf_dir):
    from vframe_ray.pipelines.relational import q19_disjunctive_revenue
    got = _check(sf_dir, "q19_disjunctive_revenue",
                 q19_disjunctive_revenue)
    # part 10 (Brand#12 size 15): NOT in size 1..5 -> excluded; part
    # 12 (Brand#5 size 5, qty 25 in 20..30) -> 900*0.96 = 864; part 13
    # (Brand#12 size 4, qty 3 in 1..11) -> 30; a line matching two
    # overlapping terms would still count once (OR)
    assert got["revenue"].iloc[0] == pytest.approx(894.0)


def test_q20_half_boundary(sf_dir):
    from vframe_ray.pipelines.relational import q20_promotion_suppliers
    got = _check(sf_dir, "q20_promotion_suppliers",
                 q20_promotion_suppliers)
    # supplier 1 ships exactly half of part 10 -> strict > excludes it
    assert list(got["s_name"]) == []
    # supplier 2 dominates part 11 (4 of 6) and part 10 (8 of 12) but
    # sits in NATION_3
    got3 = q20_promotion_suppliers(sf_dir, nation="NATION_3")
    assert list(got3["s_name"]) == ["Supplier#2"]
