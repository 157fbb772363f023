"""Round-5 grouped-stats wave: trimmed mean, mode, top-n sum,
percent_rank, RANGE time window — each against a scalar brute-force
oracle, with repartition invariance and the edge cases the kernels must
survive (trim swallowing a whole group, mode ties, tied dates in the
RANGE frame, single-row percent_rank partitions)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


# ---------------------------------------------------------------- trimmed

def _brute_trimmed(df, frac):
    rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        d = int(len(v) * frac)
        kept = v[d:len(v) - d]
        if len(kept):
            rows.append((g, len(kept), int(kept.sum()),
                         float(kept.sum()) / len(kept)))
    return pd.DataFrame(rows, columns=["g", "n_kept", "trimmed_sum",
                                       "tmean"]) \
        .sort_values("g").reset_index(drop=True)


def test_trimmed_mean_vs_brute_and_repartition(ray_session):
    from vframe_ray.stages.stats import grouped_trimmed_mean
    rng = np.random.default_rng(5)
    n = 2000
    g = rng.choice(["a", "b", "c", "d"], n)
    v = rng.integers(-500, 5000, n).astype(np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    want = _brute_trimmed(t.to_pandas(), 0.1)
    for parts in (1, 7):
        got = grouped_trimmed_mean(
            ray.data.from_arrow(t).repartition(parts),
            group_cols=("g",), value_col="v", trim_frac=0.1)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_trimmed_mean_trim_swallows_group(ray_session):
    """trim 0.5 on a 2-row group drops 1 row each side: n_kept == 0 and
    the group vanishes, matching the oracle's empty rank band; a 1-row
    group keeps its row (d = 0)."""
    from vframe_ray.stages.stats import grouped_trimmed_mean
    t = pa.table({"g": pa.array(["x", "x", "y"]),
                  "v": pa.array([1, 9, 7], type=pa.int64())})
    got = grouped_trimmed_mean(ray.data.from_arrow(t),
                               group_cols=("g",), value_col="v",
                               trim_frac=0.5)
    assert list(got["g"]) == ["y"]
    assert list(got["trimmed_sum"]) == [7]


def test_trimmed_mean_heavy_tie_bin(ray_session):
    """One value bin larger than n-2d is eaten from BOTH ends — the
    clip must not go negative."""
    from vframe_ray.stages.stats import grouped_trimmed_mean
    v = np.array([1] + [5] * 8 + [9], dtype=np.int64)   # d = 3
    t = pa.table({"g": pa.array(["x"] * 10), "v": pa.array(v)})
    got = grouped_trimmed_mean(ray.data.from_arrow(t),
                               group_cols=("g",), value_col="v",
                               trim_frac=0.3)
    want = _brute_trimmed(t.to_pandas(), 0.3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------------------------- mode

def _brute_mode(df):
    rows = []
    for g, sub in df.groupby("g"):
        cnt = sub.groupby("v").size()
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rows.append((g, best[0], best[1]))
    return pd.DataFrame(rows, columns=["g", "mode", "mode_n"]) \
        .sort_values("g").reset_index(drop=True)


def test_mode_vs_brute_with_ties(ray_session):
    from vframe_ray.stages.stats import grouped_mode
    rng = np.random.default_rng(7)
    n = 1200
    g = rng.integers(0, 40, n).astype(np.int64)
    v = rng.choice(["click", "view", "buy", "error"], n)
    # plant an exact tie in group 0: equal counts of 'aa' and 'zz'
    g = np.r_[g, np.full(6, 99, np.int64)]
    v = np.r_[v, ["zz", "aa", "zz", "aa", "zz", "aa"]]
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    want = _brute_mode(t.to_pandas())
    tie = want[want["g"] == 99]
    assert list(tie["mode"]) == ["aa"]          # tie -> smallest value
    for parts in (1, 5):
        got = grouped_mode(ray.data.from_arrow(t).repartition(parts),
                           group_cols=("g",), value_col="v")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------------------- top-n sum

def _brute_topn(df, k):
    rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())[::-1]
        rows.append((g, int(v[:k].sum()), min(k, len(v))))
    return pd.DataFrame(rows, columns=["g", "topn_sum", "n_top"]) \
        .sort_values("g").reset_index(drop=True)


def test_topn_sum_vs_brute_and_repartition(ray_session):
    from vframe_ray.stages.stats import grouped_topn_sum
    rng = np.random.default_rng(3)
    n = 1500
    g = rng.integers(0, 200, n).astype(np.int64)     # some groups < n=3
    v = rng.integers(-100, 10000, n).astype(np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    want = _brute_topn(t.to_pandas(), 3)
    for parts in (1, 9):
        got = grouped_topn_sum(ray.data.from_arrow(t).repartition(parts),
                               group_col="g", value_col="v", n=3)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_topn_sum_under_k_group(ray_session):
    from vframe_ray.stages.stats import grouped_topn_sum
    t = pa.table({"g": pa.array(["only"]),
                  "v": pa.array([42], type=pa.int64())})
    got = grouped_topn_sum(ray.data.from_arrow(t), group_col="g",
                           value_col="v", n=5)
    assert list(got["topn_sum"]) == [42]
    assert list(got["n_top"]) == [1]


# ----------------------------------------------------------- percent_rank

def test_percent_rank_matches_pandas(ray_session, tmp_path):
    """acctbal_percent_rank vs pandas rank(method='min'): ties share the
    min rank; a single-customer nation gets 0.0."""
    import pyarrow.parquet as pq
    from vframe_ray.pipelines.relational import acctbal_percent_rank
    rng = np.random.default_rng(13)
    n = 400
    nat = rng.integers(0, 8, n).astype(np.int64)
    bal = (rng.integers(0, 500, n) / 7.0).round(2)
    # nation 50: exactly one row -> pct_rank 0.0
    nat = np.r_[nat, [50]]
    bal = np.r_[bal, [12.34]]
    df = pd.DataFrame({"c_custkey": np.arange(len(nat), dtype=np.int64),
                       "c_nationkey": nat, "c_acctbal": bal,
                       "c_name": "x", "c_mktsegment": "y"})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "customer.parquet"))
    got = acctbal_percent_rank(str(tmp_path))
    cents = np.round(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
    df["cents"] = cents
    rank = df.groupby("c_nationkey")["cents"].rank(method="min")
    nn = df.groupby("c_nationkey")["cents"].transform("size")
    want_pct = np.where(nn > 1, (rank - 1) / np.maximum(nn - 1, 1), 0.0)
    want = pd.DataFrame({"c_custkey": df["c_custkey"],
                         "c_nationkey": df["c_nationkey"],
                         "bal_cents": cents, "pct_rank": want_pct}) \
        .sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[got["c_nationkey"] == 50, "pct_rank"].iloc[0] == 0.0


# ------------------------------------------------------------ RANGE window

def test_range_window_vs_brute_with_date_ties(ray_session, tmp_path):
    """Trailing 30-day RANGE window vs an O(n^2) scalar oracle; two
    orders on the SAME date must both see the full tied set (RANGE, not
    ROWS, semantics)."""
    import pyarrow.parquet as pq
    from vframe_ray.pipelines.relational import range_window_revenue
    rng = np.random.default_rng(29)
    n = 600
    cust = rng.integers(0, 25, n).astype(np.int64)
    day = rng.integers(0, 200, n)
    # force date ties inside customer 0
    cust[:4] = 0
    day[:4] = [50, 50, 50, 61]
    dates = (np.datetime64("2024-01-01", "us")
             + day.astype("timedelta64[D]").astype("timedelta64[us]"))
    price = (rng.integers(100, 100000, n) / 100.0)
    df = pd.DataFrame({"o_orderkey": np.arange(n, dtype=np.int64),
                       "o_custkey": cust,
                       "o_orderstatus": "O",
                       "o_totalprice": price,
                       "o_orderdate": dates,
                       "o_orderpriority": "1-URGENT"})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    got = range_window_revenue(str(tmp_path), days=30)
    cents = np.round(price * 100).astype(np.int64)
    win = np.int64(30) * 86_400_000_000
    us = dates.astype(np.int64)
    want_rows = []
    for i in range(n):
        sel = (cust == cust[i]) & (us >= us[i] - win) & (us <= us[i])
        want_rows.append((cust[i], i, dates[i], int(cents[sel].sum())))
    want = pd.DataFrame(want_rows, columns=["o_custkey", "o_orderkey",
                                            "o_orderdate", "win_cents"]) \
        .sort_values(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the three tied-date orders of customer 0 share one frame sum
    tied = got[(got["o_custkey"] == 0) & (got["o_orderkey"] < 3)]
    assert tied["win_cents"].nunique() == 1


# -------------------------------------------------------- balance sample

def test_balance_downsample_equalizes_groups(ray_session):
    """Every group lands at exactly min-group-size rows; membership is
    repartition-invariant and a pure function of the rows."""
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.sampling import balance_downsample
    rng = np.random.default_rng(19)
    g = np.r_[np.repeat("big", 300), np.repeat("mid", 90),
              np.repeat("small", 17)]
    ids = rng.permutation(len(g)).astype(np.int64)
    t = pa.table({"g": pa.array(g), "id": pa.array(ids)})
    outs = []
    for parts in (1, 5):
        out = balance_downsample(
            ray.data.from_arrow(t).repartition(parts),
            group_col="g", id_col="id")
        assert out.attrs["k"] == 17
        assert (out.groupby("g").size() == 17).all()
        outs.append(out.reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_quality_weighted_sample_composition(ray_session):
    """The composed scoring->sampling pipeline is repartition-invariant
    and its HT weights equal denom/floor(w*scale) exactly."""
    import __ray_entry__ as e
    outs = []
    for _ in range(2):
        out = e.queries()["quality_weighted_sample"](
            "/root/testdata/sf0.001")
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    thr = np.minimum(np.floor(out["w"].to_numpy() * e.QW_SCALE),
                     float(e.QW_DENOM))
    assert np.array_equal(out["ht_weight"].to_numpy(),
                          float(e.QW_DENOM) / thr)
    assert (out["w"] > 0).all()


def test_dedup_keep_best_picks_highest_quality(ray_session):
    """Every cluster keeps exactly one member, and it is the member
    with the maximal score (ties -> smallest id)."""
    import __ray_entry__ as e
    out = e.queries()["dedup_keep_best"]("/root/testdata/sf0.001")
    assert len(out)                      # clusters exist in the corpus
    for cid, sub in out.groupby("cluster_id"):
        kept = sub[sub["keep"] == 1]
        assert len(kept) == 1
        best = sub.sort_values(["score_r", "doc_id"],
                               ascending=[False, True]).iloc[0]
        assert kept["doc_id"].iloc[0] == best["doc_id"]


def test_priority_sample_exact_k_bias_invariance(ray_session):
    """Weighted exact-k: always exactly k rows, repartition-invariant,
    heavy-weight rows overrepresented, non-positive weights never
    sampled."""
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.sampling import priority_sample
    rng = np.random.default_rng(71)
    n = 4000
    w = np.where(np.arange(n) % 10 == 0, 50.0, 1.0)   # 10% heavy
    w[:5] = 0.0                                       # excluded
    w[5] = -3.0
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "w": pa.array(w)})
    outs = []
    for parts in (1, 7):
        out = priority_sample(ray.data.from_arrow(t).repartition(parts),
                              weight_col="w", id_col="id", k=400)
        assert len(out) == 400
        assert not set(out["id"]) & set(range(6))
        outs.append(out.reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    heavy_frac = (outs[0]["id"] % 10 == 0).mean()
    assert heavy_frac > 0.5        # 10% of rows, 50x weight -> majority
