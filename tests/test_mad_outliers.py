"""grouped_mad_outliers — per-group median/MAD flags against a scalar
oracle, with planted outliers, all-identical groups (MAD 0), and
repartition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _low_median(vals, weights):
    order = np.argsort(vals, kind="stable")
    v, w = np.asarray(vals)[order], np.asarray(weights)[order]
    cum = np.cumsum(w)
    return v[np.argmax(2 * cum >= cum[-1])]


def _brute(df, k):
    rows = []
    for g, sub in df.groupby("g"):
        med = _low_median(sub["v"].to_numpy(), np.ones(len(sub)))
        dev = np.abs(sub["v"].to_numpy() - med)
        mad = _low_median(dev, np.ones(len(sub)))
        fl = sub[np.abs(sub["v"] - med) > k * mad]
        for _, r in fl.iterrows():
            rows.append((r["id"], g, r["v"], med, mad))
    return pd.DataFrame(rows, columns=["id", "g", "v", "med", "mad"]) \
        .sort_values("id").reset_index(drop=True)


def test_mad_outliers_vs_brute_and_repartition(ray_session):
    from vframe_ray.stages.stats import grouped_mad_outliers
    rng = np.random.default_rng(11)
    n = 1500
    g = rng.choice(["a", "b", "c"], n)
    v = rng.integers(1000, 1100, n).astype(np.int64)
    # plant extreme values in group a
    v[np.flatnonzero(g == "a")[:5]] = [5000, 6000, -900, 7000, 9999]
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "g": pa.array(g), "v": pa.array(v)})
    df = t.to_pandas()
    want = _brute(df, k=3)
    assert len(want) >= 5          # the planted extremes must flag
    for parts in (1, 6):
        got = grouped_mad_outliers(
            ray.data.from_arrow(t).repartition(parts),
            group_cols=("g",), value_col="v", id_col="id", k=3) \
            .to_pandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mad_outliers_degenerate_group(ray_session):
    """A group of identical values has MAD 0: every deviating row
    flags (|v-med| > 0), identical rows never do."""
    from vframe_ray.stages.stats import grouped_mad_outliers
    t = pa.table({"id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "g": pa.array(["x"] * 5),
                  "v": pa.array([7, 7, 7, 7, 8], pa.int64())})
    got = grouped_mad_outliers(
        ray.data.from_arrow(t), group_cols=("g",), value_col="v",
        id_col="id", k=2).to_pandas()
    assert got["id"].tolist() == [4]
    assert got["med"].tolist() == [7] and got["mad"].tolist() == [0]
