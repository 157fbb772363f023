"""grouped_weighted_median — low weighted median per group against a
scalar oracle, with ties, single-row groups, dominant-weight values,
and repartition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _brute(df, gcols, v, w):
    rows = []
    for g, sub in df.groupby(gcols):
        s = sub.groupby(v, as_index=False)[w].sum().sort_values(v)
        cw = s[w].cumsum().to_numpy()
        tot = cw[-1]
        val = s[v].to_numpy()[np.argmax(2 * cw >= tot)]
        rows.append((*(g if isinstance(g, tuple) else (g,)), val))
    return pd.DataFrame(rows, columns=[*gcols, "wm"]) \
        .sort_values(gcols).reset_index(drop=True)


def test_grouped_weighted_median_vs_brute(ray_session):
    from vframe_ray.stages.stats import grouped_weighted_median
    rng = np.random.default_rng(7)
    n = 2000
    t = pa.table({
        "g1": pa.array(rng.choice(["a", "b", "c"], n)),
        "g2": pa.array(rng.integers(0, 2, n).astype(np.int64)),
        "v": pa.array(rng.integers(100, 140, n).astype(np.int64)),
        "w": pa.array(rng.integers(1, 9, n).astype(np.int64))})
    df = t.to_pandas()
    want = _brute(df, ["g1", "g2"], "v", "w")
    for parts in (1, 7):
        got = grouped_weighted_median(
            ray.data.from_arrow(t).repartition(parts),
            group_cols=("g1", "g2"), value_col="v", weight_col="w",
            out_col="wm")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_weighted_median_edges(ray_session):
    from vframe_ray.stages.stats import grouped_weighted_median
    t = pa.table({
        "g": pa.array(["solo", "dom", "dom", "dom", "even", "even"]),
        "v": pa.array([5, 1, 2, 3, 10, 20], pa.int64()),
        # "dom": weight mass at v=1 (2*6 >= 8) -> median 1
        # "even": 2*1 < 2? no: cumw(10)=1, tot=2, 2*1>=2 -> LOW median 10
        "w": pa.array([4, 6, 1, 1, 1, 1], pa.int64())})
    got = grouped_weighted_median(
        ray.data.from_arrow(t), group_cols=("g",), value_col="v",
        weight_col="w", out_col="wm")
    assert dict(zip(got["g"], got["wm"])) == {
        "solo": 5, "dom": 1, "even": 10}
