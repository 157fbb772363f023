"""Weighted (Poisson) hash sampling with Horvitz-Thompson weights."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _brute_membership(ids, weights, scale, denom):
    """Per-row Python recompute of the sampling rule (the oracle)."""
    out = {}
    for i, w in zip(ids, weights):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:16], 16) % denom
        thr = min(max(math.floor(w * scale), 0), denom)
        if h < thr:
            out[i] = denom / thr
    return out


def test_weighted_sample_matches_brute_force(ray_session):
    from vframe_ray.stages.sampling import weighted_hash_sample
    rng_vals = [(i * 37 % 500) / 3.0 for i in range(2000)]  # 0 .. ~166
    t = pa.table({"event_id": pa.array(range(2000), pa.int64()),
                  "value": pa.array(rng_vals, pa.float64())})
    got = weighted_hash_sample(
        ray.data.from_arrow(t), weight_col="value", id_col="event_id",
        scale=2000.0, denom=1_000_000).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _brute_membership(range(2000), rng_vals, 2000.0, 1_000_000)
    assert dict(zip(got.event_id, got.ht_weight)) == pytest.approx(want)
    # HT estimator: sum of 1/p over the kept rows estimates the count of
    # rows with p > 0 (deterministic given md5, so no flake)
    n_possible = sum(1 for v in rng_vals if v > 0)
    assert abs(got.ht_weight.sum() - n_possible) / n_possible < 0.25


def test_weighted_sample_pure_under_repartition(ray_session):
    from vframe_ray.stages.sampling import weighted_hash_sample
    t = pa.table({"event_id": pa.array(range(500), pa.int64()),
                  "value": pa.array([float(i % 300) for i in range(500)])})
    kw = dict(weight_col="value", id_col="event_id",
              scale=2000.0, denom=1_000_000)
    a = weighted_hash_sample(ray.data.from_arrow(t), **kw).to_pandas()
    b = weighted_hash_sample(
        ray.data.from_arrow(t).repartition(7), **kw).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_id").reset_index(drop=True),
        b.sort_values("event_id").reset_index(drop=True))


def test_weighted_sample_edges(ray_session):
    from vframe_ray.stages.sampling import weighted_hash_sample
    # weight >= denom/scale -> certainty (p=1, ht_weight=1); w<=0 -> dropped
    t = pa.table({"event_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "value": pa.array([1e9, 600.0, 0.0, -5.0])})
    got = weighted_hash_sample(
        ray.data.from_arrow(t), weight_col="value", id_col="event_id",
        scale=2000.0, denom=1_000_000).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(got.event_id) == [1, 2]
    assert list(got.ht_weight) == [1.0, 1.0]
    assert np.isfinite(got.ht_weight).all()


def _brute_group_sample(df, k):
    import hashlib
    rows = []
    for g, sub in df.groupby("event_type"):
        hs = sorted(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                            "big"), i)
            for i in sub["event_id"])
        for r, (_, i) in enumerate(hs[:k], start=1):
            u = int(sub.loc[sub["event_id"] == i, "user_id"].iloc[0])
            rows.append((g, r, i, u))
    return pd.DataFrame(rows, columns=["event_type", "rnk", "event_id",
                                       "user_id"])


def test_group_topk_sample_vs_brute_and_repartition(ray_session):
    """Exact-k per group == a scalar md5 oracle; membership must be
    invariant to block structure (per-block partial top-k merges to
    the same global answer); groups smaller than k return all rows."""
    from vframe_ray.stages.sampling import group_topk_sample
    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
        "event_type": pa.array(
            ["big"] * 480 + ["tiny"] * 17 + ["mid"] * 3)})
    df = t.to_pandas()
    want = _brute_group_sample(df, k=7)
    kw = dict(group_col="event_type", id_col="event_id", k=7,
              extra_cols=("user_id",))
    got = group_topk_sample(ray.data.from_arrow(t), **kw)
    pd.testing.assert_frame_equal(got, want)
    # 3-row group returns all 3 at ranks 1..3
    assert (got[got["event_type"] == "mid"]["rnk"].to_list() == [1, 2, 3])
    got2 = group_topk_sample(ray.data.from_arrow(t).repartition(11), **kw)
    pd.testing.assert_frame_equal(got2, want)
