"""nearest_join — bidirectional nearest-timestamp join vs an O(n·m)
scalar oracle, with the tie ladder planted explicitly: equal distance
before/after -> earlier right ts; duplicate right ts -> smallest id;
keys with no right rows drop."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _brute(left, right):
    rows = []
    for _, l in left.iterrows():
        cand = right[right["k"] == l["k"]]
        if not len(cand):
            continue
        diffs = (cand["ts"].astype("int64")
                 - int(pd.Timestamp(l["ts"]).value // 1000)).abs()
        best = cand.assign(adiff=diffs).sort_values(
            ["adiff", "ts", "rid"]).iloc[0]
        rows.append((l["lid"], l["k"], l["ts"], best["rid"],
                     best["ts"], int(best["adiff"])))
    return pd.DataFrame(rows, columns=["lid", "k", "ts", "nearest_id",
                                       "nearest_ts", "gap_us"]) \
        .sort_values("lid").reset_index(drop=True)


def _mk(ts_us):
    return np.array(ts_us, dtype="datetime64[us]")


def test_nearest_join_vs_brute_and_ties(ray_session):
    from vframe_ray.stages.joins import nearest_join
    rng = np.random.default_rng(47)
    n_l, n_r = 400, 300
    lk = rng.integers(0, 20, n_l).astype(np.int64)
    rk = rng.integers(0, 22, n_r).astype(np.int64)  # some keys right-only
    lts = rng.integers(0, 10**9, n_l).astype(np.int64)
    rts = rng.integers(0, 10**9, n_r).astype(np.int64)
    # key 50: left at t=1000, right at 900 and 1100 (equal distance ->
    # earlier wins); plus duplicate right ts at 900 with ids 7777, 55
    lk = np.r_[lk, [50]]; lts = np.r_[lts, [1000]]
    rk = np.r_[rk, [50, 50, 50]]; rts = np.r_[rts, [900, 1100, 900]]
    # key 60: left rows but NO right rows -> dropped
    lk = np.r_[lk, [60]]; lts = np.r_[lts, [5]]
    lid = np.arange(len(lk), dtype=np.int64)
    rid = np.arange(len(rk), dtype=np.int64) + 10_000
    rid[-3:] = [7777, 4444, 55]          # the t=900 duplicates: 7777, 55
    left = pd.DataFrame({"lid": lid, "k": lk, "ts": _mk(lts)})
    right = pd.DataFrame({"rid": rid, "k": rk, "ts": _mk(rts)})
    want = _brute(left, right)
    # planted assertions: equal distance -> earlier ts (900), and among
    # the two t=900 rows the smaller id (55)
    planted = want[want["k"] == 50].iloc[0]
    assert planted["nearest_ts"] == _mk([900])[0]
    assert planted["nearest_id"] == 55
    assert 60 not in set(want["k"])
    for parts in (1, 6):
        got = nearest_join(
            ray.data.from_pandas(left).repartition(parts),
            ray.data.from_pandas(right).repartition(parts),
            key="k", left_on="ts", right_on="ts",
            left_cols=["lid", "k"], right_id="rid") \
            .to_pandas().sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
