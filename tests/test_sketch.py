"""HyperLogLog sketch laws: accuracy within the p=12 error bound on
both estimator branches, merge = register max = sketch of the union,
idempotence, and the Dataset-level grouped estimate vs exact distinct
counts on real data."""

import numpy as np

from vframe_ray.stages.sketch import (HLL_M, hll_distinct_by_key,
                                      hll_estimate, hll_merge,
                                      hll_registers)


def _strs(lo, hi):
    return [str(i) for i in range(lo, hi)]


def test_accuracy_raw_branch():
    """100k distinct values: raw estimator branch, relative error well
    inside 5σ of the theoretical 1.04/√4096 ≈ 1.6%."""
    n = 100_000
    est = hll_estimate(hll_registers(_strs(0, n)))
    assert est > 2.5 * HLL_M             # raw branch taken
    assert abs(est - n) / n < 0.05


def test_accuracy_linear_counting_branch():
    """500 distinct values: small-range (linear counting) branch."""
    n = 500
    est = hll_estimate(hll_registers(_strs(0, n)))
    assert est <= 2.5 * HLL_M
    assert abs(est - n) / n < 0.05


def test_merge_is_union_and_idempotent():
    a = hll_registers(_strs(0, 30_000))
    b = hll_registers(_strs(20_000, 60_000))
    u = hll_registers(_strs(0, 60_000))
    assert (hll_merge(a, b) == u).all()
    assert (hll_merge(a, a) == a).all()
    # duplicates never move the estimate
    assert hll_estimate(hll_registers(_strs(0, 1000) * 7)) == \
        hll_estimate(hll_registers(_strs(0, 1000)))


def test_partial_merge_equals_single_pass():
    """Block-partial max-merge (the distributed shape) == one-shot
    registers, regardless of how the input splits."""
    vals = _strs(0, 10_000)
    whole = hll_registers(vals)
    parts = [hll_registers(vals[i::4]) for i in range(4)]
    merged = parts[0]
    for p in parts[1:]:
        merged = hll_merge(merged, p)
    assert (merged == whole).all()


def test_grouped_estimate_vs_exact(ray_session):
    import pandas as pd

    from vframe_ray.sources.readers import read_parquet
    sf = "/root/testdata/sf0.001"
    ds = read_parquet(f"{sf}/events.parquet",
                      columns=["event_type", "user_id"])
    got = hll_distinct_by_key(ds, "event_type", "user_id").to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    assert list(got["event_type"]) == sorted(exact.index)
    for _, r in got.iterrows():
        tru = exact[r["event_type"]]
        assert abs(r["est"] - tru) / tru < 0.08


def _tok_ds(texts):
    import ray.data

    from vframe_ray.stages.tokenize import tokenize
    rows = [{"conv_id": f"c{i}", "turn_idx": 0, "text": t}
            for i, t in enumerate(texts)]
    return tokenize(ray.data.from_items(rows))


def test_cms_overestimates_never_miss(ray_session):
    """Hostile: width=8 forces collisions among 40 distinct terms.
    Every estimate must still be >= the true count (one-sided error),
    and every TRUE heavy hitter must be in the output."""
    import collections

    from vframe_ray.stages.sketch import cms_heavy_hitters
    texts = (["needle"] * 200 + [f"w{i}" for i in range(40)] * 3)
    true = collections.Counter(texts)
    n = len(texts)
    got = cms_heavy_hitters(_tok_ds([" ".join(texts[i::7])
                                     for i in range(7)]),
                            width=8, depth=2, denom=10).to_pandas()
    thresh = n // 10 + 1
    est = dict(zip(got["term"], got["est_count"]))
    for t, e in est.items():
        assert e >= true[t]
    for t, c in true.items():
        if c >= thresh:
            assert t in est                # no false negatives
    assert "needle" in est


def test_cms_split_invariance(ray_session):
    """The sketch is linear: any block split yields the same matrix,
    hence the same output."""
    from vframe_ray.stages.sketch import cms_heavy_hitters
    words = ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 2
    one = cms_heavy_hitters(_tok_ds([" ".join(words)]),
                            denom=20).to_pandas()
    many = cms_heavy_hitters(_tok_ds([" ".join(words[i::11])
                                      for i in range(11)]),
                             denom=20).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(one, many)
    assert set(one["term"]) == {"alpha", "beta"}   # gamma below 1/20


def test_cms_wide_sketch_is_exact(ray_session):
    """With width >> vocabulary, no collisions: estimates equal true
    counts exactly."""
    import collections

    from vframe_ray.stages.sketch import cms_heavy_hitters
    words = ["a"] * 9 + ["b"] * 6 + ["c"] * 5
    true = collections.Counter(words)
    got = cms_heavy_hitters(_tok_ds([" ".join(words)]),
                            width=4096, depth=4, denom=4).to_pandas()
    for _, r in got.iterrows():
        assert r["est_count"] == true[r["term"]]


def test_kmv_accuracy_and_overlap():
    from vframe_ray.stages.sketch import (kmv_distinct, kmv_overlap,
                                          kmv_partial)
    a = kmv_partial(_strs(0, 5000))
    b = kmv_partial(_strs(2500, 7500))
    assert abs(kmv_distinct(a) - 5000) / 5000 < 0.3   # k=128 -> ~9% sigma
    assert abs(kmv_overlap(a, b) - 2500) / 2500 < 0.4
    # disjoint sets -> tiny (usually zero) overlap estimate
    c = kmv_partial(_strs(100_000, 105_000))
    assert kmv_overlap(a, c) < 500


def test_kmv_exact_below_k():
    from vframe_ray.stages.sketch import (KMV_K, kmv_distinct,
                                          kmv_overlap, kmv_partial)
    a = kmv_partial(_strs(0, 100))
    b = kmv_partial(_strs(50, 150))
    assert len(a) == 100 < KMV_K
    assert kmv_distinct(a) == 100.0           # exact branch
    assert kmv_overlap(a, b) == 50.0          # exact intersection
    # empty side
    e = kmv_partial([])
    assert kmv_distinct(e) == 0.0 and kmv_overlap(a, e) == 0.0


def test_kmv_merge_associative():
    from vframe_ray.stages.sketch import kmv_merge, kmv_partial
    vals = _strs(0, 3000)
    whole = kmv_partial(vals)
    m = kmv_partial(vals[0::3])
    m = kmv_merge(m, kmv_partial(vals[1::3]))
    m = kmv_merge(m, kmv_partial(vals[2::3]))
    assert (m == whole).all()


def test_kmv_dataset_overlap_vs_exact(ray_session):
    import pandas as pd

    from vframe_ray.sources.readers import read_parquet
    from vframe_ray.stages.sketch import kmv_user_overlap
    sf = "/root/testdata/sf0.001"
    ds = read_parquet(f"{sf}/events.parquet",
                      columns=["event_type", "user_id"])
    got = kmv_user_overlap(ds, "view", "click").to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id"])
    va = set(ev.loc[ev["event_type"] == "view", "user_id"])
    cb = set(ev.loc[ev["event_type"] == "click", "user_id"])
    # 15 users a side at sf0.001: the sketch is exact
    assert got["est_a"].iloc[0] == float(len(va))
    assert got["est_b"].iloc[0] == float(len(cb))
    assert got["est_overlap"].iloc[0] == float(len(va & cb))
