"""Bloom runtime filter for hash_join: output identity under the
filter (int and string keys, tiny bitmap forcing false positives),
one-sided guarantee of the primitive, and real pruning selectivity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from vframe_ray.stages.joins import (bloom_build, bloom_test,
                                     hash_join)


def test_bloom_never_rejects_members():
    ks = np.arange(0, 5000, dtype=np.int64)
    bm = bloom_build(ks, 1 << 16)
    assert bloom_test(bm, ks).all()
    sk = np.array(["x", "", "naïve", "a,b"], object)
    bm2 = bloom_build(sk, 1 << 10)
    assert bloom_test(bm2, sk).all()


def test_bloom_selectivity():
    bm = bloom_build(np.arange(1000, dtype=np.int64), 1 << 20)
    fp = bloom_test(bm, np.arange(1000, 200_000,
                                  dtype=np.int64)).mean()
    assert fp < 0.01


@pytest.mark.parametrize("bits", [64, 1 << 20])
def test_join_identical_with_filter(ray_session, bits):
    """bits=64 forces heavy false positives — the join result must
    still be identical (FPs only ship rows that join to nothing)."""
    rng = np.random.default_rng(7)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 500, 3000), pa.int64()),
        "lv": pa.array(rng.uniform(0, 1, 3000)),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 100, dtype=np.int64)),
        "name": pa.array([f"n{i}" for i in range(100)]),
    }))

    def run(rf, fb=1 << 20):
        return hash_join(left, right, key="k",
                         left_cols=["k", "lv"], right_cols=["name"],
                         runtime_filter=rf, filter_bits=fb) \
            .to_pandas().sort_values(["k", "lv", "name"]) \
            .reset_index(drop=True)

    pd.testing.assert_frame_equal(run(False), run(True, bits))


def test_join_identical_with_filter_string_keys(ray_session):
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "d", "", "é"] * 10),
        "lv": pa.array(list(range(60)), pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["b", "", "é", "zz"]),
        "rv": pa.array([1, 2, 3, 4], pa.int64()),
    }))

    def run(rf):
        return hash_join(left, right, key="k",
                         left_cols=["k", "lv"], right_cols=["rv"],
                         runtime_filter=rf, filter_bits=1 << 12) \
            .to_pandas().sort_values(["k", "lv"]) \
            .reset_index(drop=True)

    pd.testing.assert_frame_equal(run(False), run(True))
