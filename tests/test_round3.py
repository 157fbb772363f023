"""Round-3 additions: distributed blocked exact dup pairs, SRP-bucketed
near-dup pairs (recall vs the exact oracle on a planted corpus), ranked
phrase queries, incremental index append."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _planted_embeddings(n_base=400, n_near=40, dim=64, noise=0.18, seed=7):
    """Base vectors + noisy near-copies of the first n_near (cosine
    ~0.92-0.99): every (i, n_base+i) pair clears a 0.9 threshold."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    near = base[:n_near] + noise * rng.standard_normal((n_near, dim))
    M = np.vstack([base, near])
    return pa.table({
        "vec_id": pa.array(np.arange(len(M)), pa.int64()),
        "embedding": pa.array([list(r) for r in M],
                              pa.list_(pa.float64()))})


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    return ray.data.from_arrow(_planted_embeddings())


def test_blocked_exact_equals_driver_oracle(ray_session, planted_ds):
    """The distributed chunk-pair path must reproduce the driver-side
    O(N²) oracle exactly — including chunk-boundary and same-chunk
    pairs (rows_per_chunk far below N forces many cross-chunk tasks)."""
    from vframe_ray.stages.similarity import (cosine_dup_pairs,
                                              cosine_dup_pairs_driver_oracle)
    want = cosine_dup_pairs_driver_oracle(planted_ds,
                                          threshold=0.9).to_pylist()
    got = cosine_dup_pairs(planted_ds, threshold=0.9,
                           rows_per_chunk=64).to_pylist()
    assert got == want
    assert len(got) >= 40


def test_srp_dup_pairs_recall(ray_session, planted_ds):
    """The SRP-bucketed path must find EVERY pair the exact path finds
    on the planted corpus (VERDICT r3 done-criterion), and — because
    each bucket verifies exactly — never a pair below threshold."""
    from vframe_ray.stages.similarity import (cosine_dup_pairs_driver_oracle,
                                              srp_dup_pairs)
    exact = cosine_dup_pairs_driver_oracle(planted_ds,
                                           threshold=0.9).to_pylist()
    srp = srp_dup_pairs(planted_ds, threshold=0.9, dim=64).to_pylist()
    ekeys = {(r["id_a"], r["id_b"]): r["sim_r"] for r in exact}
    skeys = {(r["id_a"], r["id_b"]): r["sim_r"] for r in srp}
    assert set(ekeys) <= set(skeys), "SRP missed exact pairs"
    assert all(v >= 0.9 for v in skeys.values())
    # verified sims are exact, so any emitted pair matches the oracle
    for k, v in skeys.items():
        assert ekeys[k] == v
