"""Round-5 wave: big-big dimension fallback (round-4 VERDICT #3), bench
supervisor crash resilience, giant-group pre-split packing."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@needs_testdata
def test_dim_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """VFRAME_RAY_DIM_BROADCAST_MAX_ROWS=0 forces the distributed
    hash_join path for the customer dimension in q3/q5/revenue_by_nation;
    output must be identical to the broadcast path (VERDICT r4 #3)."""
    from vframe_ray.pipelines import relational as rel
    base_q3 = rel.q3_shipping_priority(SF)
    base_q5 = rel.q5_local_supplier_revenue(SF)
    base_rbn = rel.revenue_by_nation(SF)
    # the test is vacuous on empty outputs
    assert len(base_q3) and len(base_q5) and len(base_rbn)
    monkeypatch.setenv("VFRAME_RAY_DIM_BROADCAST_MAX_ROWS", "0")
    pd.testing.assert_frame_equal(rel.q3_shipping_priority(SF), base_q3)
    pd.testing.assert_frame_equal(
        rel.q5_local_supplier_revenue(SF), base_q5)
    pd.testing.assert_frame_equal(rel.revenue_by_nation(SF), base_rbn)


@needs_testdata
def test_bench_supervisor_partial_on_crash(tmp_path):
    """A hard mid-run crash (simulated raylet abort after index_build)
    must still yield ONE parseable JSON line with rc=0, partial=true and
    per-stage status — the driver-artifact guarantee (VERDICT r4 #2)."""
    env = dict(os.environ,
               GRAFT_SF_DIR=SF,
               RAY_GRAFT_CPUS="4",
               GRAFT_BENCH_TURNS="1000",
               GRAFT_BENCH_CRASH_AFTER="index_build")
    env.pop("GRAFT_BENCH_INNER", None)
    env.pop("GRAFT_BENCH_PROGRESS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines()
             if l.startswith("{")]
    assert lines, proc.stdout
    out = json.loads(lines[-1])
    assert out["partial"] is True
    assert out["pipeline_status"]["index_build"] == "ok"
    assert out["queries"]["index_build"] > 0
    assert out["crash_rc"] == 134
