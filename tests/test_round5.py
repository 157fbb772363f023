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


def test_pack_sequences_presplit_matches_single_reducer(ray_session):
    """The giant-group two-pass path (split_id_width) must reproduce the
    single-reducer packing exactly, including across slice boundaries
    where the carried token offset decides the seq_id (VERDICT r4 #4).
    One group deliberately spans many blocks and many slices."""
    import ray
    from vframe_ray.stages.chunking import pack_sequences
    rng = np.random.default_rng(5)
    n = 600
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # one dominant source (the giant group) + two small ones
        "source": np.r_[["big"] * 400,
                        rng.choice(["s1", "s2"], n - 400)],
        "text": ["tok " * int(k) for k in rng.integers(0, 40, n)]})
    ds = ray.data.from_pandas(docs).repartition(8)
    base = pack_sequences(ds, budget=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # width 37 → ~17 slices; boundaries fall mid-sequence
    split = pack_sequences(ds, budget=64, split_id_width=37) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        split[base.columns.tolist()], base)
    # the dominant group actually rolled over sequences across slices
    assert base.loc[base["source"] == "big", "seq_id"].max() > 5


def test_sessionize_presplit_matches_single_reducer(ray_session):
    """The giant-key two-pass path (split_ts_width_s) must reproduce
    single-reducer sessionization exactly: sessions that span slice
    boundaries are merged back to one row with the same session_idx,
    bounds and sums (VERDICT r4 #4)."""
    import ray
    from vframe_ray.stages.sessionize import sessionize
    rng = np.random.default_rng(13)
    n = 2000
    # bursty arrivals so gaps straddle the 1800 s threshold, plus long
    # within-session runs that cross many 3600 s slice boundaries
    deltas = rng.choice([30, 300, 1200, 2400, 7200], n,
                        p=[0.55, 0.2, 0.1, 0.1, 0.05])
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.cumsum(deltas) + rng.integers(0, 20, n), unit="s")
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "ts": ts,
                       "user_id": rng.integers(0, 5, n).astype(np.int64),
                       "value": rng.random(n)})
    ds = ray.data.from_pandas(df).repartition(6)
    cols = ["user_id", "session_idx", "session_start", "session_end",
            "n_events", "sum_value"]
    base = sessionize(ds, gap_seconds=1800).to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    split = sessionize(ds, gap_seconds=1800, split_ts_width_s=3600) \
        .to_pandas().sort_values(["user_id", "session_idx"]) \
        .reset_index(drop=True)
    assert len(split) == len(base)
    for c in cols[:-1]:
        assert split[c].tolist() == base[c].tolist(), c
    np.testing.assert_allclose(split["sum_value"], base["sum_value"])
    # the split genuinely cut sessions: some session crosses a slice
    spans = (base["session_start"].astype("int64") // (3600 * 10**9)
             != base["session_end"].astype("int64") // (3600 * 10**9))
    assert spans.any()


def _tiny_index(tmp_path, name, n_segs=5):
    import ray
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index, extend_index
    cfg = EngineConfig(index=IndexConfig(num_segments=1, block_size=32))
    idx = str(tmp_path / name)
    rows = [{"conv_id": f"c{s}{i:03d}", "turn_idx": 0,
             "text": f"alpha bravo seg{s} tok{i} charlie"}
            for s in range(1) for i in range(8)]
    build_index(ray.data.from_items(rows), idx, cfg)
    for s in range(1, n_segs):
        nb = [{"conv_id": f"c{s}{i:03d}", "turn_idx": 0,
               "text": f"alpha bravo seg{s} tok{i} charlie"}
              for i in range(8)]
        extend_index(ray.data.from_items(nb), idx, num_new_segments=1)
    return idx


def test_terms_swap_crash_recovery(ray_session, tmp_path):
    """A crash between the dictionary swap's two renames (index left
    with NO global/terms) is healed by terms_dir()/recover_terms_swap —
    readers see the completed new dictionary (ADVICE r4 #2a)."""
    import shutil
    from vframe_ray.index.query import search_index
    from vframe_ray.state.manifest import (TERMS_SWAP_JOURNAL,
                                           terms_dir, write_json)
    idx = _tiny_index(tmp_path, "swapidx", n_segs=2)
    gdir = os.path.join(idx, "global")
    terms = os.path.join(gdir, "terms")
    # simulate the crash window: journal written, old terms renamed to
    # the backup, new dict complete, second rename never happened
    shutil.copytree(terms, os.path.join(gdir, "terms.new-zz"))
    write_json(os.path.join(gdir, TERMS_SWAP_JOURNAL),
               {"new": "terms.new-zz", "bak": "terms.old-zz"})
    os.rename(terms, os.path.join(gdir, "terms.old-zz"))
    assert not os.path.exists(terms)
    got = terms_dir(idx)                          # heals
    assert os.path.isdir(got) and os.path.isdir(terms)
    assert not os.path.exists(os.path.join(gdir, TERMS_SWAP_JOURNAL))
    assert not os.path.exists(os.path.join(gdir, "terms.old-zz"))
    res = search_index(idx, [{"query_id": 0, "query_text": "alpha",
                              "k": 3}]).to_pandas()
    assert len(res) == 3


def test_tiered_compaction_defers_source_deletion(ray_session, tmp_path):
    """Merged source segments survive the manifest swap for the reader
    grace period (in-flight queries on the old manifest keep working),
    and are swept once it passes (ADVICE r4 #2c)."""
    import json
    from vframe_ray.index.compact import tiered_compact_index
    from vframe_ray.state.manifest import gc_deferred_deletes
    idx = _tiny_index(tmp_path, "deferidx", n_segs=5)
    before = set(json.load(open(
        os.path.join(idx, "manifest.json")))["segments"])
    stats = tiered_compact_index(idx, tier_size=5,
                                 tombstone_grace_s=3600)
    assert stats["merges"] >= 1
    after = set(json.load(open(
        os.path.join(idx, "manifest.json")))["segments"])
    retired = before - after
    assert retired
    # grace not elapsed: retired dirs still readable on disk
    for s in retired:
        assert os.path.isdir(os.path.join(idx, "segments", s))
    assert gc_deferred_deletes(idx, grace_seconds=3600) == 0
    # grace elapsed: swept
    assert gc_deferred_deletes(idx, grace_seconds=0) == len(retired)
    for s in retired:
        assert not os.path.exists(os.path.join(idx, "segments", s))


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


def test_function_score_vs_bruteforce(ray_session, tmp_path):
    """Function-score (field_value_factor) ranking must equal the
    brute-force BM25 × (1 + w·ln(1+attr)) rescore of ALL matches, and
    must genuinely reorder vs plain BM25 (a long doc with one 'apple'
    outranks short docs with more); unknown attr fails fast."""
    import math
    import ray
    import pandas as pd
    import pytest
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import function_score_index, search_index
    rows = [
        {"conv_id": "d0", "turn_idx": 0, "len": 10,
         "text": "apple apple apple pear"},
        {"conv_id": "d1", "turn_idx": 0, "len": 5000,
         "text": "apple " + "filler " * 8},
        {"conv_id": "d2", "turn_idx": 0, "len": 40,
         "text": "apple apple plum"},
        {"conv_id": "d3", "turn_idx": 0, "len": 9000,
         "text": "pear plum"},
    ]
    idx = str(tmp_path / "fsidx")
    build_index(ray.data.from_items(rows), idx,
                EngineConfig(index=IndexConfig(num_segments=2)),
                attribute_cols=["len"])
    qs = [{"query_id": 0, "query_text": "apple", "k": 4}]
    w = 0.5
    got = function_score_index(idx, qs, attr="len", weight=w).to_pandas()
    plain = search_index(idx, qs).to_pandas() \
        .set_index("conv_id")["score"]
    lens = {r["conv_id"]: r["len"] for r in rows}
    want = sorted(((s * (1 + w * math.log(1 + lens[c])), c)
                   for c, s in plain.items()),
                  key=lambda t: (-t[0], t[1]))
    assert got["conv_id"].tolist() == [c for _s, c in want]
    for g, (s, _c) in zip(got["score"], want):
        assert g == pytest.approx(s, abs=0, rel=0)   # bit-exact
    # the boost genuinely reorders vs plain BM25 (d0's tiny len demotes
    # it from the top despite the highest raw score)
    assert plain.index[0] == "d0"
    assert got["conv_id"].iloc[0] != "d0"
    with pytest.raises(ValueError, match="function-score attribute"):
        function_score_index(idx, qs, attr="nope", weight=w)
