"""Per-stage wall-time breakdown of the index build at one cpu count.

Runs the build's stages stepwise with materialization barriers so each
phase gets its own wall-clock number (the streaming pipeline normally
overlaps them — the stepwise total therefore slightly EXCEEDS the real
build time; it is an upper bound per stage, not a faster path).  Used
for the scaling-efficiency evidence table in BASELINE.md §3.

    RAY_GRAFT_CPUS=8 python tools/stage_breakdown.py [n_turns]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.stages.tokenize import assign_segment_ids
    from vframe_ray.sources.readers import read_parquet as _read_parquet

    cdir = f"/tmp/vframe_ray_bench/corpus-sf0.1-{n_turns}"
    if not os.path.exists(os.path.join(cdir, "part-00000.parquet")):
        from vframe_ray.corpus import write_transcripts
        write_transcripts(cdir, n_turns, rows_per_file=50_000)
    n_segments = max(64, n_turns // 9_400)
    cfg = EngineConfig(index=IndexConfig(num_segments=n_segments))

    def read_corpus():
        return _read_parquet(cdir,
                                     columns=["conv_id", "turn_idx", "text"],
                                     override_num_blocks=NUM_CPUS)

    # warmup: one full untimed build (host: cold pages measure the VM)
    shutil.rmtree("/tmp/sb_warm", ignore_errors=True)
    build_index(read_corpus(), "/tmp/sb_warm", cfg, use_actor_pool=False)

    t = {}
    t0 = time.time()
    src = read_corpus().materialize()
    t["read"] = time.time() - t0

    def _assign(batch: pa.Table) -> pa.Table:
        seg = assign_segment_ids(batch["conv_id"], cfg.index.num_segments)
        return batch.append_column("segment_id", pa.array(seg, pa.int32()))

    t0 = time.time()
    assigned = src.map_batches(_assign, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    t["assign"] = time.time() - t0

    # exchange + per-group segment build + term partials (one execution)
    shutil.rmtree("/tmp/sb_idx", ignore_errors=True)
    from vframe_ray.index.build import SegmentBuilderStage
    stage = SegmentBuilderStage("/tmp/sb_idx", cfg, run_id="sb")
    t0 = time.time()
    seg_terms = (assigned.groupby("segment_id")
                 .map_groups(lambda g: stage(g), batch_format="pyarrow")
                 .materialize())
    t["exchange+build"] = time.time() - t0

    from ray.data.aggregate import Sum

    def _combine(tb: pa.Table) -> pa.Table:
        g = tb.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        return pa.table({"term": g["term"], "df": g["df_sum"],
                         "cf": g["cf_sum"]})

    t0 = time.time()
    (seg_terms.map_batches(_combine, batch_format="pyarrow",
                           zero_copy_batch=True)
     .groupby("term")
     .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
     .write_parquet("/tmp/sb_idx/global_terms"))
    t["term_stats"] = time.time() - t0

    # full streaming build for reference (what bench times)
    shutil.rmtree("/tmp/sb_full", ignore_errors=True)
    t0 = time.time()
    build_index(read_corpus(), "/tmp/sb_full", cfg, use_actor_pool=False)
    t["full_streaming_build"] = time.time() - t0

    print(json.dumps({"num_cpus": NUM_CPUS, "n_turns": n_turns,
                      "n_segments": n_segments,
                      "stages_sec": {k: round(v, 2) for k, v in t.items()}}))
    for d in ("/tmp/sb_warm", "/tmp/sb_idx", "/tmp/sb_full"):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
