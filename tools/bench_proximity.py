"""Microbench: 2-term vs 3-term proximity cost per posting occurrence
(VERDICT r3 next #5 'done' criterion: 3-term within ~2x of 2-term per
occurrence after the vectorized minimal-cover kernel).

Builds (or reuses) the deterministic bench corpus index, picks the
hottest dictionary terms, and times NEAR/W queries at both arities.

    python tools/bench_proximity.py [--turns 600000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=600_000)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.corpus import write_transcripts
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import proximity_rank_index
    from vframe_ray.sources.readers import read_parquet

    cdir = f"/tmp/vframe_ray_bench/corpus-prox-{args.turns}"
    if not os.path.exists(os.path.join(cdir, "part-00000.parquet")):
        write_transcripts(cdir, args.turns, rows_per_file=50_000)
    idx = f"/tmp/vframe_ray_bench/idx-prox-{args.turns}"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        ds = read_parquet(cdir, columns=["conv_id", "turn_idx", "text"])
        build_index(ds, idx, EngineConfig(index=IndexConfig(
            num_segments=max(4, args.turns // 9_400))))

    gdir = os.path.join(idx, "global", "terms")
    files = [os.path.join(gdir, f) for f in sorted(os.listdir(gdir))
             if f.endswith(".parquet")]
    t = pq.ParquetDataset(files).read(columns=["term", "cf"]).to_pandas()
    hot = t.sort_values("cf", ascending=False).head(3)
    terms = hot["term"].tolist()
    cfs = {r["term"]: int(r["cf"]) for _, r in hot.iterrows()}

    def timed(qterms):
        qs = [{"query_id": 0, "query_text": " ".join(qterms),
               "window": args.window, "k": 10}]
        proximity_rank_index(idx, qs)                    # warm
        best = min(
            (lambda t0: (proximity_rank_index(idx, qs),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(args.reps))
        return best, sum(cfs[x] for x in qterms)

    s2, occ2 = timed(terms[:2])
    s3, occ3 = timed(terms[:3])
    per2 = s2 / occ2 * 1e9
    per3 = s3 / occ3 * 1e9
    print(json.dumps({
        "metric": "proximity_arity", "turns": args.turns,
        "window": args.window, "terms": terms,
        "two_term_sec": round(s2, 4), "three_term_sec": round(s3, 4),
        "occurrences_2": occ2, "occurrences_3": occ3,
        "ns_per_occurrence_2": round(per2, 1),
        "ns_per_occurrence_3": round(per3, 1),
        "ratio_3_vs_2_per_occ": round(per3 / per2, 2)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
