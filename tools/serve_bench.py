"""Warm query-serving throughput bench for a built index.

Measures steady-state QueryService q/s (the number BASELINE.md §2
quotes) and optionally verifies the service output rank-identical to the
one-shot ``search_index`` scatter-gather path on the same index.

Usage:
    python tools/serve_bench.py [INDEX_DIR] [--actors N] [--reps R] [--check]

INDEX_DIR defaults to the driver bench's cached compacted 9.6M-doc
index (/tmp/vframe_ray_bench/idx-sf0.1-8-compact64).  The process owns
its Ray session (scripts own ray.init per the driver contract).
"""

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash(table) -> str:
    import pandas as pd
    df = table.to_pandas()
    keys = ["query_id", "rank"] if "rank" in df.columns \
        else list(df.columns)
    df = df.sort_values(keys).reset_index(drop=True)
    return hashlib.md5(pd.util.hash_pandas_object(
        df, index=False).values.tobytes()).hexdigest()[:12]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir", nargs="?",
                    default="/tmp/vframe_ray_bench/idx-sf0.1-8-compact64")
    ap.add_argument("--actors", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--check", action="store_true",
                    help="also verify service == one-shot search_index")
    ap.add_argument("--mixed", action="store_true",
                    help="also bench the heterogeneous search_mixed "
                         "batch vs one call per mode")
    ap.add_argument("--concurrent", type=int, default=0,
                    help="ALSO measure throughput with this many driver "
                         "threads issuing calls concurrently (the "
                         "scale-out number: sequential calls are "
                         "latency-bound and cannot show cpu scaling)")
    args = ap.parse_args()

    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="warning")
    from vframe_ray.corpus import generate_queries
    from vframe_ray.index.query import QueryService, search_index

    queries = generate_queries()
    svc = QueryService(args.index_dir, n_actors=args.actors)
    # this bench repeats IDENTICAL batches — with the request cache on
    # it would measure dict lookups, not the scoring path.  The cached
    # number is ~memory speed by construction; what BASELINE.md quotes
    # is steady-state SCORING throughput.
    svc.request_cache_size = 0
    svc._req_cache.clear()
    try:
        for _ in range(2):                       # warm caches untimed
            res = svc.search(queries)
        t0 = time.time()
        for _ in range(args.reps):
            res = svc.search(queries)
        el = time.time() - t0
        print(f"warm service: {len(queries) * args.reps / el:.1f} q/s "
              f"({el / args.reps * 1000:.1f} ms per "
              f"{len(queries)}-query call)  rows={res.num_rows} "
              f"hash={_hash(res)}")
        if args.concurrent:
            # throughput under concurrency: T threads x reps calls each
            # (ray.get releases the GIL, so driver threads overlap the
            # actors' scoring work); this is the number that scales
            # with cpus — single-stream q/s is bounded by call latency
            import threading
            T = args.concurrent
            outs: list = [None] * T

            def worker(i):
                for _ in range(args.reps):
                    outs[i] = svc.search(queries)

            for i in range(T):                    # warm
                outs[i] = svc.search(queries)
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(T)]
            t0 = time.time()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            el_c = time.time() - t0
            nq = len(queries) * args.reps * T
            par = all(_hash(o) == _hash(res) for o in outs)
            print(f"concurrent x{T}: {nq / el_c:.1f} q/s aggregate "
                  f"({el_c / args.reps * 1000:.1f} ms per wave)  "
                  f"parity={par}")
            if not par:
                return 1
        if args.check:
            want = search_index(args.index_dir, queries)
            ok = _hash(want) == _hash(res) and want.num_rows == res.num_rows
            print(f"one-shot parity: rows={want.num_rows} "
                  f"hash={_hash(want)} match={ok}")
            if not ok:
                return 1
        if args.mixed:
            third = max(1, len(queries) // 3)
            sq = queries[:third]
            xq = [dict(q, window=8) for q in queries[third:2 * third]]
            bq = [{"query_id": q["query_id"],
                   "must": q["query_text"].split()[0],
                   "should": q["query_text"], "must_not": "", "k": 10}
                  for q in queries[2 * third:]]
            rq = [{"query_id": q["query_id"],
                   "query_text": q["query_text"]} for q in sq[:4]]
            reqs = [{"mode": "search", "queries": sq},
                    {"mode": "proximity", "queries": xq},
                    {"mode": "boolean", "queries": bq},
                    {"mode": "facet_ranges", "queries": rq,
                     "bin_width": 16}]
            nq = len(sq) + len(xq) + len(bq) + len(rq)
            svc.search_mixed(reqs)                       # warm
            t0 = time.time()
            for _ in range(args.reps):
                mixed = svc.search_mixed(reqs)
            el_mixed = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                sep = [svc.search(sq), svc.search_proximity(xq),
                       svc.search_boolean(bq), svc.facet_ranges(rq, 16)]
            el_sep = time.time() - t0
            par = all(_hash(m) == _hash(s) for m, s in zip(mixed, sep))
            print(f"mixed-mode batch ({nq} queries / 4 modes): "
                  f"{nq * args.reps / el_mixed:.1f} q/s one-round-trip vs "
                  f"{nq * args.reps / el_sep:.1f} q/s per-mode calls "
                  f"({el_mixed / args.reps * 1000:.1f} vs "
                  f"{el_sep / args.reps * 1000:.1f} ms/call)  parity={par}")
            if not par:
                return 1
    finally:
        svc.shutdown()
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
