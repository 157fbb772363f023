"""Microbench: SymSpell deletion-table fuzzy expansion vs linear scan
at a large synthetic dictionary (VERDICT r3 next #3 'done' criterion).

Synthesizes a deterministic N-term dictionary (no external data),
builds the sidecar once (timed), then times per-call expansion of a
fixed query-term set on both paths.  Prints one JSON line; record the
numbers in BASELINE.md.

    python tools/bench_fuzzy.py [--terms 1000000] [--edits 1]
"""

import argparse
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def synth_vocab(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    seen: set[str] = set()
    while len(seen) < n:
        seen.add("".join(rng.choice(alpha)
                         for _ in range(rng.randint(4, 12))))
    return sorted(seen)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--terms", type=int, default=1_000_000)
    ap.add_argument("--edits", type=int, default=1)
    ap.add_argument("--queries", type=int, default=8)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vframe_ray.index import fuzzy

    vocab = synth_vocab(args.terms)
    rng = random.Random(13)
    queries = sorted(rng.sample(vocab, args.queries))
    # perturb half of them by one deletion so not every query is exact
    queries = [q[:3] + q[4:] if i % 2 else q
               for i, q in enumerate(queries)]

    with tempfile.TemporaryDirectory(prefix="fuzzy_bench_") as idx:
        gdir = os.path.join(idx, "global", "terms")
        os.makedirs(gdir)
        pq.write_table(
            pa.table({"term": pa.array(vocab, pa.string()),
                      "df": pa.array([1] * len(vocab), pa.int64())}),
            os.path.join(gdir, "part-0.parquet"),
            row_group_size=65536)

        t0 = time.perf_counter()
        fuzzy.build_deletion_table(idx, max_edits=args.edits)
        build_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        sym = fuzzy.expand_fuzzy_terms(idx, queries, max_edits=args.edits)
        sym_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        lin = fuzzy.expand_fuzzy_terms_scan(idx, queries,
                                            max_edits=args.edits)
        lin_s = time.perf_counter() - t0

        assert sym == lin, "paths diverged"
        print(json.dumps({
            "metric": "fuzzy_expansion", "terms": args.terms,
            "max_edits": args.edits, "n_queries": len(queries),
            "table_build_sec": round(build_s, 3),
            "symspell_expand_sec": round(sym_s, 3),
            "linear_scan_sec": round(lin_s, 3),
            "speedup": round(lin_s / max(sym_s, 1e-9), 1)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
