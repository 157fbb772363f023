"""CLI entry points — the analog of the reference's plugin-group CLI
(reference: src/cli.py:54-166 argparse+click two-stage dispatch;
config.yaml:32-71 command groups).  Commands assemble Dataset chains:

    python -m vframe_ray build  --input DIR --index DIR [--segments N]
    python -m vframe_ray query  --index DIR --query "..." [-k 10]
    python -m vframe_ray corpus --out DIR --turns 100000
    python -m vframe_ray stats  --index DIR

Each command owns its Ray session (ray.init local / ray.shutdown); the
library itself never does (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data
    from .config import EngineConfig, IndexConfig
    from .index.build import build_index
    from .sources.readers import read_transcripts
    ds = read_transcripts(args.input, columns=["conv_id", "turn_idx", "text"],
                          predicates=args.filter or None)
    cfg = EngineConfig(index=IndexConfig(num_segments=args.segments))
    stats = build_index(ds, args.index, cfg)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .index.query import search_index
    qs = [{"query_id": i, "query_text": q, "k": args.k}
          for i, q in enumerate(args.query)]
    res = search_index(args.index, qs)
    for row in res.to_pylist():
        print(json.dumps(row, default=str))
    ray.shutdown()
    return 0


def cmd_corpus(args) -> int:
    from .corpus import write_transcripts
    out = write_transcripts(args.out, args.turns, seed=args.seed)
    print(json.dumps({"out": out, "turns": args.turns, "seed": args.seed}))
    return 0


def cmd_stats(args) -> int:
    from .index.build import load_index_meta
    cfg, stats, segs = load_index_meta(args.index)
    print(json.dumps({"config": cfg, "stats": stats,
                      "n_segments": len(segs)}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vframe_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=64)
    b.add_argument("--filter", action="append",
                   help="'attr op value' predicate, repeatable")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k search")
    q.add_argument("--index", required=True)
    q.add_argument("--query", action="append", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("corpus", help="generate synthetic transcripts")
    c.add_argument("--out", required=True)
    c.add_argument("--turns", type=int, default=10_000)
    c.add_argument("--seed", type=int, default=42)
    c.set_defaults(fn=cmd_corpus)

    s = sub.add_parser("stats", help="show index stats")
    s.add_argument("--index", required=True)
    s.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
