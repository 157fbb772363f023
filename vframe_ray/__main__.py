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
    """Init Ray if this process has none; the returned handle's
    ``shutdown()`` is a no-op when the session belonged to someone else
    (e.g. the pytest session fixture driving main() in-process)."""
    import ray
    owned = not ray.is_initialized()
    if owned:
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    class _Handle:
        def shutdown(self):
            if owned:
                ray.shutdown()

    return _Handle()


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


def _clean_wildcards(queries) -> bool:
    """True iff the queries contain wildcard tokens AND every
    wildcard-bearing token is pure ``[a-z0-9*?]`` — the shape
    search_like_index accepts.  A '?' inside ordinary punctuation
    ("is this right?") is NOT a wildcard request."""
    import re
    toks = [w for q in (queries or []) for w in q.lower().split()]
    # A single trailing '?' is natural-language punctuation ("right?"),
    # never a wildcard request — strip it BEFORE detection so plain
    # questions route to term search, not LIKE 'right_'.
    toks = [w[:-1] if w.endswith("?") and "?" not in w[:-1]
            and "*" not in w else w for w in toks]
    wild = [w for w in toks if "*" in w or "?" in w]
    return bool(wild) and all(
        re.fullmatch(r"[a-z0-9*?]+", w) for w in wild)


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .index import query as q_
    qs = [{"query_id": i, "query_text": q, "k": args.k,
           "offset": args.offset} for i, q in enumerate(args.query or [])]
    preds = args.filter or None
    boosted = (not args.no_boost
               and any("^" in q for q in (args.query or [])))
    if args.offset and (args.window or args.first or args.explain
                        or args.phrase or boosted):
        print("warning: --offset applies only to plain search; "
              "ignored in --window/--first/--explain/--phrase/boosted "
              "modes", file=sys.stderr)
    if args.correct:
        res = q_.suggest_corrections(args.index, list(args.correct),
                                     max_edits=args.fuzzy or 1)
    elif args.suggest:
        res = q_.suggest_terms(args.index, list(args.suggest), k=args.k)
    elif args.export:
        ds = q_.export_matches(args.index, qs, predicates=preds)
        ds.write_parquet(args.export)
        print(json.dumps({"exported_to": args.export}))
        ray.shutdown()
        return 0
    elif args.phrase:
        res = q_.phrase_rank_index(args.index, [
            {"query_id": i, "phrase": ph, "k": args.k}
            for i, ph in enumerate(args.phrase)], predicates=preds)
    elif args.window:
        res = q_.proximity_rank_index(args.index, [
            {"query_id": i, "query_text": q, "window": args.window,
             "k": args.k, "ordered": args.ordered}
            for i, q in enumerate(args.query or [])],
            predicates=preds)
    elif args.first:
        res = q_.span_first_search_index(args.index, [
            {"query_id": i, "query_text": q, "limit": args.first,
             "k": args.k} for i, q in enumerate(args.query or [])],
            predicates=preds)
    elif args.explain:
        res = q_.explain_index(args.index, [
            {"query_id": i, "query_text": q, "k": args.k}
            for i, q in enumerate(args.query or [])], predicates=preds)
    elif args.after:
        # cursor is SCORE,CONV,TURN where CONV may itself contain commas:
        # score is everything before the FIRST comma, turn after the LAST
        # (ADVICE r3 — a bare 3-way split broke comma-bearing conv ids).
        sc, rest = args.after.split(",", 1)
        conv, turn = rest.rsplit(",", 1)
        res = q_.search_after_index(args.index, [
            dict(qq, after=(float(sc), conv, int(turn))) for qq in qs],
            predicates=preds)
    elif args.range_facet:
        res = q_.facet_ranges_index(args.index, qs,
                                    bin_width=args.range_facet,
                                    predicates=preds)
    elif args.facet_top:
        res = q_.top_hits_index(args.index, [
            {"query_id": i, "query_text": q, "h": args.k}
            for i, q in enumerate(args.query or [])],
            args.facet_top, predicates=preds)
    elif args.eval:
        res = q_.retrieval_eval_index(args.index, [
            {"query_id": i, "query_text": q, "k": args.k}
            for i, q in enumerate(args.query or [])],
            predicates=preds)
    elif args.demote:
        res = q_.search_boosting_index(args.index, [
            {"query_id": i, "positive": q, "negative": args.demote,
             "negative_boost": args.demote_boost, "k": args.k}
            for i, q in enumerate(args.query or [])], predicates=preds)
    elif boosted:
        res = q_.search_boosted_index(args.index, qs, predicates=preds)
    elif args.must or args.must_not:
        res = q_.search_boolean_index(args.index, [
            {"query_id": 0, "must": args.must or "",
             "should": " ".join(args.query or []),
             "must_not": args.must_not or "", "k": args.k}],
            predicates=preds)
    elif args.fuzzy:
        res = q_.search_fuzzy_index(args.index, qs,
                                    max_edits=args.fuzzy,
                                    predicates=preds)
    elif _clean_wildcards(args.query):
        # general wildcard path (mid-pattern * / ?); trailing-star
        # prefixes expand to the same term set as search_prefix_index
        res = q_.search_like_index(args.index, qs, predicates=preds,
                                   collapse=args.collapse)
    elif any("*" in q for q in (args.query or [])):
        # legacy mixed-punctuation stems ("foo-bar*"): the prefix path
        # tokenizes the stem (literal 'foo' + prefix 'bar*') instead of
        # rejecting the token; a bare '?' with other punctuation is
        # plain punctuation and falls through to plain search below
        res = q_.search_prefix_index(args.index, qs, predicates=preds,
                                     collapse=args.collapse)
    elif args.facet:
        res = q_.facet_counts_index(args.index, qs, args.facet,
                                    predicates=preds)
    else:
        res = q_.search_index(args.index, qs, predicates=preds,
                              collapse=args.collapse)
    for row in res.to_pylist():
        print(json.dumps(row, default=str))
    ray.shutdown()
    return 0


def cmd_delete(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .index.build import delete_docs
    ids = list(args.conv or [])
    if args.from_file:
        with open(args.from_file) as f:
            ids += [line.strip() for line in f if line.strip()]
    print(json.dumps(delete_docs(args.index, ids)))
    ray.shutdown()
    return 0


def cmd_snapshot(args) -> int:
    from .index.merge import snapshot_index
    print(json.dumps(snapshot_index(args.index, args.dst,
                                    link=not args.copy)))
    return 0


def cmd_merge(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .index.compact import merge_indexes
    stats = merge_indexes(args.index, args.out,
                          target_segments=args.segments)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def cmd_extend(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .index.build import extend_index
    from .sources.readers import read_transcripts
    ds = read_transcripts(args.input,
                          columns=["conv_id", "turn_idx", "text"],
                          predicates=args.filter or None)
    print(json.dumps(extend_index(ds, args.index)))
    ray.shutdown()
    return 0


def cmd_corpus(args) -> int:
    from .corpus import write_transcripts
    out = write_transcripts(args.out, args.turns, seed=args.seed)
    print(json.dumps({"out": out, "turns": args.turns, "seed": args.seed}))
    return 0


def cmd_compact(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .index.compact import compact_index, tiered_compact_index
    if args.tiered:
        stats = tiered_compact_index(args.index, tier_size=args.tier_size)
    else:
        if not args.out:
            print("error: --out is required unless --tiered",
                  file=sys.stderr)
            return 2
        stats = compact_index(args.index, args.out,
                              target_segments=args.segments)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def cmd_stages(args) -> int:
    """List registered stages (built-ins + plugin dirs) — the analog of
    the reference's configurable command groups (config.yaml:32-71)."""
    from . import registry
    from .sources.readers import read_parquet as _read_parquet
    if args.plugins:
        registry.load_plugins(args.plugins)
    else:
        registry.load_plugins()          # $VFRAME_RAY_PLUGINS, if set
    for name in registry.available():
        fn = registry.get(name)
        doc = (fn.__doc__ or "").strip().splitlines()
        print(json.dumps({"stage": name,
                          "doc": doc[0] if doc else ""}))
    return 0


def cmd_apply(args) -> int:
    """Run one registered stage over parquet input -> parquet output."""
    ray = _ray_session(args.num_cpus)
    import ray.data
    from . import registry
    if args.plugins:
        registry.load_plugins(args.plugins)
    else:
        registry.load_plugins()
    fn = registry.get(args.stage)
    kwargs = json.loads(args.args) if args.args else {}
    ds = _read_parquet(args.input,
                               columns=args.columns or None)
    out = fn(ds, **kwargs)
    out.write_parquet(args.output)
    print(json.dumps({"stage": args.stage, "output": args.output}))
    ray.shutdown()
    return 0


def cmd_alias(args) -> int:
    """Set or show an index alias (blue-green serving indirection)."""
    from .state.manifest import alias_resolve, alias_set
    if args.set:
        alias_set(args.alias, args.set)
    print(json.dumps({"alias": args.alias,
                      "index": alias_resolve(args.alias)}))
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

    q = sub.add_parser("query", help="BM25 top-k search (plus phrase/"
                       "boolean/prefix/fuzzy/facet/collapse modes)")
    q.add_argument("--index", required=True)
    q.add_argument("--query", action="append",
                   help="free text; '*' suffix on a token = prefix mode")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--offset", type=int, default=0,
                   help="pagination: return global ranks (offset, offset+k]")
    q.add_argument("--phrase", action="append",
                   help="exact consecutive phrase (ranked); repeatable")
    q.add_argument("--window", type=int, default=0, metavar="W",
                   help="proximity: all terms within a W-token span")
    q.add_argument("--first", type=int, default=0, metavar="N",
                   help="span-first: every term must occur within the "
                        "first N token positions")
    q.add_argument("--ordered", action="store_true",
                   help="with --window: terms must appear in the given "
                        "order (span-near)")
    q.add_argument("--after", metavar="SCORE,CONV,TURN",
                   help="cursor pagination: results ranked after this "
                        "(score, conv_id, turn_idx)")
    q.add_argument("--facet-top", metavar="FACET_COL",
                   help="top_hits aggregation: best -k docs per facet "
                        "value of this docmap column")
    q.add_argument("--eval", action="store_true",
                   help="retrieval-quality metrics (AP/NDCG/MRR vs "
                        "conjunctive pseudo-qrels) instead of results")
    q.add_argument("--demote", metavar="NEGATIVE_QUERY",
                   help="boosting compound: demote (not drop) docs "
                        "matching this negative query")
    q.add_argument("--demote-boost", type=float, default=0.5,
                   help="multiplier applied to demoted docs' scores "
                        "(default 0.5)")
    q.add_argument("--explain", action="store_true",
                   help="per-term BM25 contribution rows for the top-k "
                        "hits (rows sum to the ranked score)")
    q.add_argument("--correct", action="append", metavar="TERM",
                   help="did-you-mean: max-df dictionary term within "
                        "--fuzzy edits (default 1) of TERM")
    q.add_argument("--suggest", action="append", metavar="PREFIX",
                   help="autocomplete: top-k dictionary terms per prefix")
    q.add_argument("--range-facet", dest="range_facet", type=int,
                   default=0, metavar="W",
                   help="doc-length histogram of the match set, bins "
                        "of W tokens")
    q.add_argument("--export", metavar="DIR",
                   help="stream the FULL match set (scores attached) "
                        "to parquet at DIR instead of printing top-k; "
                        "'term^2.5' boost syntax applies in --query")
    q.add_argument("--must", help="terms every hit must contain")
    q.add_argument("--must-not", dest="must_not",
                   help="terms no hit may contain")
    q.add_argument("--fuzzy", type=int, default=0, metavar="D",
                   help="expand terms to dictionary entries within D edits")
    q.add_argument("--facet", metavar="COL",
                   help="return per-COL match counts instead of hits")
    q.add_argument("--no-boost", dest="no_boost", action="store_true",
                   help="treat '^' in queries literally instead of "
                        "rerouting to boosted search")
    q.add_argument("--collapse", action="store_true",
                   help="top-k conversations (best turn each)")
    q.add_argument("--filter", action="append",
                   help="'attr op value' predicate, repeatable")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    sn = sub.add_parser("snapshot", help="point-in-time hardlink clone "
                        "of a finished index")
    sn.add_argument("--index", required=True)
    sn.add_argument("--dst", required=True)
    sn.add_argument("--copy", action="store_true",
                    help="copy bytes instead of hardlinking")
    sn.set_defaults(fn=cmd_snapshot)

    dl = sub.add_parser("delete", help="tombstone conversations")
    dl.add_argument("--index", required=True)
    dl.add_argument("--conv", action="append",
                    help="conv_id to delete, repeatable")
    dl.add_argument("--from-file", help="file with one conv_id per line")
    dl.add_argument("--num-cpus", type=int, default=None)
    dl.set_defaults(fn=cmd_delete)

    mg = sub.add_parser("merge", help="merge finished indexes into one")
    mg.add_argument("--index", action="append", required=True,
                    help="source index dir, repeatable")
    mg.add_argument("--out", required=True)
    mg.add_argument("--segments", type=int, default=64)
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.set_defaults(fn=cmd_merge)

    ex = sub.add_parser("extend", help="append new conversations to an "
                        "existing index (delta build)")
    ex.add_argument("--input", required=True)
    ex.add_argument("--index", required=True)
    ex.add_argument("--filter", action="append")
    ex.add_argument("--num-cpus", type=int, default=None)
    ex.set_defaults(fn=cmd_extend)

    c = sub.add_parser("corpus", help="generate synthetic transcripts")
    c.add_argument("--out", required=True)
    c.add_argument("--turns", type=int, default=10_000)
    c.add_argument("--seed", type=int, default=42)
    c.set_defaults(fn=cmd_corpus)

    al = sub.add_parser("alias", help="set/show an index alias "
                        "(atomic blue-green flip)")
    al.add_argument("--alias", required=True)
    al.add_argument("--set", metavar="INDEX_DIR",
                    help="point the alias at this index")
    al.set_defaults(fn=cmd_alias)

    s = sub.add_parser("stats", help="show index stats")
    s.add_argument("--index", required=True)
    s.set_defaults(fn=cmd_stats)

    cp = sub.add_parser("compact", help="merge small segments for serving")
    cp.add_argument("--index", required=True)
    cp.add_argument("--out", help="output dir (one-shot mode)")
    cp.add_argument("--segments", type=int, default=64)
    cp.add_argument("--tiered", action="store_true",
                    help="in-place incremental tiered merge (Lucene-"
                         "style; bounded per-merge cost)")
    cp.add_argument("--tier-size", dest="tier_size", type=int, default=10,
                    help="segments per tiered merge (default 10)")
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    st = sub.add_parser("stages", help="list registered stages")
    st.add_argument("--plugins", action="append",
                    help="plugin directory, repeatable")
    st.set_defaults(fn=cmd_stages)

    ap = sub.add_parser("apply", help="run a registered stage over parquet")
    ap.add_argument("--stage", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--columns", action="append")
    ap.add_argument("--args", help="JSON kwargs for the stage")
    ap.add_argument("--plugins", action="append")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.set_defaults(fn=cmd_apply)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
