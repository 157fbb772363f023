"""Benchmark harness — prints ONE JSON line with headline timings.

Headline pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1):
  - index_build   : inverted-index build over a deterministic synthetic
                    transcripts corpus (sized per sf) — turns/sec
  - bm25_query    : the fixed query set against that index — queries/sec
  - plus representative operator pipelines over the sf tables.

Protocol notes:
  - ``ray.init(address='local', num_cpus=$RAY_GRAFT_CPUS)`` (default 32).
  - One UNTIMED warmup build runs first: this host (snapshot-restored VM)
    serves first-touch page faults at 30µs-1ms, so cold runs measure the
    hypervisor, not the engine (see vframe_ray/runtime.py); the guide's
    "warm the cache, then measure" rule applied to memory as well as disk.
  - ``--scaling`` runs the identical job in fresh processes at
    num_cpus=8 and num_cpus=32 over the same input and reports both
    throughputs + efficiency = (T32/T8)/4 — the sandbox stand-in for the
    north rule's N vs 4N cluster sizes.

Crash resilience (BENCH_r04 died rc=1 on a transient Ray-core fault —
raylet stack trace, no Python error): two layers guarantee a parseable
JSON line on stdout with rc=0 even if Ray's core worker dies mid-run.
  1. In-process: every timed stage runs under a catch-all retry — on the
     first failure the Ray session is torn down and re-initialised, the
     stage re-runs once; a second failure marks THAT stage failed and the
     bench continues.  Each completed stage is appended to a progress
     file as it finishes.
  2. Supervisor: the default invocation forks an inner subprocess
     (GRAFT_BENCH_INNER=1) and, if it hard-crashes (core dump, raylet
     abort), relaunches it once; if both attempts die, the supervisor
     assembles a partial result from the progress file and emits it with
     ``"partial": true`` and per-stage status — the driver always gets a
     non-null parse.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench corpus size per sf tag (turns)
CORPUS_TURNS = {"sf0.001": 10_000, "sf0.01": 60_000, "sf0.1": 600_000}
BENCH_ROOT = "/tmp/vframe_ray_bench"


def corpus_dir(tag: str, n_turns: int) -> str:
    d = os.path.join(BENCH_ROOT, f"corpus-{tag}-{n_turns}")
    marker = os.path.join(d, "part-00000.parquet")
    if not os.path.exists(marker):
        from vframe_ray.corpus import write_transcripts
        write_transcripts(d, n_turns, rows_per_file=50_000)
    return d


def _progress_path() -> str | None:
    return os.environ.get("GRAFT_BENCH_PROGRESS")


def _record(event: dict) -> None:
    """Append one progress event (used by the supervisor for partial
    assembly if this process later hard-crashes)."""
    path = _progress_path()
    if not path:
        return
    try:
        with open(path, "a") as f:
            f.write(json.dumps(event) + "\n")
            f.flush()
            os.fsync(f.fileno())
    except OSError:
        pass


def _init_ray() -> None:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # push-based shuffle pipelines the exchange's map/merge phases:
    # measured 33.1s vs 37.7s for the 9.6M build at 32 cpus (and it is
    # the multi-node-ready shuffle path).  shuffle_strategy is the
    # non-deprecated spelling of use_push_based_shuffle (ray 2.49).
    try:
        from ray.data.context import ShuffleStrategy
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except ImportError:
        ctx.use_push_based_shuffle = True


def _run_stage(name: str, fn, timings: dict, statuses: dict):
    """Run one timed stage with a single teardown-reinit retry.

    Returns fn()'s result on success, None after two failures (the
    failure is recorded in ``statuses`` and the bench continues).
    ``fn`` must do its own warmup and return when the TIMED work is
    done; timing here brackets the whole call, so fn times itself via
    the dict when warmup must be excluded."""
    import ray
    for attempt in (0, 1):
        try:
            out = fn()
            statuses[name] = "ok"
            if name in timings:
                _record({"stage": name, "sec": timings[name]})
            if os.environ.get("GRAFT_BENCH_CRASH_AFTER") == name:
                os._exit(134)   # test hook: simulate a raylet abort
            return out
        except BaseException as e:  # RaySystemError can surface as abort
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            sys.stderr.write(f"bench: stage {name} attempt {attempt} "
                             f"failed: {type(e).__name__}: {e}\n")
            if attempt == 0:
                # transient raylet/core-worker fault: recycle the session
                try:
                    ray.shutdown()
                except Exception:
                    pass
                time.sleep(2)
                try:
                    _init_ray()
                except Exception as ie:
                    sys.stderr.write(f"bench: ray re-init failed: {ie}\n")
            else:
                statuses[name] = f"failed: {type(e).__name__}"
                _record({"stage": name, "status": statuses[name]})
                return None


def run_bench() -> dict:
    _init_ray()

    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.corpus import generate_queries
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import search_index
    from vframe_ray.sources.readers import read_parquet as _read_parquet

    tag = os.path.basename(os.path.normpath(SF_DIR))
    n_turns = int(os.environ.get("GRAFT_BENCH_TURNS",
                                 CORPUS_TURNS.get(tag, 100_000)))
    cdir = corpus_dir(tag, n_turns)
    # segment count scales with corpus so per-group working set stays
    # ~constant (~9.4k docs): bounded builder memory at any data size —
    # the same rule that sizes segments to ~1-2 GB of text at 100 TB
    n_segments = max(64, n_turns // 9_400)
    cfg = EngineConfig(index=IndexConfig(num_segments=n_segments))
    queries = generate_queries()
    timings: dict[str, float] = {}
    statuses: dict[str, str] = {}
    _record({"meta": {"sf": tag, "num_cpus": NUM_CPUS,
                      "corpus_turns": n_turns}})

    def read_corpus():
        # blocks == cpu count: the all-to-all exchange cost scales with
        # in_blocks × out_partitions object transfers, which on this host
        # (expensive object-store ops) dominates the build when blocks
        # are small — measured 2.5× faster at 2.4M turns with 32 blocks
        # than with the default 240
        return _read_parquet(cdir,
                             columns=["conv_id", "turn_idx", "text"],
                             override_num_blocks=NUM_CPUS)

    # -------- index build (warmup + timed).  Task-based builders run on
    # the session's persistent (already warmed) worker pool — measured
    # 35-37s vs 40-55s for a fresh actor pool at 9.6M/32cpus on this
    # host, where every new actor pays the first-touch fault tax.
    idx_dir = os.path.join(BENCH_ROOT, f"idx-{tag}-{NUM_CPUS}")

    def _stage_build():
        warm_dir = os.path.join(BENCH_ROOT, f"warm-{tag}-{NUM_CPUS}")
        shutil.rmtree(warm_dir, ignore_errors=True)
        build_index(read_corpus(), warm_dir, cfg, use_actor_pool=False)
        search_index(warm_dir, queries)
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        stats = build_index(read_corpus(), idx_dir, cfg,
                            use_actor_pool=False)
        timings["index_build"] = time.time() - t0
        return stats

    stats = _run_stage("index_build", _stage_build, timings, statuses)
    turns_per_sec = (stats["n_docs"] / timings["index_build"]
                     if stats is not None else None)
    if turns_per_sec is not None:
        _record({"kpi": {"turns_indexed_per_sec": round(turns_per_sec, 1)}})

    # -------- query throughput via the persistent query service
    # (searcher actors with resident docmaps — the serving architecture;
    # spin-up is untimed, like the warmup build)
    def _stage_query():
        from vframe_ray.index.query import QueryService
        svc = QueryService(idx_dir, n_actors=NUM_CPUS)
        # identical repeated batches would hit the request cache and
        # measure dict lookups — this KPI is SCORING throughput
        svc.request_cache_size = 0
        svc._req_cache.clear()
        try:
            svc.search(queries)               # warm the service (heaps,
            svc.search(queries)               # postings + decode caches)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                svc.search(queries)
            timings["bm25_query"] = time.time() - t0
            return (len(queries) * reps) / timings["bm25_query"]
        finally:
            svc.shutdown()

    queries_per_sec = None
    if stats is not None:
        queries_per_sec = _run_stage("bm25_query", _stage_query,
                                     timings, statuses)
        if queries_per_sec is not None:
            _record({"kpi": {"bm25_queries_per_sec":
                             round(queries_per_sec, 2)}})
    else:
        statuses["bm25_query"] = "skipped: index_build failed"

    # -------- representative operator pipelines over the sf tables.
    # Same warmup discipline as the build: one untimed pass per pipeline
    # faults in the worker heaps / page cache that THIS pipeline's tasks
    # touch, so the timed pass measures the engine rather than the host's
    # first-touch fault service (3.6 s per fresh 64 MB measured on this
    # VM in a bad window — BASELINE.md §3).
    from vframe_ray.pipelines import relational as rel
    import __ray_entry__ as entrymod
    entry_queries = entrymod.queries()

    def retrieval_suite(sf_dir):
        # the round-3 retrieval surface in one timing: boolean, prefix,
        # facets, MLT, paging, counts, synonyms, fuzzy over the cached
        # documents/conversations indexes
        from vframe_ray.pipelines import flagship as fs
        fs.bm25_boolean(sf_dir)
        fs.bm25_prefix(sf_dir)
        fs.search_facets(sf_dir)
        fs.more_like_this(sf_dir)
        fs.bm25_paged(sf_dir)
        fs.match_counts(sf_dir)
        fs.bm25_synonyms(sf_dir)
        fs.bm25_fuzzy(sf_dir)
        # fourth wave: proximity, boosts, cursor paging, range facets,
        # autocomplete
        fs.bm25_proximity(sf_dir)
        fs.bm25_boosted(sf_dir)
        fs.bm25_search_after(sf_dir)
        fs.facet_dl_ranges(sf_dir)
        fs.suggest_documents(sf_dir)
        # final wave: span-first (positional min-pos filter + TAAT)
        # and common-terms (low-df-driven recall)
        fs.bm25_span_first(sf_dir)
        fs.bm25_common_terms(sf_dir)

    def graph_suite(sf_dir):
        from vframe_ray.pipelines.relational import _copurchase_edges
        from vframe_ray.stages.graph import (node_clustering, pagerank,
                                             triangle_count)
        import numpy as np
        edges = _copurchase_edges(sf_dir).materialize()
        pagerank(edges).count()
        triangle_count(edges)
        # round-5 additions: seeded-teleport PPR (same BSP/fast path)
        # and per-node clustering (degree-ordered wedge join with
        # corner counts).  common_neighbors is deliberately NOT here:
        # exact CN is Σ deg(c)² wedge work (~148M wedges / ~91 s at
        # sf0.1, measured) — an inherent-cost operator, not a
        # regression canary.
        seeds = np.arange(0, 20_000, 97, dtype=np.int64)
        pagerank(edges, seeds=seeds).count()
        node_clustering(edges)

    def stats_suite(sf_dir):
        # the final-wave grouped analytics over the DATA-SIZED tables
        # (orders 150k / lineitem 600k at sf0.1): histogram-combiner
        # robust stats, bounded top-n partials, rank windows, the
        # RANGE time frame, integer-moment regression, and two-round
        # exact selection.  (source drift / term vectors / span-first
        # run over the 500-row documents table — retrieval_suite and
        # the driver board cover those.)
        entry_queries["trimmed_mean_price"](sf_dir)
        entry_queries["mode_event_by_user"](sf_dir)
        entry_queries["top3_order_revenue"](sf_dir)
        rel.acctbal_percent_rank(sf_dir)
        rel.range_window_revenue(sf_dir)
        entry_queries["price_linregress"](sf_dir)
        entry_queries["exact_price_percentiles"](sf_dir)

    def tpch_tail(sf_dir):
        # the completion wave's data-sized shapes: groupwise argmin
        # with join-back (Q2), the five-table star (Q9), and the
        # derived-class dual CASE counts (Q12).  Q11/Q19/Q20 are
        # dimension-broadcast single-pass scans — their cost is the
        # same pruned lineitem read q19 already represents.
        rel.q2_min_cost_supplier(sf_dir)
        rel.q9_product_type_profit(sf_dir)
        rel.q12_ship_latency(sf_dir)
        rel.q19_disjunctive_revenue(sf_dir)

    def corpus_analysis(sf_dir):
        # the round-5 corpus-analysis family at TRANSCRIPT scale
        # (600k turns at sf0.1, not the 5k-row documents table):
        # byte entropy (pure map), term burstiness (exact integer
        # moments), and the role-alternation protocol check over the
        # corpus's REAL role column.  The heavier siblings are one-off
        # measured in BASELINE.md §2p rather than inflating the
        # headline: vocab_growth 11.9 s, bigram_pmi 14.7 s, novelty
        # 18.6 s at 600k turns / 32 cpus.
        import pyarrow as pa
        import pyarrow.compute as _pc

        from vframe_ray.stages import stats as st
        from vframe_ray.stages.sessionize import role_alternation_violations
        from vframe_ray.stages.textquality import char_entropy
        from vframe_ray.stages.tokenize import tokenize

        def to_docs(t):
            convno = _pc.cast(_pc.utf8_slice_codeunits(t["conv_id"], 5),
                              pa.int64())
            did = _pc.add(_pc.multiply(convno, 100),
                          _pc.cast(t["turn_idx"], pa.int64()))
            return pa.table({"doc_id": did, "text": t["text"]})

        docs = read_corpus().map_batches(to_docs, batch_format="pyarrow",
                                         zero_copy_batch=True)
        char_entropy(docs).count()
        st.term_burstiness(tokenize(read_corpus()), n_turns, k=20)
        roles = _read_parquet(cdir, columns=["conv_id", "turn_idx",
                                             "role"],
                              override_num_blocks=NUM_CPUS)
        role_alternation_violations(roles).count()

    def quality_wave(sf_dir):
        # round-5 third session at TRANSCRIPT scale: unigram-LM
        # cross-entropy (two keyed exchanges + the C pre-pass), Flesch
        # readability and the C4 rule filter (both pure maps), over the
        # 600k-turn corpus; plus the edit-distance repair join over the
        # full events table (distinct-key SymSpell candidates).
        import pyarrow as pa
        import pyarrow.compute as _pc

        from vframe_ray.stages.textquality import (c4_rule_filter,
                                                   flesch_reading_ease,
                                                   unigram_cross_entropy)

        def to_docs(t):
            convno = _pc.cast(_pc.utf8_slice_codeunits(t["conv_id"], 5),
                              pa.int64())
            did = _pc.add(_pc.multiply(convno, 100),
                          _pc.cast(t["turn_idx"], pa.int64()))
            return pa.table({"doc_id": did, "text": t["text"]})

        docs = read_corpus().map_batches(to_docs, batch_format="pyarrow",
                                         zero_copy_batch=True)
        unigram_cross_entropy(docs).count()
        flesch_reading_ease(docs).count()
        c4_rule_filter(docs).count()
        entry_queries["fuzzy_repair_event_types"](sf_dir)

    def data_prep(sf_dir):
        # the composed LLM data-prep flagship at transcript scale:
        # normalized dedup -> length gate -> self-calibrating
        # cross-entropy gate -> chunking -> per-source mix report
        import pyarrow as pa
        import pyarrow.compute as _pc

        from vframe_ray.pipelines.flagship import prepare_training_data

        def to_docs(t):
            convno = _pc.cast(_pc.utf8_slice_codeunits(t["conv_id"], 5),
                              pa.int64())
            did = _pc.add(_pc.multiply(convno, 100),
                          _pc.cast(t["turn_idx"], pa.int64()))
            src = _pc.binary_join_element_wise(
                pa.array(["s"] * t.num_rows),
                _pc.cast(_pc.cast(_pc.bit_wise_and(convno, 7),
                                  pa.int32()), pa.string()), "")
            return pa.table({"doc_id": did, "text": t["text"],
                             "source": src})

        docs = read_corpus().map_batches(to_docs, batch_format="pyarrow",
                                         zero_copy_batch=True)
        prepare_training_data(docs)

    pipelines = [("q1_pricing_summary", rel.q1_pricing_summary),
                 ("revenue_by_nation", rel.revenue_by_nation),
                 ("top_orders", rel.top_orders),
                 ("dedup_exact", entry_queries["dedup_exact"]),
                 ("cosine_topk", entry_queries["cosine_topk"]),
                 ("range_join", rel.events_in_order_windows),
                 ("contamination", entry_queries["cross_contamination"]),
                 ("percolate", lambda d: entry_queries["percolate_docs"](
                     d).materialize()),
                 ("retrieval_suite", retrieval_suite),
                 # round 4: the two data-sized new operators (the rest
                 # run over the 500-row documents table)
                 ("q3_join_topk", rel.q3_shipping_priority),
                 ("running_window", rel.running_customer_revenue),
                 ("q5_join", rel.q5_local_supplier_revenue),
                 # round 5: two-fact-table join with pre-shuffle
                 # dimension prune, and the distributed-sort + global
                 # prefix scan (the other new r5 ops are dimension- or
                 # 500-row-documents-sized)
                 ("q7_join", rel.q7_volume_shipping),
                 ("pareto_scan", rel.revenue_pareto),
                 # end-of-round-5: the data-sized sketch (fixed-size
                 # partials over 60k events) and the real-media decode
                 # family (500 synthesized payloads per format through
                 # the actor-pool codecs)
                 ("hll_distinct", entry_queries["hll_distinct_users"]),
                 ("media_decode", lambda d: (
                     entry_queries["bmp_image_features"](d),
                     entry_queries["gif_frame_features"](d))),
                 # graph analytics over the lineitem co-purchase graph
                 # (~1.2M distinct edges / 1.9M triangles at sf0.1):
                 # one shared edge build, then integer-exact PageRank
                 # power iteration + degree-ordered triangle count
                 ("graph_suite", graph_suite),
                 # round-5 TPC-H completion (all 22 shapes covered)
                 ("tpch_tail", tpch_tail),
                 # exact k-NN graph over the embeddings table (blocked
                 # all-pairs with running per-anchor top-k)
                 ("knn_graph", entry_queries["knn_graph_embeddings"]),
                 # final wave: grouped robust stats / windows /
                 # regression / exact selection over orders+lineitem
                 ("stats_suite", stats_suite),
                 # round-5 second session: the corpus-analysis family
                 # at transcript scale (entropy, Heaps growth,
                 # burstiness, bigram PMI, novelty, role alternation)
                 ("corpus_analysis", corpus_analysis),
                 # round-5 third session: the LLM-quality wave at
                 # transcript scale + the fuzzy repair join
                 ("quality_wave", quality_wave),
                 # the composed dedup->gate->chunk flagship (one run,
                 # five stages, two hash_joins) at 600k docs
                 ("data_prep", data_prep)]
    for name, fn in pipelines:
        def _stage(fn=fn, name=name):
            fn(SF_DIR)                            # untimed warmup
            t0 = time.time()
            fn(SF_DIR)
            timings[name] = time.time() - t0
        _run_stage(name, _stage, timings, statuses)

    total = sum(timings.values())
    n_failed = sum(1 for s in statuses.values() if s != "ok")
    out = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": tag,
        "num_cpus": NUM_CPUS,
        "corpus_turns": n_turns,
        "turns_indexed_per_sec": (round(turns_per_sec, 1)
                                  if turns_per_sec else None),
        "bm25_queries_per_sec": (round(queries_per_sec, 2)
                                 if queries_per_sec else None),
        "pipeline_status": statuses,
        "partial": n_failed > 0,
    }
    import ray
    try:
        ray.shutdown()
    except Exception:
        pass
    return out


def supervise() -> int:
    """Fork the bench as a subprocess; survive a hard Ray-core crash.

    Attempt the inner run up to twice.  On success, relay its final JSON
    line.  If both attempts die (rc!=0 / no JSON), assemble a partial
    result from the progress file so the caller still gets one parseable
    JSON line and rc=0."""
    tag = os.path.basename(os.path.normpath(SF_DIR))
    last_stderr = ""
    progress = tempfile.NamedTemporaryFile(
        mode="w", suffix=".jsonl", prefix="vframe_bench_", delete=False)
    progress.close()
    try:
        for attempt in (0, 1):
            open(progress.name, "w").close()     # fresh per attempt
            env = dict(os.environ, GRAFT_BENCH_INNER="1",
                       GRAFT_BENCH_PROGRESS=progress.name)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True)
            sys.stderr.write(proc.stderr)
            lines = [l for l in proc.stdout.strip().splitlines()
                     if l.startswith("{")]
            if proc.returncode == 0 and lines:
                print(lines[-1])
                return 0
            last_stderr = proc.stderr
            sys.stderr.write(f"bench: inner attempt {attempt} crashed "
                             f"rc={proc.returncode}; "
                             + ("retrying\n" if attempt == 0 else
                                "assembling partial result\n"))
        # both attempts died: partial assembly from the progress file
        timings: dict[str, float] = {}
        statuses: dict[str, str] = {}
        meta: dict = {}
        kpis: dict = {}
        try:
            with open(progress.name) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "meta" in ev:
                        meta.update(ev["meta"])
                    elif "kpi" in ev:
                        kpis.update(ev["kpi"])
                    elif "sec" in ev:
                        timings[ev["stage"]] = ev["sec"]
                        statuses[ev["stage"]] = "ok"
                    elif "status" in ev:
                        statuses[ev["stage"]] = ev["status"]
        except OSError:
            pass
        out = {
            "metric": "headline_total",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": meta.get("sf", tag),
            "num_cpus": meta.get("num_cpus", NUM_CPUS),
            "corpus_turns": meta.get("corpus_turns"),
            "turns_indexed_per_sec": kpis.get("turns_indexed_per_sec"),
            "bm25_queries_per_sec": kpis.get("bm25_queries_per_sec"),
            "pipeline_status": statuses,
            "partial": True,
            "crash_rc": proc.returncode,
            "crash_tail": "\n".join(
                last_stderr.strip().splitlines()[-5:]),
        }
        print(json.dumps(out))
        return 0
    finally:
        try:
            os.unlink(progress.name)
        except OSError:
            pass


def run_scaling() -> None:
    """Same job, fresh processes, two parallelism levels.

    ``GRAFT_SCALING_REPS`` (default 1) repeats each level and reports
    MEDIAN throughputs plus the per-run distribution: this host's
    first-touch fault service makes identical builds fluctuate +-30%
    (BASELINE.md §3), so a single-sample ratio is mostly substrate
    noise -- medians are the defensible estimator.
    """
    import statistics
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "1"))
    results = {8: [], 32: []}
    for (ncpu, _rep) in [(n, r) for n in (8, 32) for r in range(reps)]:
        # a 4× corpus for scaling runs so parallel work dominates the
        # per-execution serial floor (~5s: sort coordination, planning,
        # actor-pool spin-up) — at 600k turns that floor alone caps
        # efficiency near 0.6 regardless of the engine
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_TURNS=os.environ.get("GRAFT_SCALING_TURNS",
                                                    "9600000"))
        env.pop("GRAFT_BENCH_INNER", None)   # each level gets a supervisor
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True)
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            sys.stderr.write(f"--- bench subprocess (cpus={ncpu}) failed "
                             f"rc={proc.returncode}; stderr tail:\n")
            sys.stderr.write("\n".join(
                proc.stderr.strip().splitlines()[-25:]) + "\n")
            raise RuntimeError(f"bench subprocess failed at {ncpu} cpus")
        parsed = json.loads(lines[-1])
        if parsed.get("turns_indexed_per_sec") is None:
            raise RuntimeError(
                f"bench subprocess at {ncpu} cpus returned no build KPI "
                f"(partial={parsed.get('partial')})")
        results[ncpu].append(parsed)
    t8s = [r["turns_indexed_per_sec"] for r in results[8]]
    t32s = [r["turns_indexed_per_sec"] for r in results[32]]
    t8, t32 = statistics.median(t8s), statistics.median(t32s)
    eff = (t32 / t8) / (32 / 8)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "reps": reps,
        "turns_per_sec_8cpu": t8,
        "turns_per_sec_32cpu": t32,
        "turns_per_sec_8cpu_runs": t8s,
        "turns_per_sec_32cpu_runs": t32s,
        "build_sec_8cpu": [r["queries"]["index_build"] for r in results[8]],
        "build_sec_32cpu": [r["queries"]["index_build"]
                            for r in results[32]],
        # medians over reps, matching the headline estimator (ADVICE.md:
        # last-rep single samples mixed estimators in one report)
        "bm25_qps_8cpu": statistics.median(
            [r["bm25_queries_per_sec"] for r in results[8]]),
        "bm25_qps_32cpu": statistics.median(
            [r["bm25_queries_per_sec"] for r in results[32]]),
        "sf": results[32][-1]["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif os.environ.get("GRAFT_BENCH_INNER") == "1":
        print(json.dumps(run_bench()))
    else:
        sys.exit(supervise())
