"""Query-path equivalence + randomized rank-identity property test."""

import numpy as np
import pyarrow as pa
import pytest

from tests.util import SMALL_CFG
from vframe_ray.corpus import generate_queries
from vframe_ray.index.query import search_index


def test_distributed_merge_equals_driver_merge(ray_session, small_index_dir):
    queries = generate_queries(n_terms=800)[:6]
    a = search_index(small_index_dir, queries)             # driver merge
    b = search_index(small_index_dir, queries,
                     driver_merge_max_rows=0)              # groupby merge
    assert a.to_pylist() == b.to_pylist()


def test_query_service_equals_search_index(ray_session, small_index_dir):
    from vframe_ray.index.query import QueryService
    queries = generate_queries(n_terms=800)[:8]
    want = search_index(small_index_dir, queries)
    svc = QueryService(small_index_dir, n_actors=3)
    try:
        got = svc.search(queries)
        got2 = svc.search(queries)           # repeated call, warm actors
        assert got.to_pylist() == want.to_pylist()
        assert got2.to_pylist() == want.to_pylist()
    finally:
        svc.shutdown()


def test_predicate_filtered_search(ray_session, small_corpus_dir, tmp_path):
    """Attribute-filtered BM25 (role == assistant) rank-identical to the
    oracle with the same predicate — skip-labels semantics at query time."""
    import pyarrow.parquet as pq
    import ray.data
    from vframe_ray.index.build import build_index
    from vframe_ray.oracle import OracleIndex

    src = pq.ParquetDataset(small_corpus_dir).read(
        columns=["conv_id", "turn_idx", "text", "role"])
    rows = [(c, t, x, {"role": r}) for c, t, x, r in
            zip(src["conv_id"].to_pylist(), src["turn_idx"].to_pylist(),
                src["text"].to_pylist(), src["role"].to_pylist())]
    oracle = OracleIndex(rows, SMALL_CFG)

    idx = str(tmp_path / "attr_idx")
    ds = ray.data.read_parquet(small_corpus_dir,
                               columns=["conv_id", "turn_idx", "text",
                                        "role"])
    build_index(ds, idx, SMALL_CFG, attribute_cols=["role"])

    queries = generate_queries(n_terms=800)[:6]
    res = search_index(idx, queries, predicates=["role == assistant"])
    got: dict[int, list] = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], []).append(
            (r["conv_id"], r["turn_idx"], r["score"]))
    n_nonempty = 0
    for q in queries:
        exp = [(h.conv_id, h.turn_idx, h.score)
               for h in oracle.search(q["query_text"], q["k"],
                                      predicate=lambda a:
                                      a["role"] == "assistant")]
        assert got.get(q["query_id"], []) == exp, q["query_text"]
        n_nonempty += bool(exp)
    assert n_nonempty > 0                      # the filter isn't vacuous
    # and filtered results differ from unfiltered (predicate has effect)
    unfiltered = search_index(idx, queries)
    assert unfiltered.to_pylist() != res.to_pylist()


def test_three_scorers_identical(ray_session, small_index_dir):
    """score_sparse == score_full == score_bmw on every segment, for a
    spread of real queries plus repeated-term / OOV / k-overshoot edges —
    the search() scorer dispatch (sparse vs dense vs WAND) may therefore
    never change results."""
    from vframe_ray.analyze import Tokenizer
    from vframe_ray.config import EngineConfig
    from vframe_ray.index.build import load_index_meta
    from vframe_ray.index.query import (SegmentSearcher,
                                        _global_df_for_terms)

    cfg_dict, stats, seg_dirs = load_index_meta(small_index_dir)
    cfg = EngineConfig.from_dict(cfg_dict)
    tok = Tokenizer(cfg.analyzer)
    qs = generate_queries(n_terms=800)[:8]
    term_lists = [sorted(set(tok.tokenize(q["query_text"]))) for q in qs]
    term_lists += [["absentterm"], term_lists[0] + ["absentterm"]]
    gdf = _global_df_for_terms(
        small_index_dir, set().union(*map(set, term_lists)))
    checked = 0
    for seg in seg_dirs:
        s = SegmentSearcher(seg, cfg.bm25, stats["n_docs"], stats["avgdl"],
                            gdf, cfg.index.block_size)
        for terms in term_lists:
            for k in (1, 3, 10_000):
                a = s.score_sparse(terms, k)
                b = s.score_full(terms, k)
                c = s.score_bmw(terms, k)
                assert a == b == c, (seg, terms, k)
                checked += bool(a)
    assert checked > 0


def test_dense_cache_tie_boundaries(ray_session, tmp_path):
    """Pathological all-ties corpus: every doc has an identical single-term
    contribution, so the dense-cache prefix / τ-threshold cuts must break
    ties purely by doc id — including k above the cached prefix length."""
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index, load_index_meta
    from vframe_ray.index.query import (SegmentSearcher,
                                        _global_df_for_terms, idf)

    n = 3000                      # > CONTRIB_TOPK (1024) identical docs
    tbl = pa.table({
        "conv_id": pa.array([f"c{i:05d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "text": pa.array(["alpha beta"] * n),
    })
    idx_dir = str(tmp_path / "ties_idx")
    cfg = EngineConfig(index=IndexConfig(num_segments=1, block_size=64))
    build_index(ray.data.from_arrow(tbl), idx_dir, cfg)
    _, stats, seg_dirs = load_index_meta(idx_dir)
    gdf = _global_df_for_terms(idx_dir, {"alpha", "beta"})
    s = SegmentSearcher(seg_dirs[0], cfg.bm25, stats["n_docs"],
                        stats["avgdl"], gdf, cfg.index.block_size)
    for terms in (["alpha"], ["alpha", "beta"]):
        for k in (1, 10, 1024, 1025, 2000, 5000):
            a = s.score_sparse(terms, k)
            b = s.score_full(terms, k)     # builds dense caches
            b2 = s.score_full(terms, k)    # warm fast-path repeat
            c = s.score_bmw(terms, k)
            assert a == b == b2 == c, (terms, k)
            # all scores tie → exact result is docs 0..k-1 ascending
            assert [d for _, d in b] == list(range(min(k, n))), (terms, k)


def test_randomized_corpora_rank_identical(ray_session, tmp_path):
    """Property test: random tiny corpora, engine == oracle on every
    query (catches segment-boundary / tie-break / empty-doc edges the
    fixed corpus misses)."""
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.oracle import OracleIndex

    rng = np.random.default_rng(99)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        rows = []
        n_conv = int(rng.integers(3, 12))
        for c in range(n_conv):
            for t in range(int(rng.integers(1, 6))):
                n = int(rng.integers(0, 8))
                text = " ".join(rng.choice(vocab, n)) if n else ""
                rows.append((f"conv{c:03d}", t, text))
        oracle = OracleIndex(rows, SMALL_CFG)
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows]),
        })
        idx = str(tmp_path / f"idx{trial}")
        cfg = EngineConfig(index=IndexConfig(
            num_segments=int(rng.integers(1, 5)), block_size=4))
        build_index(ray.data.from_arrow(tbl), idx, cfg)
        queries = [{"query_id": i, "query_text": q, "k": int(rng.integers(1, 8))}
                   for i, q in enumerate(
                       [vocab[0], " ".join(rng.choice(vocab, 3)),
                        "absentterm", vocab[5] + " " + vocab[5]])]
        res = search_index(idx, queries, cfg=cfg)
        got: dict[int, list] = {}
        for r in res.to_pylist():
            got.setdefault(r["query_id"], []).append(
                (r["conv_id"], r["turn_idx"], r["score"]))
        for q in queries:
            exp = [(h.conv_id, h.turn_idx, h.score)
                   for h in oracle.search(q["query_text"], q["k"])]
            assert got.get(q["query_id"], []) == exp, \
                (trial, q["query_text"])


def test_export_matches_is_uncut_search(ray_session, tmp_path):
    """export_matches must stay a lazy Dataset and carry exactly the
    docs+scores that a full-k search returns."""
    import ray.data

    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import export_matches, search_index

    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": "apple " * (i % 4) + "banana"} for i in range(20)]
    idx = str(tmp_path / "export_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "apple"},
          {"query_id": 1, "query_text": "banana zzz"}]
    ds = export_matches(idx, qs)
    assert isinstance(ds, ray.data.Dataset)      # lazy, consumable
    got = sorted((r["query_id"], r["conv_id"], r["score"])
                 for r in ds.take_all())
    want = []
    for q in qs:
        full = search_index(idx, [dict(q, k=100)])
        want += [(q["query_id"], r["conv_id"], r["score"])
                 for r in full.to_pylist()]
    assert got == sorted(want)


def test_explain_rows_sum_to_ranked_scores(ray_session, tmp_path):
    """Each top-k doc's per-term contribution rows must sum bit-exactly
    to its ranked score, and cover exactly the terms present in it."""
    import math

    import ray.data

    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import explain_index, search_index

    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": "apple " * (i % 3 + 1) + ("banana " * (i % 2))}
            for i in range(15)]
    idx = str(tmp_path / "explain_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "apple banana", "k": 4},
          {"query_id": 1, "query_text": "banana zzz", "k": 3}]
    top = search_index(idx, qs)
    exp = explain_index(idx, qs).to_pandas()
    by_hit = exp.groupby(["query_id", "rank"])
    for r in top.to_pylist():
        sub = by_hit.get_group((r["query_id"], r["rank"]))
        # float sum in ascending-term order == the ranked score
        total = 0.0
        for c in sub.sort_values("term")["contrib"]:
            total += c
        assert math.isclose(total, r["score"], rel_tol=0, abs_tol=0) or \
            total == r["score"]
        assert (sub["conv_id"] == r["conv_id"]).all()
