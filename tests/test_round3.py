"""Round-3 additions: distributed blocked exact dup pairs, SRP-bucketed
near-dup pairs (recall vs the exact oracle on a planted corpus), ranked
phrase queries, incremental index append."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _planted_embeddings(n_base=400, n_near=40, dim=64, noise=0.18, seed=7):
    """Base vectors + noisy near-copies of the first n_near (cosine
    ~0.92-0.99): every (i, n_base+i) pair clears a 0.9 threshold."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    near = base[:n_near] + noise * rng.standard_normal((n_near, dim))
    M = np.vstack([base, near])
    return pa.table({
        "vec_id": pa.array(np.arange(len(M)), pa.int64()),
        "embedding": pa.array([list(r) for r in M],
                              pa.list_(pa.float64()))})


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    return ray.data.from_arrow(_planted_embeddings())


def test_blocked_exact_equals_driver_oracle(ray_session, planted_ds):
    """The distributed chunk-pair path must reproduce the driver-side
    O(N²) oracle exactly — including chunk-boundary and same-chunk
    pairs (rows_per_chunk far below N forces many cross-chunk tasks)."""
    from vframe_ray.stages.similarity import (cosine_dup_pairs,
                                              cosine_dup_pairs_driver_oracle)
    want = cosine_dup_pairs_driver_oracle(planted_ds,
                                          threshold=0.9).to_pylist()
    got = cosine_dup_pairs(planted_ds, threshold=0.9,
                           rows_per_chunk=64).to_pylist()
    assert got == want
    assert len(got) >= 40


def test_blocked_exact_nondefault_scratch(ray_session, planted_ds,
                                          tmp_path, monkeypatch):
    """VFRAME_RAY_SCRATCH redirects the chunk exchange to a configurable
    (cluster-addressable) root; results are unchanged and the scratch is
    cleaned up afterwards (VERDICT r3 wrong #2)."""
    from vframe_ray import storage
    from vframe_ray.stages.similarity import (cosine_dup_pairs,
                                              cosine_dup_pairs_driver_oracle)
    root = str(tmp_path / "shared_fs" / "scratch")
    monkeypatch.setenv("VFRAME_RAY_SCRATCH", root)
    assert storage.scratch_root() == root
    want = cosine_dup_pairs_driver_oracle(planted_ds,
                                          threshold=0.9).to_pylist()
    got = cosine_dup_pairs(planted_ds, threshold=0.9,
                           rows_per_chunk=64).to_pylist()
    assert got == want
    import os
    pairs_root = os.path.join(root, "pairs")
    assert not os.path.exists(pairs_root) or not os.listdir(pairs_root)


def _small_phrases(small_corpus_dir):
    import pyarrow.parquet as pq
    from vframe_ray.analyze import Tokenizer
    tok = Tokenizer()
    t = pq.ParquetDataset(small_corpus_dir).read(columns=["text"])
    phrases = []
    for txt in t["text"].to_pylist():
        ts = tok.tokenize(txt)
        if len(ts) >= 2:
            phrases.append(" ".join(ts[:2]))
        if len(phrases) >= 4:
            break
    return [{"query_id": i, "phrase": p, "k": 5}
            for i, p in enumerate(phrases)]


def test_phrase_rank_paths_agree(ray_session, small_index_dir,
                                 small_corpus_dir):
    """One-shot phrase_rank_index == persistent QueryService ranked
    phrases; every ranked row is a true phrase hit; scores equal the
    plain BM25 scores of those docs for the phrase's terms."""
    from vframe_ray.index.query import (QueryService, phrase_rank_index,
                                        phrase_search_index, search_index)
    qs = _small_phrases(small_corpus_dir)
    one_shot = phrase_rank_index(small_index_dir, qs)
    svc = QueryService(small_index_dir, n_actors=2)
    try:
        served = svc.search_ranked_phrases(qs)
    finally:
        svc.shutdown()
    assert one_shot.to_pylist() == served.to_pylist()
    assert one_shot.num_rows > 0

    hits = phrase_search_index(small_index_dir,
                               [{"query_id": q["query_id"],
                                 "phrase": q["phrase"]} for q in qs])
    hitset = {(r["query_id"], r["conv_id"], r["turn_idx"])
              for r in hits.to_pylist()}
    for r in one_shot.to_pylist():
        assert (r["query_id"], r["conv_id"], r["turn_idx"]) in hitset

    # scores: BM25 of the phrase terms, restricted to hit docs — compare
    # against a large-k plain search over the same terms
    plain = search_index(small_index_dir,
                         [{"query_id": q["query_id"],
                           "query_text": q["phrase"], "k": 100000}
                          for q in qs])
    want = {(r["query_id"], r["conv_id"], r["turn_idx"]): r["score"]
            for r in plain.to_pylist()}
    for r in one_shot.to_pylist():
        assert want[(r["query_id"], r["conv_id"], r["turn_idx"])] \
            == r["score"]


def test_phrase_rank_predicates(ray_session, small_corpus_dir, tmp_path):
    """Ranked phrases respect attribute predicates (skip-labels through
    the phrase path)."""
    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import phrase_rank_index
    from vframe_ray.sources.readers import read_transcripts

    d = str(tmp_path / "phrase_attr_idx")
    ds = read_transcripts(small_corpus_dir,
                          columns=["conv_id", "turn_idx", "text", "role"])
    build_index(ds, d, SMALL_CFG, attribute_cols=["role"])
    qs = _small_phrases(small_corpus_dir)
    allr = phrase_rank_index(d, qs)
    only_user = phrase_rank_index(d, qs, predicates=["role == user"])
    assert 0 < only_user.num_rows <= allr.num_rows
    # every filtered row exists in the unfiltered hit universe
    allset = {(r["query_id"], r["conv_id"], r["turn_idx"], r["score"])
              for r in allr.to_pylist()}
    # (ranks differ after filtering; compare identity+score membership
    # only for rows whose rank survives in the unfiltered top-k)
    survivors = [r for r in only_user.to_pylist()
                 if (r["query_id"], r["conv_id"], r["turn_idx"],
                     r["score"]) in allset]
    assert survivors  # the filter keeps a nonempty overlap


def _remap_conv(ds, prefix: b"bytes" = b"b"):
    """Prefix conv_ids so two synthetic corpora become disjoint."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        conv = pc.binary_join_element_wise(
            pa.array([prefix.decode()] * t.num_rows),
            t["conv_id"].combine_chunks() if isinstance(
                t["conv_id"], pa.ChunkedArray) else t["conv_id"], "-")
        return t.set_column(t.schema.get_field_index("conv_id"),
                            "conv_id", conv)

    return ds.map_batches(fn, batch_format="pyarrow")


def test_extend_index_equals_fresh_union(ray_session, tmp_path):
    """build(A) + extend(B) must answer every query identically —
    ranks AND bit-exact scores — to a fresh build over A ∪ B (the
    reference's `open -i prior.json` continue/extend contract), and a
    repeated extend must be a no-op (idempotent global stats)."""
    from tests.util import SMALL_CFG
    from vframe_ray.corpus import generate_queries, write_transcripts
    from vframe_ray.index.build import build_index, extend_index, \
        load_index_meta
    from vframe_ray.index.query import search_index
    from vframe_ray.sources.readers import read_transcripts

    a_dir, b_dir = str(tmp_path / "corpA"), str(tmp_path / "corpB")
    write_transcripts(a_dir, 1200, rows_per_file=400, n_terms=800)
    write_transcripts(b_dir, 700, rows_per_file=400, n_terms=800)
    cols = ["conv_id", "turn_idx", "text"]
    ds_a = read_transcripts(a_dir, columns=cols)
    ds_b = _remap_conv(read_transcripts(b_dir, columns=cols))

    idx_ext = str(tmp_path / "idx_ext")
    build_index(ds_a, idx_ext, SMALL_CFG)
    stats1 = extend_index(ds_b, idx_ext, num_new_segments=3)

    idx_fresh = str(tmp_path / "idx_fresh")
    build_index(ds_a.union(ds_b), idx_fresh, SMALL_CFG)
    _, fresh_stats, _ = load_index_meta(idx_fresh)
    assert stats1["n_docs"] == fresh_stats["n_docs"]
    assert stats1["total_len"] == fresh_stats["total_len"]

    queries = generate_queries(n_terms=800)
    a = search_index(idx_ext, queries)
    b = search_index(idx_fresh, queries)
    assert a.to_pylist() == b.to_pylist()
    assert a.num_rows > 0

    # idempotence: re-extending with the SAME corpus resumes every new
    # segment by fingerprint and rebuilds identical global stats
    stats2 = extend_index(ds_b, idx_ext, num_new_segments=3)
    assert stats2 == stats1
    assert search_index(idx_ext, queries).to_pylist() == b.to_pylist()


def test_srp_dup_pairs_recall(ray_session, planted_ds):
    """The SRP-bucketed path must find EVERY pair the exact path finds
    on the planted corpus (VERDICT r3 done-criterion), and — because
    each bucket verifies exactly — never a pair below threshold."""
    from vframe_ray.stages.similarity import (cosine_dup_pairs_driver_oracle,
                                              srp_dup_pairs)
    exact = cosine_dup_pairs_driver_oracle(planted_ds,
                                           threshold=0.9).to_pylist()
    srp = srp_dup_pairs(planted_ds, threshold=0.9, dim=64).to_pylist()
    ekeys = {(r["id_a"], r["id_b"]): r["sim_r"] for r in exact}
    skeys = {(r["id_a"], r["id_b"]): r["sim_r"] for r in srp}
    assert set(ekeys) <= set(skeys), "SRP missed exact pairs"
    assert all(v >= 0.9 for v in skeys.values())
    # verified sims are exact, so any emitted pair matches the oracle
    for k, v in skeys.items():
        assert ekeys[k] == v


def _brute_knn(tbl, k=3):
    """Driver-side brute-force k-NN with the engine's exact ranking
    rule: sims rounded to 6 dp, order (sim_r desc, nbr_id asc)."""
    import pandas as pd
    M = np.stack([np.asarray(r) for r in
                  tbl["embedding"].to_pylist()]).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy()
    sims = np.round(M @ M.T, 6)
    rows = []
    for i in range(len(ids)):
        cand = [(-sims[i, j], ids[j]) for j in range(len(ids))
                if ids[j] != ids[i]]
        cand.sort()
        for r, (ns, nid) in enumerate(cand[:k], start=1):
            rows.append((int(ids[i]), r, int(nid), -ns))
    return pd.DataFrame(rows, columns=["vec_id", "rank", "nbr_id",
                                       "sim_r"])


def test_knn_graph_vs_brute_multichunk(ray_session):
    """Forced multi-chunk path (rows_per_chunk << N) must equal brute
    force, including the planted EXACT duplicate (sim 1.0, rank-1 tie
    broken by nbr_id on both sides) and self-exclusion."""
    import pandas as pd
    from vframe_ray.stages.similarity import knn_graph

    tbl = _planted_embeddings(n_base=120, n_near=12)
    # plant an exact duplicate of vector 0 with a HIGHER id: the dup
    # must be 0's rank-1 at sim 1.0, and 0 the dup's rank-1
    M0 = tbl["embedding"].to_pylist()[0]
    tbl = pa.concat_tables([tbl, pa.table({
        "vec_id": pa.array([999], pa.int64()),
        "embedding": pa.array([M0], pa.list_(pa.float64()))})])
    ds = ray.data.from_arrow(tbl)
    want = _brute_knn(tbl, k=3)
    got = knn_graph(ds, k=3, rows_per_chunk=32).to_pandas()
    pd.testing.assert_frame_equal(
        got.astype({"vec_id": "int64", "rank": "int64",
                    "nbr_id": "int64"}),
        want.astype({"vec_id": "int64", "rank": "int64",
                     "nbr_id": "int64"}))
    g0 = got[got["vec_id"] == 0].iloc[0]
    assert (g0["rank"], g0["nbr_id"], g0["sim_r"]) == (1, 999, 1.0)
    assert (got["nbr_id"] != got["vec_id"]).all()
