"""Reciprocal-rank fusion: the fused ranking must equal a scalar
recomputation from the two raw legs (BM25 scatter-gather ranks, exact
cosine ranks), missing legs contribute exactly 0, and ties at equal
fused score break by doc_id."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fused(ray_session):
    from vframe_ray.pipelines.flagship import rrf_fusion
    return rrf_fusion(SF).to_pandas()


def _legs():
    import os

    import pyarrow.parquet as pq

    from vframe_ray.index.query import search_index
    from vframe_ray.pipelines.flagship import (RRF_QUERIES,
                                               documents_index)
    from vframe_ray.sources.readers import read_parquet
    from vframe_ray.stages.similarity import cosine_topk

    idx = documents_index(SF)
    lex = search_index(idx, [
        {"query_id": q["query_id"], "query_text": q["query_text"],
         "k": q["n"]} for q in RRF_QUERIES]).to_pandas()
    st = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in",
                                 [q["seed_vec"] for q in RRF_QUERIES])])
    seeds = {int(i): np.asarray(v, np.float64)
             for i, v in zip(st["vec_id"].to_pylist(),
                             st["embedding"].to_pylist())}
    vec = cosine_topk(
        read_parquet(os.path.join(SF, "embeddings.parquet"),
                     columns=["vec_id", "embedding"]),
        {q["query_id"]: seeds[q["seed_vec"]] for q in RRF_QUERIES},
        k=max(q["n"] for q in RRF_QUERIES)).to_pandas()
    return lex, vec


def test_rrf_matches_scalar_recompute(fused):
    from vframe_ray.pipelines.flagship import RRF_C, RRF_QUERIES
    lex, vec = _legs()
    rl = {(int(r.query_id), int(r.conv_id)): int(r.rank)
          for r in lex.itertuples()}
    rv = {(int(r.query_id), int(r.vec_id)): int(r.rank)
          for r in vec.itertuples()
          if int(r.rank) <= next(q["n"] for q in RRF_QUERIES
                                 if q["query_id"] == r.query_id)}
    for q in RRF_QUERIES:
        docs = {d for qq, d in list(rl) + list(rv) if qq == q["query_id"]}
        want = sorted(
            ((1.0 / (RRF_C + rl[(q["query_id"], d)])
              if (q["query_id"], d) in rl else 0.0)
             + (1.0 / (RRF_C + rv[(q["query_id"], d)])
                if (q["query_id"], d) in rv else 0.0), -d)
            for d in docs)[::-1][:q["k"]]
        got = fused[fused["query_id"] == q["query_id"]]
        assert len(got) == min(q["k"], len(docs))
        np.testing.assert_array_equal(
            got["doc_id"].to_numpy(), [-d for _, d in want])
        np.testing.assert_array_equal(
            got["rrf"].to_numpy(), [s for s, _ in want])


def test_rrf_single_leg_contribution(fused):
    """Docs present in exactly one leg score exactly 1/(C+r) — the
    other leg contributes a true 0, not a small epsilon."""
    from vframe_ray.pipelines.flagship import RRF_C
    lex, vec = _legs()
    lex_keys = set(zip(lex["query_id"].astype(int),
                       lex["conv_id"].astype(int)))
    vec_keys = set(zip(vec["query_id"].astype(int),
                       vec["vec_id"].astype(int)))
    only = fused[[(q, d) in lex_keys and (q, d) not in vec_keys
                  for q, d in zip(fused["query_id"].astype(int),
                                  fused["doc_id"].astype(int))]]
    if len(only):
        rl = {(int(r.query_id), int(r.conv_id)): int(r.rank)
              for r in lex.itertuples()}
        for r in only.itertuples():
            assert r.rrf == 1.0 / (RRF_C + rl[(int(r.query_id),
                                               int(r.doc_id))])


def test_rrf_ranks_are_dense_and_sorted(fused):
    for qid, g in fused.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        s = g["rrf"].to_numpy()
        assert (np.diff(s) <= 0).all()
        # ties (equal fused score) break by ascending doc_id
        tied = np.diff(s) == 0
        if tied.any():
            d = g["doc_id"].to_numpy()
            assert (d[1:][tied] > d[:-1][tied]).all()
