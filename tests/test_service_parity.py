"""QueryService parity with the one-shot functions for the round-3
retrieval surface (boolean / prefix / collapse / facets / MLT)."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (QueryService, facet_counts_index,
                                    more_like_this_index,
                                    search_boolean_index, search_index,
                                    search_prefix_index)

ROWS = [
    {"conv_id": "c0", "turn_idx": 0, "text": "apple banana rare", "lang": "en"},
    {"conv_id": "c0", "turn_idx": 1, "text": "apple apricot", "lang": "en"},
    {"conv_id": "c1", "turn_idx": 0, "text": "banana berry apple", "lang": "de"},
    {"conv_id": "c2", "turn_idx": 0, "text": "apricot cherry rare", "lang": "en"},
    {"conv_id": "c3", "turn_idx": 0, "text": "banana cherry", "lang": "fr"},
    {"conv_id": "c4", "turn_idx": 0, "text": "apple rare rare", "lang": "de"},
]


def test_service_parity_new_ops(ray_session, tmp_path):
    idx = str(tmp_path / "svc_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG,
                attribute_cols=["lang"])
    svc = QueryService(idx, n_actors=2)
    try:
        bq = [{"query_id": 0, "must": "apple", "should": "banana",
               "must_not": "cherry", "k": 10},
              {"query_id": 1, "must": "", "should": "rare berry",
               "must_not": "apricot", "k": 10}]
        assert svc.search_boolean(bq).to_pylist() == \
            search_boolean_index(idx, bq).to_pylist()

        pq_ = [{"query_id": 0, "query_text": "ap* cherry", "k": 10},
               {"query_id": 1, "query_text": "b*", "k": 10}]
        assert svc.search_prefix(pq_).to_pylist() == \
            search_prefix_index(idx, pq_).to_pylist()

        cq = [{"query_id": 0, "query_text": "apple rare", "k": 3}]
        assert svc.search(cq, collapse=True).to_pylist() == \
            search_index(idx, cq, collapse=True).to_pylist()

        fq = [{"query_id": 0, "query_text": "apple"},
              {"query_id": 1, "query_text": "cherry rare"}]
        assert svc.facet_counts(fq, "lang").to_pylist() == \
            facet_counts_index(idx, fq, "lang").to_pylist()

        mq = [{"query_id": 0, "text": "apple rare rare banana", "k": 3,
               "exclude": ("c4", 0)}]
        assert svc.more_like_this(mq, max_query_terms=2).to_pylist() == \
            more_like_this_index(idx, mq, max_query_terms=2).to_pylist()
    finally:
        svc.shutdown()


def test_service_parity_fuzzy_synonyms(ray_session, tmp_path):
    """Served fuzzy/synonym rewrites must equal the one-shot paths."""
    from vframe_ray.index.query import (QueryService, search_fuzzy_index,
                                        search_synonym_index)
    idx = str(tmp_path / "svc_idx2")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG,
                attribute_cols=["lang"])
    svc = QueryService(idx, n_actors=2)
    try:
        syn = {"apple": ["apricot"], "rare": ["berry"]}
        sq = [{"query_id": 0, "query_text": "apple cherry", "k": 10},
              {"query_id": 1, "query_text": "rare", "k": 10}]
        assert svc.search_synonyms(sq, syn).to_pylist() == \
            search_synonym_index(idx, sq, syn).to_pylist()

        fq = [{"query_id": 0, "query_text": "appel", "k": 10},
              {"query_id": 1, "query_text": "chery banana", "k": 10}]
        assert svc.search_fuzzy(fq, max_edits=1).to_pylist() == \
            search_fuzzy_index(idx, fq, max_edits=1).to_pylist()
    finally:
        svc.shutdown()


def test_service_mixed_mode_single_roundtrip_parity(ray_session, tmp_path):
    """search_mixed (ONE round trip per shard for a heterogeneous
    batch, VERDICT r3 next #7) is value-identical to calling each
    per-mode service method separately."""
    idx = str(tmp_path / "svc_mixed_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG,
                attribute_cols=["lang"])
    svc = QueryService(idx, n_actors=2)
    try:
        sq = [{"query_id": 0, "query_text": "apple rare", "k": 4},
              {"query_id": 1, "query_text": "banana", "k": 3,
               "offset": 1}]
        bq = [{"query_id": 0, "must": "apple", "should": "banana",
               "must_not": "cherry", "k": 10},
              {"query_id": 1, "must": "", "should": "apple banana cherry",
               "must_not": "", "k": 10, "minimum_should_match": 2}]
        xq = [{"query_id": 0, "query_text": "banana apple", "window": 3,
               "k": 10},
              {"query_id": 1, "query_text": "apple rare", "window": 2,
               "k": 10, "ordered": True}]
        phq = [{"query_id": 0, "phrase": "apple banana", "k": 5}]
        boq = [{"query_id": 0, "query_text": "apple^3 cherry", "k": 5}]
        fq = [{"query_id": 0, "query_text": "apple"},
              {"query_id": 1, "query_text": "cherry rare"}]
        rq = [{"query_id": 0, "query_text": "apple"}]
        first = svc.search([{"query_id": 0, "query_text": "rare",
                             "k": 2}]).to_pylist()
        aq = [{"query_id": 0, "query_text": "rare", "k": 2,
               "after": (first[-1]["score"], first[-1]["conv_id"],
                         first[-1]["turn_idx"])}]

        mixed = svc.search_mixed([
            {"mode": "search", "queries": sq},
            {"mode": "boolean", "queries": bq},
            {"mode": "proximity", "queries": xq},
            {"mode": "phrase_rank", "queries": phq},
            {"mode": "boosted", "queries": boq},
            {"mode": "facets", "queries": fq, "facet_col": "lang"},
            {"mode": "facet_ranges", "queries": rq, "bin_width": 2},
            {"mode": "after", "queries": aq},
        ])
        assert mixed[0].to_pylist() == svc.search(sq).to_pylist()
        assert mixed[1].to_pylist() == svc.search_boolean(bq).to_pylist()
        assert mixed[2].to_pylist() == svc.search_proximity(xq).to_pylist()
        assert mixed[3].to_pylist() == \
            svc.search_ranked_phrases(phq).to_pylist()
        assert mixed[4].to_pylist() == svc.search_boosted(boq).to_pylist()
        assert mixed[5].to_pylist() == \
            svc.facet_counts(fq, "lang").to_pylist()
        assert mixed[6].to_pylist() == svc.facet_ranges(rq, 2).to_pylist()
        assert mixed[7].to_pylist() == svc.search_after(aq).to_pylist()
        assert sum(len(t) for t in mixed) > 0
    finally:
        svc.shutdown()


def test_service_parity_like_and_corrections(ray_session, tmp_path):
    """Served wildcard (mid-pattern) and did-you-mean match the
    one-shot entry points."""
    from vframe_ray.index.query import (search_like_index,
                                        suggest_corrections)
    idx = str(tmp_path / "svc_like_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    svc = QueryService(idx, n_actors=2)
    try:
        lq = [{"query_id": 0, "query_text": "ap?le cherry", "k": 10},
              {"query_id": 1, "query_text": "*rry", "k": 10}]
        assert svc.search_like(lq).to_pylist() == \
            search_like_index(idx, lq).to_pylist()
        assert svc.suggest_corrections(["aple", "qqq"]).to_pylist() == \
            suggest_corrections(idx, ["aple", "qqq"]).to_pylist()
        # and the served rows are actually non-empty
        assert svc.search_like(lq).num_rows
        assert svc.suggest_corrections(["aple"]).to_pylist() == [
            {"query_term": "aple", "suggestion": "apple", "df": 4}]
    finally:
        svc.shutdown()


def test_service_mixed_wildcard_modes(ray_session, tmp_path):
    """'like' and 'prefix' requests inside a mixed batch match their
    dedicated per-mode calls."""
    from vframe_ray.index.query import search_like_index
    idx = str(tmp_path / "svc_mixed_like_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    svc = QueryService(idx, n_actors=2)
    try:
        lq = [{"query_id": 0, "query_text": "ap?le *rry", "k": 10}]
        pq_ = [{"query_id": 0, "query_text": "ap* rare", "k": 10}]
        sq = [{"query_id": 0, "query_text": "banana", "k": 5}]
        outs = svc.search_mixed([
            {"mode": "like", "queries": lq},
            {"mode": "prefix", "queries": pq_},
            {"mode": "search", "queries": sq}])
        assert outs[0].to_pylist() == \
            search_like_index(idx, lq).to_pylist()
        assert outs[1].to_pylist() == \
            search_prefix_index(idx, pq_).to_pylist()
        assert outs[2].to_pylist() == svc.search(sq).to_pylist()
        assert outs[0].num_rows and outs[1].num_rows
    finally:
        svc.shutdown()


def test_service_parity_function_score(ray_session, tmp_path):
    """Served function-score equals the one-shot entrypoint row for row
    (same attr factor, same merge order)."""
    import numpy as np
    from vframe_ray.index.query import function_score_index
    idx = str(tmp_path / "svc_fs_idx")
    rows = [dict(r, length=int(37 * (i % 5 + 1))) for i, r in
            enumerate(ROWS)]
    build_index(ray.data.from_items(rows), idx, SMALL_CFG,
                attribute_cols=["length"])
    svc = QueryService(idx, n_actors=2)
    try:
        qs = [{"query_id": 0, "query_text": "apple banana", "k": 10},
              {"query_id": 1, "query_text": "rare", "k": 5}]
        got = svc.search_function_score(qs, attr="length", weight=0.3)
        want = function_score_index(idx, qs, attr="length", weight=0.3)
        assert got.to_pylist() == want.to_pylist()
        assert want.num_rows > 0
    finally:
        svc.shutdown()


def test_service_parity_boosting(ray_session, tmp_path):
    from vframe_ray.index.query import search_boosting_index
    idx = str(tmp_path / "boosting_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    svc = QueryService(idx, n_actors=2)
    try:
        qs = [{"query_id": 0, "positive": "apple banana",
               "negative": "rare", "negative_boost": 0.2, "k": 6},
              {"query_id": 1, "positive": "cherry",
               "negative": "zzmissing", "negative_boost": 0.5, "k": 4}]
        one = search_boosting_index(idx, qs).to_pandas()
        served = svc.search_boosting(qs).to_pandas()
        assert one.equals(served)
        # mixed-mode batch parity too
        mixed = svc.search_mixed([{"mode": "boosting", "queries": qs}])
        assert mixed[0].to_pandas().equals(one)
        # demotion really happened: c4 ("apple rare rare") not rank 1
        assert one.iloc[0]["conv_id"] != "c4"
        assert "c4" in set(one[one.query_id == 0]["conv_id"])
    finally:
        svc.shutdown()


def test_service_parity_top_hits(ray_session, tmp_path):
    from vframe_ray.index.query import top_hits_index
    idx = str(tmp_path / "th_svc_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG,
                attribute_cols=["lang"])
    svc = QueryService(idx, n_actors=2)
    try:
        qs = [{"query_id": 0, "query_text": "apple banana", "h": 2},
              {"query_id": 1, "query_text": "rare", "h": 1}]
        one = top_hits_index(idx, qs, "lang").to_pandas()
        served = svc.top_hits(qs, "lang").to_pandas()
        assert one.equals(served)
        assert set(one["facet"]) >= {"en", "de"}
    finally:
        svc.shutdown()
