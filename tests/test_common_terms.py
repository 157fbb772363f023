"""Common-terms retrieval (Lucene CommonTermsQuery): low-df-driven
recall with full-query scoring — brute-force hit oracle, the all-high
fallback law (reduces to plain search), service parity."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (QueryService, search_common_index,
                                    search_index)

# 'rare' df=1/8, 'semi' df=3/8, everything else df>=5/8
ROWS = [
    {"conv_id": "c0", "turn_idx": 0, "text": "alpha beta rare"},
    {"conv_id": "c1", "turn_idx": 0, "text": "alpha beta semi"},
    {"conv_id": "c2", "turn_idx": 0, "text": "alpha beta semi"},
    {"conv_id": "c3", "turn_idx": 0, "text": "alpha beta semi gamma"},
    {"conv_id": "c4", "turn_idx": 0, "text": "alpha gamma"},
    {"conv_id": "c5", "turn_idx": 0, "text": "alpha gamma"},
    {"conv_id": "c6", "turn_idx": 0, "text": "beta gamma"},
    {"conv_id": "c7", "turn_idx": 0, "text": "alpha beta gamma"},
]


def test_common_terms_low_df_drives_recall(ray_session, tmp_path):
    """With cutoff df*2 < n (df < 4): 'rare'(1) and 'semi'(3) are low,
    'alpha'(7)/'beta'(6) high.  Query 'alpha semi': hits = semi docs
    only (c1, c2, c3) — alpha alone must NOT admit docs — but scores
    include the alpha contribution (c3 ranks by both terms)."""
    idx = str(tmp_path / "ct_idx")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    res = search_common_index(
        idx, [{"query_id": 0, "query_text": "alpha semi", "k": 10}],
        max_df_num=1, max_df_den=2).to_pandas()
    assert sorted(res["conv_id"]) == ["c1", "c2", "c3"]
    # scoring includes the high-df term: c1/c2 (alpha+semi) outscore
    # a semi-only doc would — here all three hold alpha, so instead
    # assert the scores differ from semi-only BM25 by checking the
    # plain single-term ranking is NOT what we got
    only_semi = search_index(
        idx, [{"query_id": 0, "query_text": "semi", "k": 10}]) \
        .to_pandas()
    assert set(only_semi["conv_id"]) == set(res["conv_id"])
    assert list(res["score"]) != list(only_semi["score"])


def test_common_terms_all_high_falls_back_to_plain(ray_session,
                                                   tmp_path):
    idx = str(tmp_path / "ct_fb")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    got = search_common_index(
        idx, [{"query_id": 0, "query_text": "alpha beta", "k": 10}],
        max_df_num=1, max_df_den=2).to_pylist()
    want = search_index(
        idx, [{"query_id": 0, "query_text": "alpha beta",
               "k": 10}]).to_pylist()
    assert got == want


def test_common_terms_absent_term_is_not_low(ray_session, tmp_path):
    """An absent term must not count toward the low set: 'zz alpha'
    has no PRESENT low terms -> plain fallback, not empty."""
    idx = str(tmp_path / "ct_abs")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    got = search_common_index(
        idx, [{"query_id": 0, "query_text": "zz alpha", "k": 10}],
        max_df_num=1, max_df_den=2).to_pylist()
    want = search_index(
        idx, [{"query_id": 0, "query_text": "zz alpha",
               "k": 10}]).to_pylist()
    assert got == want


def test_common_terms_service_parity(ray_session, tmp_path):
    idx = str(tmp_path / "ct_svc")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG)
    qs = [{"query_id": 0, "query_text": "alpha semi", "k": 10},
          {"query_id": 1, "query_text": "rare gamma", "k": 5}]
    one_shot = search_common_index(idx, qs, max_df_num=1,
                                   max_df_den=2).to_pylist()
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.search_common(qs, max_df_num=1,
                                 max_df_den=2).to_pylist() == one_shot
    finally:
        svc.shutdown()
