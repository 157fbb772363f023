"""Offset pagination and total-hit counts."""

from vframe_ray.corpus import generate_queries
from vframe_ray.index.query import (QueryService, match_counts_index,
                                    search_index)


def test_pages_tile_the_full_ranking(ray_session, small_index_dir):
    """Pages (offset 0/5/10, k=5) concatenate to exactly the top-15,
    with global rank numbers, on BOTH merge branches."""
    queries = generate_queries(n_terms=800)[:4]
    full = search_index(small_index_dir, [
        {**q, "k": 15} for q in queries])
    for merge_rows in (1_000_000, 0):      # driver merge / groupby merge
        pages = []
        for off in (0, 5, 10):
            pages.append(search_index(
                small_index_dir,
                [{**q, "k": 5, "offset": off} for q in queries],
                driver_merge_max_rows=merge_rows))
        got = sorted(sum((p.to_pylist() for p in pages), []),
                     key=lambda r: (r["query_id"], r["rank"]))
        assert got == full.to_pylist()


def test_service_paging_matches_oneshot(ray_session, small_index_dir):
    queries = generate_queries(n_terms=800)[:4]
    paged = [{**q, "k": 5, "offset": 5} for q in queries]
    want = search_index(small_index_dir, paged)
    svc = QueryService(small_index_dir, n_actors=2)
    try:
        assert svc.search(paged).to_pylist() == want.to_pylist()
    finally:
        svc.shutdown()


def test_match_counts_equals_full_candidate_set(ray_session,
                                                small_index_dir,
                                                small_oracle):
    queries = generate_queries(n_terms=800)[:5] + [
        {"query_id": 99, "query_text": "zzzabsentterm", "k": 3}]
    res = match_counts_index(small_index_dir, queries)
    got = {r["query_id"]: r["n"] for r in res.to_pylist()}
    assert got[99] == 0
    for q in queries[:5]:
        # oracle: size of the full candidate set (k = corpus size)
        want = len(small_oracle.search(q["query_text"],
                                       k=small_oracle.n_docs))
        assert got[q["query_id"]] == want


def test_search_after_chains_reconstruct_full_ranking(ray_session,
                                                      tmp_path):
    """Walking pages via cursors must reproduce the one-shot top-N
    exactly, and match offset pagination page-for-page."""
    import ray.data

    from tests.util import SMALL_CFG
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import (QueryService, search_after_index,
                                        search_index)

    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": ("apple " * (i % 5 + 1)) + ("banana " * (i % 3))}
            for i in range(30)]
    idx = str(tmp_path / "sa_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)

    full = search_index(idx, [{"query_id": 0,
                               "query_text": "apple banana", "k": 30}])
    page = search_index(idx, [{"query_id": 0,
                               "query_text": "apple banana", "k": 7}])
    got = page.to_pylist()
    svc = QueryService(idx, n_actors=2)
    try:
        while page.num_rows == 7:
            last = page.slice(page.num_rows - 1, 1)
            cur = (last["score"][0].as_py(), last["conv_id"][0].as_py(),
                   last["turn_idx"][0].as_py())
            q = [{"query_id": 0, "query_text": "apple banana", "k": 7,
                  "after": cur}]
            page = search_after_index(idx, q)
            assert svc.search_after(q).to_pylist() == page.to_pylist()
            got += page.to_pylist()
    finally:
        svc.shutdown()
    want = full.to_pylist()
    # ranks are page-local; compare identity + score sequences
    assert [(r["conv_id"], r["turn_idx"], r["score"]) for r in got] == \
        [(r["conv_id"], r["turn_idx"], r["score"]) for r in want]
    # page 2 via cursor == page 2 via offset
    off = search_index(idx, [{"query_id": 0, "query_text": "apple banana",
                              "k": 7, "offset": 7}]).to_pylist()
    assert [(r["conv_id"], r["score"]) for r in got[7:14]] == \
        [(r["conv_id"], r["score"]) for r in off]
