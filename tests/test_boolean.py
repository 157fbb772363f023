"""Boolean (must/should/must_not) retrieval semantics + equivalences."""

import pyarrow as pa
import ray.data

from tests.util import SMALL_CFG
from vframe_ray.corpus import generate_queries
from vframe_ray.index.build import build_index
from vframe_ray.index.query import search_boolean_index, search_index


def test_boolean_reduces_to_plain_search(ray_session, small_index_dir):
    """Empty must/must_not: boolean scoring must be bit-identical to the
    plain query path (same contribution order, same tie-break)."""
    queries = generate_queries(n_terms=800)[:6]
    plain = search_index(small_index_dir, queries)
    boolean = search_boolean_index(small_index_dir, [
        {"query_id": q["query_id"], "must": "", "should": q["query_text"],
         "must_not": "", "k": q["k"]} for q in queries])
    assert boolean.to_pylist() == plain.to_pylist()


def test_boolean_clause_semantics(ray_session, tmp_path):
    """Planted corpus: must AND-gates, must_not excludes, should only
    reorders — checked doc-by-doc against hand-derived match sets."""
    docs = {
        "c0": "apple banana cherry",
        "c1": "apple banana",
        "c2": "apple cherry",
        "c3": "banana cherry",
        "c4": "apple durian",
        "c5": "cherry durian elderberry",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "bool_idx")
    build_index(ds, idx, SMALL_CFG)

    res = search_boolean_index(idx, [
        # apple AND banana -> c0, c1
        {"query_id": 0, "must": "apple banana", "should": "",
         "must_not": "", "k": 10},
        # apple NOT cherry -> c1, c4
        {"query_id": 1, "must": "apple", "should": "", "must_not": "cherry",
         "k": 10},
        # (banana OR durian) NOT apple -> c3, c5
        {"query_id": 2, "must": "", "should": "banana durian",
         "must_not": "apple", "k": 10},
        # must term absent from corpus -> no hits
        {"query_id": 3, "must": "zzz apple", "should": "", "must_not": "",
         "k": 10},
        # should fully cancelled by must_not -> no hits
        {"query_id": 4, "must": "", "should": "durian", "must_not": "durian",
         "k": 10},
    ])
    got = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], set()).add(r["conv_id"])
    assert got.get(0) == {"c0", "c1"}
    assert got.get(1) == {"c1", "c4"}
    assert got.get(2) == {"c3", "c5"}
    assert 3 not in got
    assert 4 not in got


def test_boolean_must_scores_match_plain(ray_session, tmp_path):
    """A must-matched doc's score equals the plain-query score of the
    same doc (must terms score like should terms)."""
    docs = {
        "c0": "alpha beta beta gamma",
        "c1": "alpha gamma",
        "c2": "beta gamma gamma",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "bool_idx2")
    build_index(ds, idx, SMALL_CFG)

    plain = {r["conv_id"]: r["score"] for r in search_index(
        idx, [{"query_id": 0, "query_text": "alpha beta", "k": 10}]
    ).to_pylist()}
    boolean = search_boolean_index(idx, [
        {"query_id": 0, "must": "alpha", "should": "beta", "must_not": "",
         "k": 10}])
    rows = boolean.to_pylist()
    assert {r["conv_id"] for r in rows} == {"c0", "c1"}   # alpha docs only
    for r in rows:
        assert r["score"] == plain[r["conv_id"]]


def test_minimum_should_match_semantics(ray_session, tmp_path):
    """msm gates on DISTINCT should-term presence: planted corpus with
    hand-derived match sets per bar, msm=1 ≡ default, bar above the
    clause count provably empty, and tf does not double-count."""
    docs = {
        "c0": "apple banana cherry",      # 3 distinct should hits
        "c1": "apple banana",             # 2
        "c2": "apple apple apple",        # 1 (tf=3 still counts once)
        "c3": "banana cherry",            # 2
        "c4": "durian",                   # 0
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "msm_idx")
    build_index(ds, idx, SMALL_CFG)

    def hits(msm, must="", must_not=""):
        res = search_boolean_index(idx, [
            {"query_id": 0, "must": must,
             "should": "apple banana cherry", "must_not": must_not,
             "k": 10, "minimum_should_match": msm}])
        return set(res["conv_id"].to_pylist())

    assert hits(0) == {"c0", "c1", "c2", "c3"}
    assert hits(1) == hits(0)                 # msm=1 ≡ default ≥1
    assert hits(2) == {"c0", "c1", "c3"}      # c2's tf=3 counts once
    assert hits(3) == {"c0"}
    assert hits(4) == set()                   # bar above clause count
    # composes with must / must_not
    assert hits(2, must="cherry") == {"c0", "c3"}
    assert hits(2, must_not="cherry") == {"c1"}


def test_msm_through_query_service(ray_session, tmp_path):
    """Served msm batch ≡ the one-shot scatter-gather result."""
    from vframe_ray.index.service import QueryService
    docs = {f"c{i}": t for i, t in enumerate(
        ["apple banana", "apple cherry banana", "cherry", "apple",
         "banana cherry durian", "apple banana cherry durian"])}
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "msm_srv_idx")
    build_index(ds, idx, SMALL_CFG)
    queries = [
        {"query_id": 0, "must": "", "should": "apple banana cherry",
         "must_not": "", "k": 10, "minimum_should_match": 2},
        {"query_id": 1, "must": "banana", "should": "cherry durian",
         "must_not": "", "k": 10, "minimum_should_match": 2},
    ]
    one_shot = search_boolean_index(idx, queries)
    svc = QueryService(idx, n_actors=2)
    try:
        served = svc.search_boolean(queries)
        assert served.to_pylist() == one_shot.to_pylist()
    finally:
        svc.shutdown()
