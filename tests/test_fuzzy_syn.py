"""Fuzzy (Levenshtein) and synonym expansion semantics."""

import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (_levenshtein_within, expand_fuzzy_terms,
                                    search_fuzzy_index, search_index,
                                    search_synonym_index)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc", max_size=8),
       st.text(alphabet="abc", max_size=8),
       st.integers(min_value=0, max_value=3))
def test_banded_levenshtein_matches_reference(a, b, d):
    assert _levenshtein_within(a, b, d) == (_ref_lev(a, b) <= d)


def _planted_index(tmp_path):
    docs = {
        "c0": "vector stream",
        "c1": "vector vectors",
        "c2": "victor stream",
        "c3": "stream merge",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "fz_idx")
    build_index(ds, idx, SMALL_CFG)
    return idx


def test_fuzzy_expansion_and_search(ray_session, tmp_path):
    idx = _planted_index(tmp_path)
    exp = expand_fuzzy_terms(idx, ["vektor", "zzzzz"], max_edits=1)
    assert exp["vektor"] == ["vector"]     # victor is 2 edits from vektor
    assert exp["zzzzz"] == []
    got = search_fuzzy_index(idx, [
        {"query_id": 0, "query_text": "vektor", "k": 10}], max_edits=1)
    want = search_index(idx, [
        {"query_id": 0, "query_text": "vector", "k": 10}])
    assert got.to_pylist() == want.to_pylist()
    # distance 2 reaches victor and vectors as well
    exp2 = expand_fuzzy_terms(idx, ["vektor"], max_edits=2)
    assert exp2["vektor"] == ["vector", "vectors", "victor"]


def test_synonym_expansion(ray_session, tmp_path):
    idx = _planted_index(tmp_path)
    got = search_synonym_index(idx, [
        {"query_id": 0, "query_text": "merge", "k": 10}],
        {"merge": ["stream", "absentword"]})
    want = search_index(idx, [
        {"query_id": 0, "query_text": "merge stream", "k": 10}])
    assert got.to_pylist() == want.to_pylist()
