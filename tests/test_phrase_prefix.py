"""Phrase-prefix (match_phrase_prefix) semantics: variant union equals
manual per-expansion phrase searches, the alphabetical max_expansions
cap, single-token prefixes, and the empty-expansion edge."""

import pytest
import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import (phrase_prefix_search_index,
                                    phrase_search_index)


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    docs = {
        "c0": "deep learning models converge",
        "c1": "deep learn by doing things",
        "c2": "shallow learning is fine",
        "c3": "deep lake storage layer",
        "c4": "go deep or go home",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    d = str(tmp_path_factory.mktemp("pp_idx") / "idx")
    build_index(ds, d, SMALL_CFG)
    return d


def test_union_of_expansions(idx):
    """'deep l' expands to {lake, learn, learning} adjacent to deep —
    c0, c1, c3 match; c2 lacks 'deep', c4's 'deep' precedes 'or'."""
    got = phrase_prefix_search_index(
        idx, [{"query_id": 0, "phrase": "deep l"}])
    assert [r["conv_id"] for r in got.to_pylist()] == ["c0", "c1", "c3"]
    # equals the manual union of exact phrase variants
    manual = set()
    for e in ("lake", "learn", "learning"):
        hits = phrase_search_index(
            idx, [{"query_id": 0, "phrase": f"deep {e}"}])
        manual.update(r["conv_id"] for r in hits.to_pylist())
    assert manual == {"c0", "c1", "c3"}


def test_max_expansions_alphabetical_cap(idx):
    """cap=1 keeps only the alphabetically first expansion ('lake')."""
    got = phrase_prefix_search_index(
        idx, [{"query_id": 0, "phrase": "deep l"}], max_expansions=1)
    assert [r["conv_id"] for r in got.to_pylist()] == ["c3"]


def test_single_token_prefix(idx):
    """A bare prefix phrase degenerates to 'contains any term with the
    prefix'."""
    got = phrase_prefix_search_index(
        idx, [{"query_id": 0, "phrase": "learn"}])
    assert [r["conv_id"] for r in got.to_pylist()] == ["c0", "c1", "c2"]


def test_no_expansion_no_rows(idx):
    got = phrase_prefix_search_index(
        idx, [{"query_id": 0, "phrase": "deep zzz"}])
    assert got.num_rows == 0
    got = phrase_prefix_search_index(idx, [])
    assert got.num_rows == 0
