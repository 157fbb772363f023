import math

from vframe_ray.config import EngineConfig
from vframe_ray.oracle import OracleIndex

ROWS = [
    ("c1", 0, "apple banana apple"),
    ("c1", 1, "banana cherry"),
    ("c2", 0, "apple"),
    ("c2", 1, ""),
]


def test_oracle_stats():
    oi = OracleIndex(ROWS, EngineConfig())
    assert oi.n_docs == 4
    assert oi.total_len == 6
    assert oi.avgdl == 1.5
    assert len(oi.postings["apple"]) == 2
    assert len(oi.postings["banana"]) == 2
    assert len(oi.postings["cherry"]) == 1


def test_oracle_bm25_hand_computed():
    oi = OracleIndex(ROWS, EngineConfig())
    k1, b = 1.2, 0.75
    # doc ("c2", 0): dl=1, tf(apple)=1, df=2, N=4
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    norm = k1 * (1 - b + b * 1 / 1.5)
    want = idf * (1 * (k1 + 1)) / (1 + norm)
    hits = oi.search("apple", 10)
    by_key = {(h.conv_id, h.turn_idx): h.score for h in hits}
    assert abs(by_key[("c2", 0)] - want) < 1e-15


def test_oracle_tiebreak_on_key():
    rows = [("b", 5, "zebra"), ("a", 9, "zebra"), ("a", 2, "zebra")]
    oi = OracleIndex(rows, EngineConfig())
    hits = oi.search("zebra", 3)
    assert [(h.conv_id, h.turn_idx) for h in hits] == [("a", 2), ("a", 9),
                                                       ("b", 5)]


def test_oracle_absent_term():
    oi = OracleIndex(ROWS, EngineConfig())
    assert oi.search("durian", 10) == []


def test_oracle_multi_term_ranking():
    oi = OracleIndex(ROWS, EngineConfig())
    hits = oi.search("apple banana", 10)
    # ("c1", 0) has both terms (apple tf=2) -> must rank first
    assert (hits[0].conv_id, hits[0].turn_idx) == ("c1", 0)
    assert len(hits) == 3  # any doc containing any term


def test_oracle_phrase_candidates():
    oi = OracleIndex(ROWS, EngineConfig())
    assert oi.phrase_candidates(["banana", "apple"]) == [0]  # c1/0
    assert oi.phrase_candidates(["apple", "banana"]) == [0]
    assert oi.phrase_candidates(["banana", "cherry"]) == [1]
    assert oi.phrase_candidates(["cherry", "banana"]) == []
