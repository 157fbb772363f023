import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from vframe_ray.analyze import Tokenizer, sql_tokens_cte
from vframe_ray.config import AnalyzerConfig

EDGE = ["Hello, World! 42", "", None, "the THE The", "a-b_c d",
        "Ünïcode Straße café", "   \t ", "x" * 200, "1 22 333", "-- !!"]


def test_vectorized_matches_scalar_edges():
    tk = Tokenizer()
    got = tk.tokenize_array(pa.array(EDGE, pa.string())).to_pylist()
    assert got == [tk.tokenize(t) for t in EDGE]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_vectorized_matches_scalar_random(texts):
    tk = Tokenizer()
    got = tk.tokenize_array(pa.array(texts, pa.string())).to_pylist()
    assert got == [tk.tokenize(t) for t in texts]


def test_sql_oracle_tokenization_agrees():
    tk = Tokenizer()
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INT, text VARCHAR)")
    for i, t in enumerate(EDGE):
        con.execute("INSERT INTO d VALUES (?, ?)", [i, t])
    rows = con.execute(
        "WITH " + sql_tokens_cte("d") +
        " SELECT _id, term FROM tok ORDER BY _id").fetchall()
    sql: dict[int, list[str]] = {}
    for i, t in rows:
        sql.setdefault(i, []).append(t)
    py = {i: tk.tokenize(t) for i, t in enumerate(EDGE) if tk.tokenize(t)}
    assert sql == py


def test_stopwords_filtered_both_paths():
    cfg = AnalyzerConfig(stopwords=frozenset({"the", "a"}))
    tk = Tokenizer(cfg)
    texts = ["the quick a fox", "A THE b"]
    assert tk.tokenize(texts[0]) == ["quick", "fox"]
    got = tk.tokenize_array(pa.array(texts)).to_pylist()
    assert got == [["quick", "fox"], ["b"]]


def test_doc_lengths():
    tk = Tokenizer()
    la = tk.tokenize_array(pa.array(["a b c", "", "x!"]))
    assert tk.doc_lengths(la).to_pylist() == [3, 0, 1]


def test_stopword_analyzer_through_index(ray_session, tmp_path):
    """Stopwords removed at index AND query time: dl/df post-stopword,
    stopped query terms contribute nothing, all-stopword query empty."""
    import ray.data

    from vframe_ray.config import AnalyzerConfig, EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import search_index

    rows = [{"conv_id": "c0", "turn_idx": 0, "text": "the apple the"},
            {"conv_id": "c1", "turn_idx": 0, "text": "apple banana"},
            {"conv_id": "c2", "turn_idx": 0, "text": "the the the"}]
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(stopwords=frozenset({"the"})),
        index=IndexConfig(num_segments=2, block_size=8))
    idx = str(tmp_path / "stop_idx")
    build_index(ray.data.from_items(rows), idx, cfg)
    # 'the apple' == 'apple': stopped term adds nothing
    a = search_index(idx, [{"query_id": 0, "query_text": "the apple",
                            "k": 10}])
    b = search_index(idx, [{"query_id": 0, "query_text": "apple",
                            "k": 10}])
    assert a.to_pylist() == b.to_pylist()
    assert set(a["conv_id"].to_pylist()) == {"c0", "c1"}
    # all-stopword doc c2 never matches; all-stopword query matches nothing
    empty = search_index(idx, [{"query_id": 0, "query_text": "the",
                                "k": 10}])
    assert empty.num_rows == 0
    # dl is post-stopword: c0 has dl 1 == c1's per-term footprint differs
    import json, os
    stats = json.load(open(os.path.join(idx, "global", "stats.json")))
    assert stats["total_len"] == 3          # apple + apple banana


_STEM_EDGES = ["stories", "ies", "aies", "eies", "babies", "classes",
               "goes", "trees", "aes", "us", "ss", "glass", "cats",
               "s", "es", "is", "as", "bus", "boxes", "fly", "x",
               "123s", "abss", "movies", "series", "pass", "axes"]


def test_s_stem_three_way_edges():
    from vframe_ray.analyze import s_stem, s_stem_array, sql_stem_expr
    py = [s_stem(t) for t in _STEM_EDGES]
    ar = s_stem_array(pa.array(_STEM_EDGES)).to_pylist()
    con = duckdb.connect()
    sql = [con.execute(f"SELECT {sql_stem_expr('t')} FROM (SELECT ? AS t)",
                       [t]).fetchone()[0] for t in _STEM_EDGES]
    assert py == ar == sql
    # the rules actually fire: plural → singular, exceptions survive
    m = dict(zip(_STEM_EDGES, py))
    assert m["stories"] == "story" and m["cats"] == "cat"
    assert m["glass"] == "glass" and m["bus"] == "bus"
    assert m["s"] == "s" and m["es"] == "es"      # ≤2-char guard


@settings(max_examples=200, deadline=None)
@given(st.lists(st.from_regex(r"[a-z0-9]{1,8}s?", fullmatch=True),
                min_size=0, max_size=20))
def test_s_stem_vectorized_matches_scalar_random(tokens):
    from vframe_ray.analyze import s_stem, s_stem_array
    assert s_stem_array(pa.array(tokens, pa.string())).to_pylist() \
        == [s_stem(t) for t in tokens]


def test_stem_analyzer_through_index(ray_session, tmp_path):
    """Plural query forms meet singular document terms through a
    stemmed index; df/dl are post-stem."""
    import ray.data

    from vframe_ray.config import AnalyzerConfig, EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import search_index

    rows = [{"conv_id": "c0", "turn_idx": 0, "text": "query planner"},
            {"conv_id": "c1", "turn_idx": 0, "text": "queries planners"},
            {"conv_id": "c2", "turn_idx": 0, "text": "window merge"}]
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(stem="s"),
        index=IndexConfig(num_segments=2, block_size=8))
    idx = str(tmp_path / "stem_idx")
    build_index(ray.data.from_items(rows), idx, cfg)
    # the plural query and the singular query are the SAME stemmed term
    a = search_index(idx, [{"query_id": 0, "query_text": "queries",
                            "k": 10}])
    b = search_index(idx, [{"query_id": 0, "query_text": "query",
                            "k": 10}])
    assert a.to_pylist() == b.to_pylist()
    assert set(a["conv_id"].to_pylist()) == {"c0", "c1"}
    # untouched terms unaffected
    w = search_index(idx, [{"query_id": 0, "query_text": "window",
                            "k": 10}])
    assert set(w["conv_id"].to_pylist()) == {"c2"}


def test_df_pruned_vocabulary(ray_session, tmp_path):
    """min_df/max_df pruning: rare and ubiquitous terms leave the
    vocabulary (data-driven stopwords), surviving terms score over
    post-prune corpus stats."""
    import ray.data

    from vframe_ray.config import AnalyzerConfig, EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import search_index
    from vframe_ray.stages.stats import term_stats
    from vframe_ray.stages.tokenize import tokenize

    # 'common' in every doc, 'mid' in half, 'rare' in one
    rows = [{"conv_id": f"c{i}", "turn_idx": 0,
             "text": "common " + ("mid " if i % 2 == 0 else "")
             + ("rare" if i == 0 else "filler")}
            for i in range(10)]
    ds = ray.data.from_items(rows)
    stats = term_stats(tokenize(ds)).to_pandas()
    df = dict(zip(stats["term"], stats["df"]))
    assert df["common"] == 10 and df["mid"] == 5 and df["rare"] == 1
    pruned = frozenset(stats.loc[(stats["df"] < 2)
                                 | (stats["df"] > 0.8 * 10), "term"])
    assert pruned == {"rare", "common", "filler"}
    idx = str(tmp_path / "dfp_idx")
    build_index(ray.data.from_items(rows), idx,
                EngineConfig(analyzer=AnalyzerConfig(stopwords=pruned),
                             index=IndexConfig(num_segments=2,
                                               block_size=8)))
    # pruned terms match nothing, on the doc AND the query side
    assert search_index(idx, [{"query_id": 0, "query_text": "common",
                               "k": 10}]).num_rows == 0
    assert search_index(idx, [{"query_id": 0, "query_text": "rare",
                               "k": 10}]).num_rows == 0
    # surviving vocabulary scores over post-prune stats (dl excludes
    # pruned tokens): 'mid' docs all tie at dl=1
    r = search_index(idx, [{"query_id": 0, "query_text": "mid common",
                            "k": 10}])
    assert r.num_rows == 5
    assert len(set(r["score"].to_pylist())) == 1
