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
