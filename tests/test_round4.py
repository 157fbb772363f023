"""Round-4 additions: chunking, sequence packing, bigram stats,
tf-idf keywords, JSONL/CSV sources — each against a plain-Python
brute-force oracle, plus repartition invariance for the distributed
reduces."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

DOCS = [
    {"doc_id": 0, "source": "s0",
     "text": "alpha beta gamma alpha beta delta " * 20},   # 120 tokens
    {"doc_id": 1, "source": "s0", "text": "alpha beta"},
    {"doc_id": 2, "source": "s1", "text": ""},             # 0 tokens
    {"doc_id": 3, "source": "s1", "text": "Gamma, GAMMA! gamma?"},
    {"doc_id": 4, "source": "s0", "text": "epsilon " * 70},  # 70 tokens
    {"doc_id": 5, "source": "s1", "text": "zeta eta " * 40},
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.from_items(DOCS).repartition(3)


def test_chunk_documents_vs_scalar_oracle(ray_session, docs_ds):
    from vframe_ray.stages.chunking import chunk_documents
    size, stride = 16, 12
    got = chunk_documents(docs_ds, size=size, stride=stride).to_pandas()
    got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    want = []
    for d in DOCS:
        ts = _toks(d["text"])
        for ci in range(-(-len(ts) // stride)):
            chunk = ts[ci * stride: ci * stride + size]
            want.append((d["doc_id"], ci, len(chunk), " ".join(chunk)))
    assert list(map(tuple, got.itertuples(index=False))) == want
    # 0-token doc yields no chunks; overlap carries tokens forward
    assert 2 not in set(got["doc_id"])
    d0 = got[got["doc_id"] == 0]
    assert len(d0) == math.ceil(120 / stride)
    first, second = d0.iloc[0]["chunk_text"], d0.iloc[1]["chunk_text"]
    assert first.split()[stride:] == second.split()[:size - stride]


def test_pack_sequences_vs_scalar_oracle(ray_session, docs_ds):
    from vframe_ray.stages.chunking import pack_sequences
    budget = 100
    got = pack_sequences(docs_ds, budget=budget).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = {}
    for src in ("s0", "s1"):
        run = 0
        for d in sorted((d for d in DOCS if d["source"] == src),
                        key=lambda d: d["doc_id"]):
            n = len(_toks(d["text"]))
            want[d["doc_id"]] = (src, n, run // budget)
            run += n
    for row in got.itertuples(index=False):
        assert want[row.doc_id] == (row.source, row.n_tokens, row.seq_id)
    # a sequence closes once it reaches the budget: doc 0 (120 tokens)
    # fills s0/seq0, so docs 1 and 4 land in seq 1
    by_id = {r.doc_id: r.seq_id for r in got.itertuples(index=False)}
    assert by_id[0] == 0 and by_id[1] == 1 and by_id[4] == 1


def test_top_bigrams_vs_counter_and_repartition(ray_session):
    from vframe_ray.stages.stats import top_bigrams
    from vframe_ray.stages.tokenize import tokenize
    want = Counter()
    for d in DOCS:
        ts = _toks(d["text"])
        want.update(zip(ts, ts[1:]))
    expect = sorted(((n, a, b) for (a, b), n in want.items()),
                    key=lambda x: (-x[0], x[1], x[2]))[:10]
    for nparts in (1, 4):
        ds = ray.data.from_items(DOCS).repartition(nparts)
        got = top_bigrams(tokenize(ds), k=10)
        assert [(r.n_pair, r.term_a, r.term_b)
                for r in got.itertuples(index=False)] == expect


def test_tfidf_top_terms_vs_scalar_oracle(ray_session, docs_ds):
    from vframe_ray.stages.stats import tfidf_top_terms
    from vframe_ray.stages.tokenize import tokenize
    n_docs = len(DOCS)
    got = tfidf_top_terms(tokenize(docs_ds), n_docs, top=2)
    tf = {d["doc_id"]: Counter(_toks(d["text"])) for d in DOCS}
    df = Counter()
    for c in tf.values():
        df.update(set(c))
    for doc_id, c in tf.items():
        scored = sorted(
            ((math.log(n_docs / df[t]) * n, t) for t, n in c.items()),
            key=lambda x: (-x[0], x[1]))[:2]
        rows = got[got["doc_id"] == doc_id]
        assert [r.term for r in rows.itertuples(index=False)] == \
            [t for _, t in scored]
        assert [r.score_r for r in rows.itertuples(index=False)] == \
            [round(s, 6) for s, _ in scored]


def test_jsonl_csv_sources_roundtrip(ray_session, tmp_path):
    """read_jsonl / read_csv land the same rows the parquet path does
    (column projection applied)."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from vframe_ray.sources.readers import read_csv, read_jsonl
    t = pa.table({"doc_id": pa.array([3, 1, 2], pa.int64()),
                  "text": pa.array(["a,b \"q\"", "hello world", ""]),
                  "extra": pa.array([1.5, -2.0, 0.25])})
    pd_df = t.to_pandas()
    jpath = str(tmp_path / "docs.jsonl")
    pd_df.to_json(jpath, orient="records", lines=True, force_ascii=False)
    cpath = str(tmp_path / "docs.csv")
    pacsv.write_csv(t, cpath)

    jgot = read_jsonl(jpath, columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert jgot.to_dict("list") == {"doc_id": [1, 2, 3],
                                    "text": ["hello world", "",
                                             'a,b "q"']}
    cgot = read_csv(cpath, columns=["doc_id", "extra"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert cgot["extra"].tolist() == [-2.0, 0.25, 1.5]


def test_round4_stages_registered(ray_session):
    from vframe_ray import registry
    for name in ("chunk_documents", "pack_sequences", "top_bigrams",
                 "tfidf_top_terms"):
        assert registry.get(name) is not None


def test_repetition_features_vs_scalar_oracle(ray_session):
    """Gopher repetition stats match a per-doc Counter brute force;
    empty/single-token/all-same-token docs hit the zero guards."""
    from vframe_ray.stages.textquality import repetition_features
    docs = [
        {"doc_id": 0, "text": "a b a b a b"},        # all bigrams dup-ish
        {"doc_id": 1, "text": ""},                   # no tokens
        {"doc_id": 2, "text": "solo"},               # no bigrams
        {"doc_id": 3, "text": "x x x x"},            # one distinct bigram
        {"doc_id": 4, "text": "Every token here is distinct once"},
        {"doc_id": 5, "text": "AA! aa? bb aa"},      # case-folded repeats
    ]
    got = repetition_features(
        ray.data.from_items(docs).repartition(2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for d in docs:
        ts = _toks(d["text"])
        row = got[got["doc_id"] == d["doc_id"]].iloc[0]
        assert row["n_tokens"] == len(ts)
        bigs = list(zip(ts, ts[1:]))
        want_dup = (1.0 - len(set(bigs)) / len(bigs)) if bigs else 0.0
        want_top = (max(Counter(ts).values()) / len(ts)) if ts else 0.0
        assert row["dup_bigram_frac"] == want_dup
        assert row["top_token_frac"] == want_top
    assert got.loc[3, "dup_bigram_frac"] == 1.0 - 1.0 / 3
    assert got.loc[3, "top_token_frac"] == 1.0


def test_event_funnel_strict_ordering(ray_session):
    """Funnel chains must be strictly increasing in ts: equal-ts and
    out-of-order steps do not convert; greedy-min chain finds the
    conversion when ANY valid chain exists."""
    import pyarrow as pa

    from vframe_ray.stages.sessionize import event_funnel
    T = pd.Timestamp
    rows = [
        # u1 full funnel in order
        (1, T("2024-01-01 10:00"), "view"),
        (1, T("2024-01-01 10:05"), "click"),
        (1, T("2024-01-01 10:10"), "purchase"),
        # u2 purchase BEFORE click -> stops at click
        (2, T("2024-01-01 10:00"), "view"),
        (2, T("2024-01-01 10:01"), "purchase"),
        (2, T("2024-01-01 10:02"), "click"),
        # u3 click at SAME ts as view -> strict > excludes; stops at view
        (3, T("2024-01-01 10:00"), "view"),
        (3, T("2024-01-01 10:00"), "click"),
        # u4 never views (click+purchase only) -> counted nowhere
        (4, T("2024-01-01 10:00"), "click"),
        (4, T("2024-01-01 10:01"), "purchase"),
        # u5 greedy trap: early view, early click, purchase after
        # a LATER second click — greedy min chain still converts
        (5, T("2024-01-01 09:00"), "view"),
        (5, T("2024-01-01 09:30"), "click"),
        (5, T("2024-01-01 11:00"), "purchase"),
        (5, T("2024-01-01 12:00"), "click"),
    ]
    ds = ray.data.from_items([
        {"user_id": u, "ts": t, "event_type": e, "value": 0.0}
        for u, t, e in rows]).repartition(3)
    parts = event_funnel(ds).to_pandas()
    out = parts.groupby("step")["n_users_p"].sum()
    assert out[1] == 4          # u1 u2 u3 u5 viewed
    assert out[2] == 3          # u1 u2 u5 clicked after view
    assert out[3] == 2          # u1 u5 purchased after that click


def test_duplicate_chunk_fraction_planted(ray_session):
    """Cross-doc duplicate chunks flag; a doc repeating its OWN chunk
    does not (distinct-doc rule); empty docs emit no row."""
    from vframe_ray.stages.chunking import duplicate_chunk_fraction
    block = " ".join(f"t{i}" for i in range(8))        # one 8-token chunk
    docs = [
        {"doc_id": 0, "text": block + " unique0 " + "filler0 " * 7},
        {"doc_id": 1, "text": block + " unique1 " + "filler1 " * 7},
        {"doc_id": 2, "text": (block + " ") * 2},      # own-repeat only?
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "totally different words here now ok yes no"},
    ]
    ds = ray.data.from_items(docs).repartition(2)
    got = duplicate_chunk_fraction(ds, size=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1, 2, 4]      # doc 3: no chunks
    by = got.set_index("doc_id")
    # docs 0/1/2 all contain the shared block as chunk 0 -> duplicate
    assert by.loc[0, "dup_chunk_frac"] == 1.0 / by.loc[0, "n_chunks"]
    assert by.loc[1, "dup_chunk_frac"] == 1.0 / by.loc[1, "n_chunks"]
    # doc 2 = block twice: BOTH its chunks equal the shared text
    assert by.loc[2, "n_chunks"] == 2
    assert by.loc[2, "dup_chunk_frac"] == 1.0
    assert by.loc[4, "dup_chunk_frac"] == 0.0


def test_duplicate_chunk_own_repeat_not_cross_doc(ray_session):
    """A chunk repeated only WITHIN one doc is not a cross-doc dup."""
    from vframe_ray.stages.chunking import duplicate_chunk_fraction
    block = " ".join(f"s{i}" for i in range(8))
    docs = [{"doc_id": 0, "text": (block + " ") * 3},
            {"doc_id": 1, "text": "other words " * 4}]
    got = duplicate_chunk_fraction(
        ray.data.from_items(docs), size=8).to_pandas() \
        .set_index("doc_id")
    assert got.loc[0, "dup_chunk_frac"] == 0.0
    assert got.loc[1, "dup_chunk_frac"] == 0.0


def test_event_funnel_fuzz_vs_scalar(ray_session):
    """Randomized funnel streams vs a per-user greedy chain oracle
    (ties, duplicates, interleaved other-type events)."""
    import numpy as np

    from vframe_ray.stages.sessionize import event_funnel
    rng = np.random.default_rng(11)
    steps = ("view", "click", "purchase")
    for trial in range(6):
        n = int(rng.integers(1, 80))
        users = rng.integers(1, 6, n)
        tss = rng.integers(0, 15, n)          # many ties on purpose
        types = rng.choice(list(steps) + ["other"], n)
        ds = ray.data.from_items([
            {"user_id": int(u), "ts": pd.Timestamp(2024, 1, 1)
             + pd.Timedelta(seconds=int(t)), "event_type": str(e)}
            for u, t, e in zip(users, tss, types)]).repartition(2)
        parts = event_funnel(ds, steps=steps).to_pandas()
        got = parts.groupby("step")["n_users_p"].sum().reindex(
            [1, 2, 3], fill_value=0).tolist()
        want = [0, 0, 0]
        for u in set(users.tolist()):
            ev = [(int(t), str(e)) for uu, t, e in zip(users, tss, types)
                  if uu == u]
            bound = -1.0
            for i, s in enumerate(steps):
                cands = [t for t, e in ev if e == s and t > bound]
                if not cands:
                    break
                bound = min(cands)
                want[i] += 1
        assert got == want, (trial, got, want)
