"""Round-5 third-session wave: unigram-LM cross-entropy quality signal
(plus siblings added later in the session)."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _xent_scalar(texts):
    """Scalar oracle: corpus unigram MLE cross-entropy per doc (nats)."""
    from vframe_ray.analyze import Tokenizer
    tok = Tokenizer()
    docs = [tok.tokenize(t) for t in texts]
    cf = {}
    for d in docs:
        for t in d:
            cf[t] = cf.get(t, 0) + 1
    c = sum(cf.values())
    out = {}
    for i, d in enumerate(docs):
        if not d:
            continue
        s = sum(math.log(cf[t] / c) for t in d)
        out[i] = (len(d), round(-s / len(d), 6))
    return out


def test_unigram_cross_entropy_scalar_oracle(ray_session):
    import ray.data
    from vframe_ray.stages.textquality import unigram_cross_entropy
    texts = ["the cat sat on the mat", "the the the", "rare zyzzyva token",
             "", "cat mat", "on on the zyzzyva"]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    out = unigram_cross_entropy(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _xent_scalar(texts)
    assert list(out["doc_id"]) == sorted(exp)       # empty doc absent
    for _, r in out.iterrows():
        n, h = exp[int(r["doc_id"])]
        assert int(r["n_tokens"]) == n
        assert r["h_r"] == pytest.approx(h, abs=1e-6)
    # an all-repeat doc of the most common term scores LOWEST
    assert out.set_index("doc_id")["h_r"].idxmin() == 1


def test_unigram_cross_entropy_partition_invariant(ray_session):
    # h_r must be a pure function of the corpus — never of block
    # boundaries (the per-doc float sum orders contributions by value)
    import ray.data
    from vframe_ray.stages.textquality import unigram_cross_entropy
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                    "text": pa.array(texts)})
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(unigram_cross_entropy(ds).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_unigram_cross_entropy_corpus_total_passthrough(ray_session):
    # an index-backed caller passes total_len instead of the pre-pass;
    # the result must be identical
    import ray.data
    from vframe_ray.stages.textquality import unigram_cross_entropy
    texts = ["alpha beta gamma", "alpha alpha beta", "gamma delta"]
    tbl = pa.table({"doc_id": pa.array(np.arange(3, dtype=np.int64)),
                    "text": pa.array(texts)})
    a = unigram_cross_entropy(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = unigram_cross_entropy(ray.data.from_arrow(tbl),
                              corpus_total=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_semantic_dedup_planted_duplicates(ray_session):
    # two planted near-identical vectors: same cluster, higher id
    # dropped; an isolated vector survives
    import ray.data
    from vframe_ray.stages.similarity import semantic_dedup
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8))
    base[7] = base[2] + 1e-3 * rng.normal(size=8)     # near-dup of 2
    base[13] = -base[4]                               # anti-parallel: NOT a dup
    tbl = pa.table({
        "vec_id": pa.array(np.arange(20, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32()))})
    out = semantic_dedup(ray.data.from_arrow(tbl), k=3,
                         threshold=0.9).to_pandas().set_index("vec_id")
    assert out.loc[7, "cluster"] == out.loc[2, "cluster"]
    assert not out.loc[7, "kept"]          # higher id of the pair drops
    assert out.loc[2, "kept"]              # keep-first
    assert out.loc[13, "kept"]             # negative dot can never drop
    assert len(out) == 20


def test_semantic_dedup_partition_invariant(ray_session):
    import ray.data
    from vframe_ray.stages.similarity import semantic_dedup
    rng = np.random.default_rng(5)
    x = rng.normal(size=(60, 8))
    x[30:40] = x[0:10] + 1e-4 * rng.normal(size=(10, 8))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in x],
                              pa.list_(pa.float32()))})
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(semantic_dedup(ds, k=4, threshold=0.95).to_pandas()
                    .sort_values("vec_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert (~outs[0]["kept"]).sum() >= 10  # the planted copies drop


def test_semantic_dedup_strip_rows_invariant(ray_session):
    # the strip-chunked Gram product must not change results
    import ray.data
    from vframe_ray.stages.similarity import semantic_dedup
    rng = np.random.default_rng(8)
    x = rng.normal(size=(50, 6))
    x[25:] = x[:25] * 1.0001
    tbl = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in x],
                              pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    a = semantic_dedup(ds, k=2, threshold=0.9,
                       strip_rows=4).to_pandas()
    b = semantic_dedup(ds, k=2, threshold=0.9,
                       strip_rows=4096).to_pandas()
    assert a.equals(b)


def test_fuzzy_match_pairs_vs_levenshtein(ray_session):
    # hostile cases: transposition is distance 2 (excluded), dupes on
    # both sides collapse, short keys behave, equal keys match
    import duckdb
    import ray.data
    from vframe_ray.stages.joins import fuzzy_match_pairs
    L = ["view", "vew", "clik", "purchase", "purchsae", "error",
         "errors", "x", "ab", "viiew"]
    R = ["view", "click", "purchase", "error", "checkout", "a", "b",
         "ba"]
    out = fuzzy_match_pairs(
        ray.data.from_arrow(pa.table({"dk": pa.array(L * 3)}))
        .repartition(4),
        ray.data.from_arrow(pa.table({"t": pa.array(R)})),
        left_key="dk", right_key="t").to_pandas() \
        .sort_values(["dk", "t"]).reset_index(drop=True)
    ora = duckdb.connect().execute(
        """SELECT l.dk, r.t
           FROM (SELECT DISTINCT unnest(?::VARCHAR[]) dk) l,
                (SELECT DISTINCT unnest(?::VARCHAR[]) t) r
           WHERE levenshtein(l.dk, r.t) <= 1
           ORDER BY l.dk, r.t""", [L, R]).df()
    ora.columns = ["dk", "t"]
    assert out.equals(ora)
    assert ("purchsae", "purchase") not in set(
        zip(out["dk"], out["t"]))          # transposition = distance 2


def test_fuzzy_match_pairs_distance2(ray_session):
    # max_edits=2 picks up the transposition the d=1 join excludes
    import duckdb
    import ray.data
    from vframe_ray.stages.joins import fuzzy_match_pairs
    L = ["purchsae", "vew", "xyz"]
    R = ["purchase", "view", "abc"]
    out = fuzzy_match_pairs(
        ray.data.from_arrow(pa.table({"dk": pa.array(L)})),
        ray.data.from_arrow(pa.table({"t": pa.array(R)})),
        left_key="dk", right_key="t", max_edits=2).to_pandas() \
        .sort_values(["dk", "t"]).reset_index(drop=True)
    ora = duckdb.connect().execute(
        """SELECT l.dk, r.t
           FROM (SELECT DISTINCT unnest(?::VARCHAR[]) dk) l,
                (SELECT DISTINCT unnest(?::VARCHAR[]) t) r
           WHERE levenshtein(l.dk, r.t) <= 2
           ORDER BY l.dk, r.t""", [L, R]).df()
    ora.columns = ["dk", "t"]
    assert out.equals(ora)
    assert ("purchsae", "purchase") in set(zip(out["dk"], out["t"]))


def test_flesch_reading_ease_closed_form(ray_session):
    # pinned counting rules on hand-computable docs
    import ray.data
    from vframe_ray.stages.textquality import flesch_reading_ease
    texts = [
        "The cat sat.",        # w=3 s=1 syl=1+1+1=3
        "Hello!! Bye?",        # w=2 s=2 syl(hello)=2 syl(bye)=1 -> 3
        "123 xyz",             # no vowels: min-1 rule -> syl=2, s=1(min)
        "",                    # absent
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                    "text": pa.array(texts)})
    out = flesch_reading_ease(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [0, 1, 2]
    assert list(out["n_words"]) == [3, 2, 2]
    assert list(out["n_sentences"]) == [1, 2, 1]
    assert list(out["n_syllables"]) == [3, 3, 2]
    fre0 = round(206.835 - 1.015 * 3 / 1 - 84.6 * 3 / 3, 6)
    fre1 = round(206.835 - 1.015 * 2 / 2 - 84.6 * 3 / 2, 6)
    assert out["fre_r"][0] == pytest.approx(fre0, abs=1e-9)
    assert out["fre_r"][1] == pytest.approx(fre1, abs=1e-9)


def test_c4_rule_filter_flags(ray_session):
    import ray.data
    from vframe_ray.stages.textquality import c4_rule_filter
    texts = [
        "the quick brown fox jumps over.",   # all pass
        "short.",                            # len fails (min 5)
        "code block sample here {brace}.",   # brace fails
        "this has Lorem Ipsum filler text.", # lorem fails (case-insens)
        "five whole words without ending",   # punct fails
        'quoted ending works fine here "',   # quote counts as terminal
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                    "text": pa.array(texts)})
    out = c4_rule_filter(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["kept"]) == [1, 0, 0, 0, 0, 1]
    assert list(out["rule_len"]) == [1, 0, 1, 1, 1, 1]
    assert list(out["rule_brace"]) == [1, 1, 0, 1, 1, 1]
    assert list(out["rule_lorem"]) == [1, 1, 1, 0, 1, 1]
    assert list(out["rule_punct"]) == [1, 1, 1, 1, 0, 1]


def test_mmr_rerank_prefers_diversity(ray_session, tmp_path):
    # candidate 1 is a near-copy of the seed (slightly lower rel);
    # candidate 2 is orthogonal with much lower rel. Plain relevance
    # order would pick the copy second; MMR must pick the orthogonal
    # vector second and defer the copy.
    import pyarrow.parquet as pq
    from vframe_ray.stages.similarity import mmr_rerank
    vecs = {
        10: [1.0, 0.0, 0.0, 0.0],      # seed (max rel)
        11: [0.999, 0.01, 0.0, 0.0],   # near-copy of seed
        12: [0.0, 1.0, 0.0, 0.0],      # orthogonal
        13: [0.0, 0.0, 1.0, 0.0],      # orthogonal
    }
    tbl = pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                              pa.list_(pa.float32()))})
    path = str(tmp_path / "emb.parquet")
    pq.write_table(tbl, path)
    cand = {0: (np.array([10, 11, 12, 13], np.int64),
                np.array([2.0, 1.9, 1.2, 1.0], np.float64))}
    out = mmr_rerank(cand, path, k=4, lam=0.5)
    assert list(out["vec_id"]) == [10, 12, 13, 11]
    assert out["maxcos_r"][0] == 0.0            # seed convention
    assert out["maxcos_r"].iloc[-1] > 0.99      # the copy's redundancy
    # rank-1 rel passes through rounded, not rescaled
    assert out["rel_r"][0] == 2.0


def test_dedup_normalized_rule(ray_session):
    # punctuation / case / whitespace variants collapse; genuinely
    # different texts survive; keep-first by id
    import ray.data
    from vframe_ray.stages.dedup import dedup_normalized
    texts = ["Hello,   world!", "hello world", "HELLO *** WORLD",
             "hello worlds", "", "   "]
    tbl = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                    "text": pa.array(texts)})
    out = dedup_normalized(ray.data.from_arrow(tbl).repartition(3),
                           key_cols=["doc_id"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # 0,1,2 normalize identically -> keep 0; 4 and 5 normalize to ""
    # -> keep 4; 3 is distinct
    assert list(out["doc_id"]) == [0, 3, 4]
    assert list(out.columns) == ["doc_id", "text"]   # helpers dropped


def test_analyze_tokens_positions(ray_session):
    import ray.data
    from vframe_ray.stages.textops import analyze_tokens
    tbl = pa.table({
        "doc_id": pa.array([5, 7, 9], pa.int64()),
        "text": pa.array(["Hello, World! 42", "", "one"]),
    })
    out = analyze_tokens(ray.data.from_arrow(tbl).repartition(2)) \
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert list(zip(out["doc_id"], out["pos"], out["term"])) == [
        (5, 0, "hello"), (5, 1, "world"), (5, 2, "42"), (9, 0, "one")]


def test_quality_mix_report_closed_form(ray_session):
    # 2 sources x 10 docs with strictly decreasing entropy by doc_id:
    # tiles are fully predictable, tokens count exactly
    import ray.data
    from vframe_ray.stages.stats import quality_mix_report
    # entropy strictly decreases as repetition increases
    texts = ["abcdefghij"[: 10 - i] + "z" * i for i in range(10)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["web" if i % 2 == 0 else "book"
                            for i in range(10)])})
    out = quality_mix_report(
        ray.data.from_arrow(tbl).repartition(3), k=5)
    # rank == doc_id + 1 (entropy strictly decreasing), so tile =
    # (doc_id // 2) + 1; each tile holds one web (even id) + one book
    assert len(out) == 10
    assert (out.groupby("tile")["n_docs"].sum() == 2).all()
    web = out[out["source"] == "web"]
    assert list(web["tile"]) == [1, 2, 3, 4, 5]
    assert (out["n_tokens"] > 0).all()


# ---------------- property tests (pure kernels, no Ray) ----------------

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcdef", min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(_words, _words, st.integers(min_value=1, max_value=2))
def test_symspell_candidates_complete(a, b, d):
    # the fuzzy join's candidate rule: any pair within levenshtein d
    # MUST share a delete-<=d variant (else the join would silently
    # miss it) — the completeness half; the banded DP is the precision
    # half and is itself property-tested in test_fuzzy_syn.py
    from vframe_ray.index.fuzzy import (_levenshtein_within,
                                        deletion_variants)
    if _levenshtein_within(a, b, d):
        assert deletion_variants(a, d) & deletion_variants(b, d), (a, b)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcdeyuioz0123", min_size=1,
                        max_size=12), min_size=1, max_size=20))
def test_vowel_group_counts_match_re(tokens):
    # flesch's syllable rule: Arrow's RE2 run count == Python re
    import re
    import pyarrow.compute as pc2
    arrow = pc2.count_substring_regex(
        pa.array(tokens, pa.string()), r"[aeiouy]+") \
        .to_numpy(zero_copy_only=False)
    scalar = [len(re.findall(r"[aeiouy]+", t)) for t in tokens]
    assert list(arrow) == scalar


def test_boosting_demotes_but_keeps(ray_session, tmp_path):
    # a doc matching the negative query must stay in the results but
    # fall below an otherwise-lower-scored clean doc
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import (search_boosting_index,
                                        search_index)
    rows = [
        ("c0", 0, "alpha alpha alpha beta error"),   # best alpha + error
        ("c1", 0, "alpha alpha gamma"),              # clean
        ("c2", 0, "alpha delta"),                    # clean, weakest
        ("c3", 0, "unrelated text"),
    ]
    tbl = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([r[1] for r in rows],
                                         pa.int32()),
                    "text": pa.array([r[2] for r in rows])})
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), idx,
                EngineConfig(index=IndexConfig(num_segments=2)))
    plain = search_index(idx, [{"query_id": 0, "query_text": "alpha",
                                "k": 4}]).to_pandas()
    assert plain.iloc[0]["conv_id"] == "c0"          # wins untamed
    boosted = search_boosting_index(idx, [{
        "query_id": 0, "positive": "alpha", "negative": "error",
        "negative_boost": 0.1, "k": 4}]).to_pandas()
    ids = list(boosted["conv_id"])
    assert "c0" in ids                               # kept, not dropped
    assert ids.index("c0") > ids.index("c1")         # but demoted
    # demoted score = 0.1 x plain score, exactly
    ps = float(plain[plain.conv_id == "c0"]["score"].iloc[0])
    bs = float(boosted[boosted.conv_id == "c0"]["score"].iloc[0])
    assert bs == pytest.approx(0.1 * ps, rel=1e-12)


def test_prepare_training_data_gates(ray_session):
    # planted corpus: a duplicate pair (dedup kills the higher id), a
    # short doc (length gate), and a rare-token doc that lands above
    # the mean cross-entropy (quality gate)
    import ray.data
    from vframe_ray.pipelines.flagship import prepare_training_data
    common = " ".join(["alpha beta gamma delta"] * 12)   # 48 tokens
    rare = " ".join(f"zx{i}q" for i in range(48))        # 48 uniques
    texts = [common, common.upper(), "tiny doc", common + " beta",
             rare]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["a", "a", "a", "b", "b"])})
    out = prepare_training_data(ray.data.from_arrow(tbl),
                                min_tokens=40, chunk_size=32)
    # doc1 deduped (variant of doc0), doc2 too short, doc4 above-mean
    # entropy -> survivors are doc0 (src a) and doc3 (src b)
    assert list(out["source"]) == ["a", "b"]
    assert list(out["n_docs"]) == [1, 1]
    assert list(out["n_tokens"]) == [48, 49]
    assert list(out["n_chunks"]) == [2, 2]     # ceil(48/32), ceil(49/32)


def test_dedup_normalized_large_string_column(ray_session):
    # large_string corpora (what big parquet writers emit) must not
    # crash the normalize join: binary_join lacks a
    # (large_list<large_string>, scalar) kernel
    import ray.data
    from vframe_ray.stages.dedup import dedup_normalized
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["Alpha beta!", "alpha   BETA", "gamma"],
                         pa.large_string())})
    out = dedup_normalized(ray.data.from_arrow(tbl),
                           key_cols=["doc_id"]).to_pandas() \
        .sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 2]


def test_shingles_large_string_short_rows(ray_session):
    # the short-row whole-doc shingle join on a large_string column
    from vframe_ray.analyze import Tokenizer
    from vframe_ray.stages.hashing import shingle_rows
    texts = pa.array(["one two", "a b c d e"], pa.large_string())
    parents, strings, sizes = shingle_rows(Tokenizer(), texts, 3)
    assert "one two" in strings.to_pylist()


def test_winnow_pairs_planted_shared_run(ray_session):
    # the winnowing guarantee: a shared run of >= w+k-1 tokens (here
    # 4+3-1=6) must produce at least one shared selected hash; two
    # long-run copies must pair, unrelated docs must not
    import ray.data
    from vframe_ray.stages.dedup import winnow_pairs
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        "intro words " + shared + " tail one",
        "different prefix " + shared + " other ending",
        "totally unrelated content with many words here",
        "another separate document about nothing shared",
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                    "text": pa.array(texts)})
    out = winnow_pairs(ray.data.from_arrow(tbl).repartition(2),
                       min_shared=1).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert not any(2 in p or 3 in p for p in pairs)


def test_continuation_pairs_directed(ray_session):
    import ray.data
    from vframe_ray.stages.dedup import continuation_pairs
    texts = ["one two three four five six seven",
             "five six seven eight nine ten more",   # continues doc 0
             "unrelated words entirely different here now",
             "short"]                                 # < k: no key
    tbl = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                    "text": pa.array(texts)})
    out = continuation_pairs(ray.data.from_arrow(tbl).repartition(2),
                             k=3).to_pandas()
    assert list(zip(out["id_a"], out["id_b"])) == [(0, 1)]  # directed


def test_top_hits_by_facet(ray_session, tmp_path):
    # per-facet top-h: each lang bucket gets its own best docs; a
    # bucket with fewer matches returns what it has
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import top_hits_index
    rows = [
        ("a", 0, "alpha alpha alpha", "en"),
        ("b", 0, "alpha alpha", "en"),
        ("c", 0, "alpha", "en"),
        ("d", 0, "alpha beta", "de"),
        ("e", 0, "gamma", "de"),
    ]
    tbl = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([r[1] for r in rows],
                                         pa.int32()),
                    "text": pa.array([r[2] for r in rows]),
                    "lang": pa.array([r[3] for r in rows])})
    idx = str(tmp_path / "th_idx")
    build_index(ray.data.from_arrow(tbl), idx,
                EngineConfig(index=IndexConfig(num_segments=2)),
                attribute_cols=["lang"])
    out = top_hits_index(idx, [{"query_id": 0, "query_text": "alpha",
                                "h": 2}], "lang").to_pandas()
    en = out[out.facet == "en"]
    de = out[out.facet == "de"]
    assert list(en["conv_id"]) == ["a", "b"]       # top-2 by tf
    assert list(en["rank"]) == [1, 2]
    assert list(de["conv_id"]) == ["d"]            # only one de match
    assert "e" not in set(out["conv_id"])          # non-matching doc


def test_retrieval_eval_closed_form(ray_session, tmp_path):
    # hand-checkable ranking: relevance = contains ALL terms; one
    # high-tf doc missing a term must cost AP/NDCG exactly
    import math
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import (retrieval_eval_index,
                                        search_index)
    rows = [
        ("a", "alpha alpha alpha alpha alpha"),   # high tf, NOT rel
        ("b", "alpha beta"),                      # rel
        ("c", "alpha beta filler words"),         # rel
        ("d", "unrelated"),
    ]
    tbl = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([0] * 4, pa.int32()),
                    "text": pa.array([r[1] for r in rows])})
    idx = str(tmp_path / "ev_idx")
    build_index(ray.data.from_arrow(tbl), idx,
                EngineConfig(index=IndexConfig(num_segments=2)))
    out = retrieval_eval_index(idx, [
        {"query_id": 0, "query_text": "alpha beta", "k": 4}]).to_pandas()
    r = out.iloc[0]
    assert r["n_rel"] == 2
    ranked = search_index(idx, [{"query_id": 0,
                                 "query_text": "alpha beta",
                                 "k": 4}]).to_pandas()
    order = list(ranked["conv_id"])
    rel = [1 if c in ("b", "c") else 0 for c in order]
    csum, ap = 0, 0.0
    for i, rl in enumerate(rel, 1):
        csum += rl
        if rl:
            ap += csum / i
    ap /= 2
    dcg = sum(rl / math.log2(i + 1) for i, rl in enumerate(rel, 1))
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2))
    assert r["ap_r"] == pytest.approx(round(ap, 6), abs=1e-9)
    assert r["ndcg_r"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)


def test_prf_expands_and_changes_ranking(ray_session):
    # PRF must actually add terms (the expanded result differs from the
    # plain search for at least one query on the seeded corpus)
    from vframe_ray.pipelines.flagship import (PRF_QUERIES, bm25_prf,
                                               documents_index)
    from vframe_ray.index.query import search_index
    sf = "/root/testdata/sf0.001"
    exp = bm25_prf(sf).to_pandas()
    plain = search_index(documents_index(sf), PRF_QUERIES).to_pandas()
    plain["doc_id"] = plain["conv_id"].astype("int64")
    changed = False
    for q in PRF_QUERIES:
        a = list(exp[exp.query_id == q["query_id"]]["doc_id"])
        b = list(plain[plain.query_id == q["query_id"]]["doc_id"])
        assert len(a) == len(b) == q["k"]
        if a != b:
            changed = True
    assert changed


def test_index_alias_blue_green(ray_session, tmp_path):
    # blue-green reindex: queries through an alias flip atomically
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import search_index
    from vframe_ray.state.manifest import alias_resolve, alias_set
    cfg = EngineConfig(index=IndexConfig(num_segments=2))

    def mk(path, texts):
        tbl = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts)})
        build_index(ray.data.from_arrow(tbl), str(path), cfg)
        return str(path)

    blue = mk(tmp_path / "blue", ["alpha beta", "alpha gamma"])
    green = mk(tmp_path / "green",
               ["delta epsilon", "delta zeta", "delta eta"])
    alias = str(tmp_path / "live.alias")
    alias_set(alias, blue)
    assert alias_resolve(alias) == blue
    q = [{"query_id": 0, "query_text": "alpha delta", "k": 5}]
    r1 = search_index(alias, q).to_pandas()
    assert len(r1) == 2 and set(r1["conv_id"]) == {"c0", "c1"}
    alias_set(alias, green)                      # atomic flip
    r2 = search_index(alias, q).to_pandas()
    assert len(r2) == 3                          # the flip really took
    # alias-to-alias is rejected
    a2 = str(tmp_path / "second.alias")
    alias_set(a2, blue)
    alias_set(alias, a2)
    import pytest as _pt
    with _pt.raises(ValueError):
        alias_resolve(alias)


def test_alias_service_binds_at_construction(ray_session, tmp_path):
    # a running service must NOT half-see an alias flip (segments from
    # blue, dictionary from green); it binds wholly at construction
    import ray.data
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import build_index
    from vframe_ray.index.query import QueryService
    from vframe_ray.state.manifest import alias_set
    cfg = EngineConfig(index=IndexConfig(num_segments=2))

    def mk(path, texts):
        tbl = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts)})
        build_index(ray.data.from_arrow(tbl), str(path), cfg)
        return str(path)

    blue = mk(tmp_path / "blue", ["alpha beta", "alpha gamma"])
    green = mk(tmp_path / "green", ["delta one", "delta two",
                                    "delta three"])
    alias = str(tmp_path / "live.alias")
    alias_set(alias, blue)
    svc = QueryService(alias, n_actors=2)
    try:
        q = [{"query_id": 0, "query_text": "alpha delta", "k": 5}]
        assert svc.search(q).num_rows == 2          # blue
        alias_set(alias, green)                     # flip mid-service
        assert svc.search(q).num_rows == 2          # still wholly blue
        svc2 = QueryService(alias, n_actors=2)
        try:
            assert svc2.search(q).num_rows == 3     # fresh binds green
        finally:
            svc2.shutdown()
    finally:
        svc.shutdown()


def test_image_ahash_identity_and_poison(ray_session):
    # identical pixel content -> identical hash; different rotation ->
    # different hash; corrupt payload -> poison row (hash 0, error set)
    import ray.data
    from vframe_ray.stages.multimodal import ImageAhashStage, bmp_encode
    idx8 = np.arange(64, dtype=np.int64).reshape(8, 8)

    def img(rot):
        v = (4 * ((idx8 + rot) % 64)).astype(np.uint8)
        return bmp_encode(np.stack([v, v, v], axis=-1))

    tbl = pa.table({
        "media_id": pa.array(["a", "b", "c", "bad"], pa.string()),
        "payload": pa.array([img(5), img(5), img(9), b"not a bmp"],
                            pa.binary())})
    out = ray.data.from_arrow(tbl) \
        .map_batches(ImageAhashStage(), batch_format="pyarrow") \
        .to_pandas().set_index("media_id")
    assert out.loc["a", "ahash"] == out.loc["b", "ahash"]
    assert out.loc["a", "ahash"] != out.loc["c", "ahash"]
    assert out.loc["bad", "ahash"] == 0
    assert out.loc["bad", "error"]


def test_mix_weights_smoothing(ray_session):
    # alpha<1 upweights the small source relative to proportional
    import ray.data
    from vframe_ray.stages.stats import mix_weights
    texts = ["w " * 100] * 9 + ["w " * 10]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["big"] * 9 + ["small"])})
    out = mix_weights(ray.data.from_arrow(tbl).repartition(3),
                      alpha=0.5).set_index("source")
    assert out.loc["big", "n_tokens"] == 900
    assert out.loc["small", "n_tokens"] == 10
    prop = 10 / 910
    assert out.loc["small", "weight_r"] > prop      # smoothed up
    assert abs(out["weight_r"].sum() - 1.0) < 2e-6


def test_new_wave_partition_invariance(ray_session):
    # winnow/continuation pair sets must never depend on block layout
    import ray.data
    from vframe_ray.stages.dedup import continuation_pairs, winnow_pairs
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = ([f"lead {i} words " + shared + f" tail {i}"
              for i in range(6)]
             + ["one two three four five six",
                "four five six seven eight nine"])
    tbl = pa.table({"doc_id": pa.array(np.arange(8, dtype=np.int64)),
                    "text": pa.array(texts)})
    for op, kw in ((winnow_pairs, {"min_shared": 1}),
                   (continuation_pairs, {"k": 3})):
        outs = []
        for parts in (1, 5):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            outs.append(op(ds, **kw).to_pandas()
                        .sort_values(list(op(ds, **kw).to_pandas()
                                          .columns))
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1]), op.__name__


def test_new_wave_empty_inputs(ray_session):
    # every new-wave op must return a schema-stable empty/identity
    # result on an empty corpus rather than raising
    import ray.data
    from vframe_ray.stages.dedup import (continuation_pairs,
                                         dedup_normalized, winnow_pairs)
    from vframe_ray.stages.textquality import (c4_rule_filter,
                                               flesch_reading_ease,
                                               unigram_cross_entropy)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    ds = ray.data.from_arrow(empty)
    assert unigram_cross_entropy(ds).count() == 0
    assert flesch_reading_ease(ds).count() == 0
    assert c4_rule_filter(ds).count() == 0
    assert dedup_normalized(ds, key_cols=["doc_id"]).count() == 0
    assert winnow_pairs(ds).count() == 0
    assert continuation_pairs(ds).count() == 0


def test_fuzzy_match_pairs_unicode(ray_session):
    # the engine's edit distance is over CODEPOINTS (python slicing in
    # deletion_variants + the banded DP): 'cafe' ~ 'café' is distance
    # 1. DuckDB's levenshtein counts BYTES ('é' = 2), so the ASCII
    # driver oracle is exact but unicode keys diverge by design — this
    # test pins the engine's (more linguistic) codepoint semantics
    import ray.data
    from vframe_ray.stages.joins import fuzzy_match_pairs
    L = ["café", "cafe", "naïve", "naive", "über"]
    R = ["café", "naïve", "uber", "apfel"]
    out = fuzzy_match_pairs(
        ray.data.from_arrow(pa.table({"dk": pa.array(L)})),
        ray.data.from_arrow(pa.table({"t": pa.array(R)})),
        left_key="dk", right_key="t").to_pandas()
    pairs = set(zip(out["dk"], out["t"]))
    assert ("cafe", "café") in pairs       # substitution across accents
    assert ("naive", "naïve") in pairs
    assert ("über", "uber") in pairs
    assert ("café", "café") in pairs       # exact still matches
    assert not any(b == "apfel" for _, b in pairs)
