"""Stage-level tests over tiny in-memory datasets (oracle = plain
python/numpy recomputation)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


@pytest.fixture
def docs_ds(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",   # exact dup of 0
            "the quick brown fox jumps over a lazy dog",     # near dup
            "completely different content here entirely",
            "",                                              # empty
            "der hund und die katze sind im haus",           # German-ish
        ]),
    })
    return ray.data.from_arrow(tbl)


def test_dedup_exact(docs_ds):
    from vframe_ray.stages.dedup import dedup_exact
    out = dedup_exact(docs_ds, ["doc_id"]).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4, 5]   # doc 1 dropped


def test_jaccard_pairs_exact(docs_ds):
    from vframe_ray.stages.dedup import jaccard_pairs, _shingle_set
    from vframe_ray.analyze import Tokenizer
    out = jaccard_pairs(docs_ds, n=3, threshold=0.5).to_pandas()
    got = {(int(a), int(b)): round(j, 9) for a, b, j in
           zip(out["id_a"], out["id_b"], out["jaccard"])}
    # brute-force oracle
    tok = Tokenizer()
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over a lazy dog",
             "completely different content here entirely", "",
             "der hund und die katze sind im haus"]
    shingles = [_shingle_set(tok.tokenize(t), 3) for t in texts]
    want = {}
    for a in range(6):
        for b in range(a + 1, 6):
            sa, sb = shingles[a], shingles[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                want[(a, b)] = round(j, 9)
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_containment_pairs_subset_doc(ray_session):
    # A short doc pasted inside a much longer one: low Jaccard (misses
    # the 0.5 pair bar) but containment = 1.0 — the case the operator
    # exists for.  Counts verified against a brute-force shingle oracle.
    from vframe_ray.stages.dedup import (containment_pairs, jaccard_pairs,
                                         _shingle_set)
    from vframe_ray.analyze import Tokenizer
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"tok{i} word{i} thing{i}" for i in range(40))
    texts = [quote, quote + " " + filler, "unrelated content entirely"]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    out = containment_pairs(ds, n=3, threshold=0.9).to_pandas()
    got = {(int(a), int(b)): (int(i), int(sa), int(sb))
           for a, b, i, sa, sb in zip(out["id_a"], out["id_b"],
                                      out["intersection"], out["size_a"],
                                      out["size_b"])}
    tok = Tokenizer()
    sh = [_shingle_set(tok.tokenize(t), 3) for t in texts]
    inter01 = len(sh[0] & sh[1])
    assert got == {(0, 1): (inter01, len(sh[0]), len(sh[1]))}
    assert inter01 == len(sh[0])            # full containment
    # same pair is BELOW the Jaccard bar — containment is not redundant
    jac = jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()
    assert not len(jac)
    cont = out["containment"].iloc[0]
    assert cont == 1.0


def test_minhash_finds_exact_dup(docs_ds):
    from vframe_ray.stages.dedup import minhash_candidates
    out = minhash_candidates(docs_ds).to_pandas()
    pairs = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert (0, 1) in pairs                      # identical docs always collide


def test_simhash_close_for_near_dup(docs_ds):
    from vframe_ray.stages.dedup import simhash_table
    out = simhash_table(docs_ds).to_pandas().set_index("doc_id")["simhash"]
    h0, h2, h3 = (np.uint64(out[i]) for i in (0, 2, 3))
    d_near = bin(int(h0 ^ h2)).count("1")
    d_far = bin(int(h0 ^ h3)).count("1")
    assert d_near < d_far
    assert out[0] == out[1]                     # identical text, same hash


def test_near_dedup_in_conversation(ray_session):
    from vframe_ray.stages.dedup import near_dedup_in_conversation
    tbl = pa.table({
        "conv_id": pa.array(["c1"] * 4 + ["c2"]),
        "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
        "text": pa.array([
            "alpha beta gamma delta",
            "alpha beta gamma delta epsilon",   # near dup of prev -> drop
            "totally new content now",
            "alpha beta gamma delta",           # near-dup of turn 0 but
                                                # prev kept is turn 2 -> keep
            "alpha beta gamma delta",           # other conversation -> keep
        ]),
    })
    out = near_dedup_in_conversation(ray.data.from_arrow(tbl),
                                     threshold=0.5).to_pandas()
    kept = sorted(zip(out["conv_id"], out["turn_idx"]))
    assert kept == [("c1", 0), ("c1", 2), ("c1", 3), ("c2", 0)]


def test_cosine_topk_matches_numpy(ray_session):
    from vframe_ray.stages.similarity import cosine_topk
    rng = np.random.default_rng(3)
    M = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array(M.tolist(),
                                          pa.list_(pa.float32()))})
    queries = {0: M[0].astype(np.float64), 7: M[7].astype(np.float64)}
    out = cosine_topk(ray.data.from_arrow(tbl), queries, k=5).to_pandas()
    Mn = M.astype(np.float64)
    Mn /= np.linalg.norm(Mn, axis=1, keepdims=True)
    for qid in queries:
        sims = Mn @ Mn[qid]
        order = np.lexsort((np.arange(200), -sims))[:5]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert list(got["vec_id"]) == list(order)
        assert got.iloc[0]["vec_id"] == qid     # self-match first
        np.testing.assert_allclose(got["sim"].to_numpy(), sims[order],
                                   rtol=0, atol=1e-12)


def test_lsh_topk_recall(ray_session):
    from vframe_ray.stages.similarity import lsh_topk
    rng = np.random.default_rng(5)
    M = rng.standard_normal((300, 16)).astype(np.float32)
    M[42] = M[0] + rng.standard_normal(16).astype(np.float32) * 0.01
    tbl = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                    "embedding": pa.array(M.tolist(), pa.list_(pa.float32()))})
    out = lsh_topk(ray.data.from_arrow(tbl), {0: M[0].astype(np.float64)},
                   k=3, dim=16, n_bits=8, n_tables=8).to_pandas()
    # self + the planted near-neighbor must be found
    ids = set(out["vec_id"].astype(int))
    assert 0 in ids and 42 in ids


def test_ivf_topk_recall(ray_session):
    from vframe_ray.stages.similarity import ivf_topk
    rng = np.random.default_rng(8)
    M = rng.standard_normal((400, 16)).astype(np.float32)
    M[77] = M[3] + rng.standard_normal(16).astype(np.float32) * 0.01
    tbl = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                    "embedding": pa.array(M.tolist(), pa.list_(pa.float32()))})
    out = ivf_topk(ray.data.from_arrow(tbl), {3: M[3].astype(np.float64)},
                   k=3, n_centroids=8, n_probe=3).to_pandas()
    ids = set(out["vec_id"].astype(int))
    assert 3 in ids and 77 in ids        # self + planted neighbor found
    assert list(out.sort_values("rank")["vec_id"])[:2] == [3, 77]


def test_sessionize_matches_pandas(ray_session):
    from vframe_ray.stages.sessionize import sessionize
    rng = np.random.default_rng(11)
    n = 500
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 5 * 86400, n)), unit="s")
    df = pd.DataFrame({"event_id": np.arange(n), "ts": ts,
                       "user_id": rng.integers(0, 10, n),
                       "value": rng.random(n)})
    ds = ray.data.from_pandas(df)
    out = sessionize(ds, gap_seconds=1800).to_pandas().sort_values(
        ["user_id", "session_idx"]).reset_index(drop=True)
    # pandas oracle
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        gap = g["ts"].diff() > pd.Timedelta(seconds=1800)
        sess = gap.cumsum()
        for sid, sg in g.groupby(sess):
            rows.append((uid, sid, sg["ts"].min(), sg["ts"].max(),
                         len(sg), sg["value"].sum()))
    want = pd.DataFrame(rows, columns=["user_id", "session_idx",
                                       "session_start", "session_end",
                                       "n_events", "sum_value"]).sort_values(
        ["user_id", "session_idx"]).reset_index(drop=True)
    assert len(out) == len(want)
    assert (out["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (out["session_start"].to_numpy()
            == want["session_start"].to_numpy()).all()
    np.testing.assert_allclose(out["sum_value"], want["sum_value"])


def test_quality_features_hand_checked(ray_session):
    from vframe_ray.stages.textquality import quality_features
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["The cat and the hat!!", ""])})
    out = quality_features(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_tokens"] == 5
    assert out.loc[0, "n_distinct"] == 4        # the cat and hat
    assert out.loc[0, "stopword_ratio"] == 3 / 5   # the, and, the
    assert out.loc[1, "n_tokens"] == 0
    assert out.loc[1, "avg_token_len"] == 0.0


def test_quality_scorer_actor_pool(ray_session):
    """Model-scoring stage: actor-pool path (concurrency>1) must equal
    a hand-computed linear logit; empty docs score exactly the bias;
    custom weights flow through; top-k cut + tiebreak deterministic."""
    from vframe_ray.stages.textquality import (QUALITY_WEIGHTS,
                                               quality_score_topk)
    texts = ["The cat and the hat!!", "", "word " * 40,
             "the the the the"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    out = quality_score_topk(ray.data.from_arrow(tbl), k=4,
                             concurrency=2)
    w = QUALITY_WEIGHTS
    # doc 0: n=5 nd=4 atl=15/5 (five 3-char tokens) sr=3/5
    s0 = w["bias"] + w["n_tokens"] * 5.0
    s0 = s0 + w["n_distinct"] * 4.0
    s0 = s0 + w["avg_token_len"] * (15.0 / 5.0)
    s0 = s0 + w["stopword_ratio"] * (3.0 / 5.0)
    got = dict(zip(out["doc_id"], out["score_r"]))
    assert got[0] == round(s0, 6)
    assert got[1] == w["bias"]                 # empty doc = bias only
    # custom weights: zero everything but token count -> ranking by n
    zw = {"bias": 0.0, "n_tokens": 1.0, "n_distinct": 0.0,
          "avg_token_len": 0.0, "stopword_ratio": 0.0}
    out2 = quality_score_topk(ray.data.from_arrow(tbl), k=2, weights=zw)
    assert list(out2["doc_id"]) == [2, 0]      # 40 tokens, then 5
    assert list(out2["score_r"]) == [40.0, 5.0]


def test_media_stub_poison_rows(ray_session):
    from vframe_ray.stages.multimodal import image_features, synth_media_table
    t = synth_media_table(64)
    out = image_features(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 64
    bad = out[out["error"].notna()]
    assert len(bad) == sum(1 for i in range(64) if i % 17 == 13)
    good = out[out["error"].isna()]
    assert (good["width"] == 8).all()
    assert good["feature"].map(len).eq(6).all()


def test_predicate_dsl(ray_session, small_corpus_dir):
    from vframe_ray.sources.readers import read_transcripts
    ds = read_transcripts(small_corpus_dir, columns=["conv_id", "turn_idx"],
                          predicates=["turn_idx >= 3", "turn_idx < 5"])
    t = ds.to_pandas()
    assert ((t["turn_idx"] >= 3) & (t["turn_idx"] < 5)).all()
    assert len(t) > 0


def test_predicate_dsl_rejects_garbage():
    from vframe_ray.sources.readers import compile_predicate
    with pytest.raises(ValueError):
        compile_predicate("no-operator-here")


def test_hashed_features_properties(ray_session):
    """Sign/bucket derivation and per-doc token-count conservation."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from vframe_ray.analyze import Tokenizer
    from vframe_ray.stages.features import hashed_features
    from vframe_ray.stages.hashing import md5_u64

    rows = [{"doc_id": 0, "text": "alpha beta alpha"},
            {"doc_id": 1, "text": "beta GAMMA-beta!"},
            {"doc_id": 2, "text": ""}]
    out = hashed_features(ray.data.from_items(rows), dim=8).to_pandas()
    assert (out["bucket"] < 8).all() and (out["bucket"] >= 0).all()
    assert 2 not in set(out["doc_id"])          # empty doc -> no rows
    # every feature value reproduces from the hash primitive directly
    tok = Tokenizer()
    for doc_id, text in [(0, rows[0]["text"]), (1, rows[1]["text"])]:
        want: dict[int, int] = {}
        h = md5_u64(pa.array(tok.tokenize(text)))
        for hv in h:
            b = int(hv) % 8          # int() first: np.uint64 % int
            # silently promotes to float64 and destroys the low bits
            want[b] = want.get(b, 0) + (-1 if (int(hv) >> 63) & 1 else 1)
        want = {b: v for b, v in want.items() if v != 0}
        got = {int(r.bucket): int(r.value)
               for r in out[out.doc_id == doc_id].itertuples()}
        assert got == want


def test_ngram_novelty_first_copy_wins(ray_session):
    # doc 0 and doc 5 identical: novelty 1.0 for doc 0, 0.0 for doc 5;
    # doc 7 = half doc 0, half fresh — novelty strictly between
    from vframe_ray.stages.dedup import ngram_novelty, _shingle_set
    from vframe_ray.analyze import Tokenizer
    quote = "the quick brown fox jumps over the lazy dog"
    texts = {0: quote, 5: quote,
             7: quote + " entirely new trailing words here now"}
    tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                    "text": pa.array(list(texts.values()))})
    out = ngram_novelty(ray.data.from_arrow(tbl).repartition(3)) \
        .to_pandas().set_index("doc_id")
    tok = Tokenizer()
    sh0 = _shingle_set(tok.tokenize(texts[0]), 3)
    sh7 = _shingle_set(tok.tokenize(texts[7]), 3)
    assert out.loc[0, "novelty_r"] == 1.0
    assert out.loc[5, "novelty_r"] == 0.0
    assert out.loc[7, "n_shingles"] == len(sh7)
    assert out.loc[7, "n_novel"] == len(sh7 - sh0)
    assert 0.0 < out.loc[7, "novelty_r"] < 1.0


def test_label_centroids_exact_and_invariant(ray_session):
    # exact int sums vs a numpy scalar oracle; partitioning must not
    # change a single value (int64 sums); all-zero vector -> 0 codes
    from vframe_ray.stages.similarity import label_centroids
    rng = np.random.default_rng(19)
    n, dim = 60, 8
    M = rng.standard_normal((n, dim)).astype(np.float32)
    M[7] = 0.0                                   # all-zero vector
    labels = rng.integers(0, 3, n).astype(np.int64)
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "label": pa.array(labels),
                    "embedding": pa.array(M.tolist(),
                                          pa.list_(pa.float32()))})
    x = M.astype(np.float64)
    maxabs = np.abs(x).max(axis=1)
    safe = np.where(maxabs > 0, maxabs, 1.0)
    codes = np.floor(x * 127.0 / safe[:, None] + 0.5)
    codes[maxabs == 0] = 0.0
    codes = codes.astype(np.int64)
    outs = []
    for parts in (1, 5):
        out = label_centroids(
            ray.data.from_arrow(tbl).repartition(parts)).to_pandas() \
            .sort_values(["label", "dim"]).reset_index(drop=True)
        outs.append(out)
        for lb in range(3):
            m = labels == lb
            want = codes[m].sum(axis=0)
            got = out[out["label"] == lb].sort_values("dim")
            assert list(got["sum_code"]) == list(want)
            assert (got["n_vecs"] == int(m.sum())).all()
            np.testing.assert_array_equal(
                got["centroid_r"].to_numpy(),
                np.round(want / m.sum(), 6))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_cross_source_dups_planted(ray_session):
    # texts planted across sources: t0 in A+B, t1 in A+B+C, t2 only in
    # A (twice — within-source dup must NOT appear in the cross matrix)
    from vframe_ray.stages.dedup import cross_source_dups
    rows = [("A", "t0"), ("B", "t0"),
            ("A", "t1"), ("B", "t1"), ("C", "t1"),
            ("A", "t2"), ("A", "t2"),
            ("B", "unique b"), ("C", "unique c")]
    tbl = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                    "source": pa.array([r[0] for r in rows]),
                    "text": pa.array([r[1] for r in rows])})
    out = cross_source_dups(ray.data.from_arrow(tbl).repartition(3))
    got = {(a, b): int(n) for a, b, n in
           zip(out["source_a"], out["source_b"], out["n_texts"])}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
