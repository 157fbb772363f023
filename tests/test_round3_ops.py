"""Round-3 operator additions: connected-components dedup clustering,
as-of join, grouped top-k, stratified hash sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _pairs_ds(pairs):
    t = pa.table({"id_a": pa.array([a for a, _ in pairs], pa.int64()),
                  "id_b": pa.array([b for _, b in pairs], pa.int64())})
    return ray.data.from_arrow(t)


@pytest.mark.parametrize("driver_threshold", [0, 5_000_000])
def test_connected_components_chain_and_islands(ray_session, driver_threshold):
    # chain 1-2-3-4-5 (diameter > 1 round), island {10,11}, singleton pair
    # {20,21}; threshold 0 forces the distributed BSP path, the default
    # takes the single-task fast path — results must be identical
    from vframe_ray.stages.graph import connected_components
    cc = connected_components(
        _pairs_ds([(2, 1), (2, 3), (4, 3), (5, 4), (10, 11), (21, 20)]),
        driver_threshold=driver_threshold)
    got = dict(zip(cc.doc_id, cc.cluster_id))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20,
                   21: 20}
    assert list(cc.doc_id) == sorted(cc.doc_id)


def test_connected_components_empty(ray_session):
    from vframe_ray.stages.graph import connected_components
    cc = connected_components(_pairs_ds([]))
    assert len(cc) == 0 and list(cc.columns) == ["doc_id", "cluster_id"]


def test_minhash_dedup_clusters_planted(ray_session):
    # three exact copies + one unrelated doc -> one 3-cluster, keep = min id
    from vframe_ray.stages.graph import minhash_dedup_clusters
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    t = pa.table({"doc_id": pa.array([7, 3, 9, 1], pa.int64()),
                  "text": [dup, dup, dup,
                           "one two three four five six seven eight"]})
    cc = minhash_dedup_clusters(ray.data.from_arrow(t), n=3)
    assert set(cc.doc_id) == {3, 7, 9}
    assert set(cc.cluster_id) == {3}
    assert dict(zip(cc.doc_id, cc.keep)) == {3: True, 7: False, 9: False}


def test_asof_join_ties_and_no_match(ray_session):
    from vframe_ray.stages.joins import asof_join
    ts = lambda s: pd.Timestamp(f"2024-01-01 00:00:{s:02d}")
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "lid": pa.array([100, 101, 102, 103], pa.int64()),
        "t": pa.array([ts(5), ts(10), ts(1), ts(5)], pa.timestamp("us")),
    }))
    # key 1: rows at t=5 (two tied rows -> max rid wins), t=10; key 2: none
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "rid": pa.array([200, 201, 202], pa.int64()),
        "t": pa.array([ts(5), ts(5), ts(8)], pa.timestamp("us")),
    }))
    out = asof_join(left, right, key="k", left_on="t", right_on="t",
                    left_cols=["lid", "k"], right_cols=["rid"],
                    tie_col="rid", prefix="m_").to_pandas()
    got = dict(zip(out.lid, out.m_rid))
    assert got == {100: 201,   # tie at equal ts -> larger rid (201)
                   101: 202,   # latest at-or-before t=10 is t=8
                   102: -1,    # t=1 precedes all right rows
                   103: -1}    # key 2 has no right rows
    assert out.lid.dtype == np.int64 and out.m_rid.dtype == np.int64


def test_grouped_topk_ties(ray_session):
    from vframe_ray.pipelines.relational import grouped_topk
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([5.0, 5.0, 3.0, 9.0, 9.0]),
                  "id": pa.array([12, 11, 10, 21, 20], pa.int64())})
    out = grouped_topk(ray.data.from_arrow(t), key="g", order_col="v",
                       k=2, tie_col="id").to_pandas()
    out = out.sort_values(["g", "rnk"]).reset_index(drop=True)
    # equal v -> smaller id ranks first
    assert list(out["id"]) == [11, 12, 20, 21]
    assert list(out["rnk"]) == [1, 2, 1, 2]


def test_stratified_sample_deterministic_and_pure(ray_session):
    from vframe_ray.stages.sampling import stratified_hash_sample
    t = pa.table({"doc_id": pa.array(range(1000), pa.int64()),
                  "lang": pa.array((["en", "de", "fr", "zh"] * 250))})
    kw = dict(strata_col="lang", id_col="doc_id",
              rates={"en": 0.5, "de": 0.25}, default_rate=0.1)
    a = stratified_hash_sample(ray.data.from_arrow(t), **kw).to_pandas()
    b = stratified_hash_sample(
        ray.data.from_arrow(t).repartition(7), **kw).to_pandas()
    # membership is a pure per-row function: identical under repartition
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    frac = a.lang.value_counts() / t.num_rows * 4
    assert 0.35 < frac["en"] < 0.65 and frac.get("zh", 0) < 0.2


def test_hash_join_mixed_types_and_one_sided_keys(ray_session):
    from vframe_ray.stages.joins import hash_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "lv": pa.array([1.5, 2.5, 3.5, 4.5]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 4], pa.int64()),
        "name": pa.array(["a", "b", "c", "d"]),
        "t": pa.array([pd.Timestamp("2024-01-01")] * 4, pa.timestamp("us")),
    }))
    out = hash_join(left, right, key="k", left_cols=["k", "lv"],
                    right_cols=["name", "t"])
    df = out.to_pandas().sort_values(["k", "lv", "name"]).reset_index(drop=True)
    # key 1: 2x1 rows; key 2: 1x2; keys 3 and 4 one-sided -> dropped
    assert list(df["k"]) == [1, 1, 2, 2]
    assert list(df["name"]) == ["a", "a", "b", "c"]
    assert df["k"].dtype == np.int64 and str(df["t"].dtype).startswith("datetime64")


def test_hash_join_post_fused_aggregate(ray_session):
    from vframe_ray.stages.joins import hash_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([10.0, 20.0, 5.0]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "w": pa.array([2.0, 4.0, 8.0]),
    }))

    def agg(j):
        # bucket-level contract: the frame may hold several keys; all
        # rows of a key are guaranteed to be in the same bucket
        if not len(j):
            return pd.DataFrame({"k": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        return (j.assign(s=j["v"] * j["w"])
                .groupby("k", as_index=False)["s"].sum())

    df = hash_join(left, right, key="k", left_cols=["k", "v"],
                   right_cols=["w"], post=agg).to_pandas()
    got = dict(zip(df.k, df.s))
    assert got == {1: 60.0, 2: 20.0}


def test_hopping_window_membership(ray_session):
    # one event at 00:07:30 -> windows starting 00:00 and 00:05 (600/300)
    from vframe_ray.stages.sessionize import hopping_window
    t = pa.table({"ts": pa.array([pd.Timestamp("2024-01-01 00:07:30")],
                                 pa.timestamp("us")),
                  "event_type": ["click"],
                  "value": pa.array([2.0])})
    df = hopping_window(ray.data.from_arrow(t), length_s=600, hop_s=300) \
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    assert list(df["window_start"].astype(str)) == [
        "2024-01-01 00:00:00", "2024-01-01 00:05:00"]
    assert list(df["n_events"]) == [1, 1]
    assert list(df["sum_value"]) == [2.0, 2.0]


def test_binned_quantiles_known_values(ray_session):
    from vframe_ray.stages.stats import binned_quantiles
    # values 1..100 for one key -> p50 = 50.0, p90 = 90.0, p99 = 99.0
    t = pa.table({"event_type": ["a"] * 100,
                  "value": pa.array([float(i) for i in range(1, 101)])})
    df = binned_quantiles(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("q").reset_index(drop=True)
    assert list(df["q"]) == [0.5, 0.9, 0.99]
    assert list(df["quantile"]) == pytest.approx([50.0, 90.0, 99.0])
    # partition-independent: same result on a repartitioned input
    df2 = binned_quantiles(ray.data.from_arrow(t).repartition(7)) \
        .to_pandas().sort_values("q").reset_index(drop=True)
    pd.testing.assert_frame_equal(df, df2)


def test_term_cooccurrence_vs_bruteforce(ray_session):
    """The vectorized i<j pair expansion must match itertools over
    distinct per-doc vocab terms, PMI included."""
    import math
    from itertools import combinations

    import numpy as np
    import ray.data

    from vframe_ray.stages.stats import term_cooccurrence
    from vframe_ray.stages.tokenize import tokenize

    rng = np.random.default_rng(7)
    words = ["w%d" % i for i in range(12)]
    rows = []
    for i in range(60):
        n = int(rng.integers(0, 9))
        text = " ".join(rng.choice(words, size=n)) if n else ""
        rows.append({"conv_id": f"c{i}", "turn_idx": 0, "text": text})
    vocab = words[:8]                      # restrict: scale guard path
    tokenized = tokenize(ray.data.from_items(rows))

    # brute force
    from vframe_ray.analyze import Tokenizer
    tok = Tokenizer()
    df: dict[str, int] = {}
    pair_n: dict[tuple, int] = {}
    for r in rows:
        ts = sorted(set(tok.tokenize(r["text"])) & set(vocab))
        for t in ts:
            df[t] = df.get(t, 0) + 1
        for a, b in combinations(ts, 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want_rows = sorted(
        (a, b, n, round(math.log(n * 60.0 / (df[a] * df[b])), 6))
        for (a, b), n in want)

    got = term_cooccurrence(tokenized, vocab, k=10, n_docs=60, df_map=df)
    got_rows = [tuple(r) for r in got.itertuples(index=False)]
    assert got_rows == want_rows


def test_significant_terms_vs_bruteforce(ray_session):
    """Bucketed fg/bg lift ranking must match a plain-Python oracle,
    incl. query-term exclusion and the rounded-lift tie rule."""
    import numpy as np
    import ray.data

    from vframe_ray.analyze import Tokenizer
    from vframe_ray.stages.stats import significant_terms
    from vframe_ray.stages.tokenize import tokenize

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = []
    for i in range(80):
        n = int(rng.integers(1, 7))
        rows.append({"conv_id": f"c{i}", "turn_idx": 0,
                     "text": " ".join(rng.choice(words, size=n))})
    tok = Tokenizer()
    queries = [{"query_id": 0, "terms": ["alpha"]},
               {"query_id": 1, "terms": ["beta", "zeta"]}]

    # brute force
    doc_terms = [set(tok.tokenize(r["text"])) for r in rows]
    n_bg = len(rows)
    bg = {}
    for ts in doc_terms:
        for t in ts:
            bg[t] = bg.get(t, 0) + 1
    want = []
    for q in queries:
        fg_docs = [ts for ts in doc_terms if ts & set(q["terms"])]
        n_fg = len(fg_docs)
        dfg = {}
        for ts in fg_docs:
            for t in ts - set(q["terms"]):
                dfg[t] = dfg.get(t, 0) + 1
        scored = [(q["query_id"], t, d,
                   round((d * n_bg) / (bg[t] * n_fg), 6))
                  for t, d in dfg.items()]
        scored.sort(key=lambda r: (-r[3], r[1]))
        want += sorted(scored[:3], key=lambda r: r[1])

    got = significant_terms(tokenize(ray.data.from_items(rows)), queries,
                            n_bg=n_bg, k=3)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_hybrid_rerank_by_embedding(ray_session, tmp_path):
    """Candidate re-rank must equal a brute-force cosine over the
    candidate set, read only the needed vectors, and respect k."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vframe_ray.stages.similarity import rerank_by_embedding

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    path = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}), path)

    cand = {0: np.array([5, 9, 17, 23, 31]), 1: np.array([2, 4, 6])}
    seeds = {0: 1, 1: 38}
    got = rerank_by_embedding(cand, path, seeds, k=3)

    def unit(v):
        v = v.astype(np.float64)
        return v / np.linalg.norm(v)

    for qid, ids in cand.items():
        sims = sorted(((float(unit(vecs[c]) @ unit(vecs[seeds[qid]])),
                        int(c)) for c in ids),
                      key=lambda sc: (-sc[0], sc[1]))[:3]
        sub = got[got["query_id"] == qid]
        assert list(sub["vec_id"]) == [c for _, c in sims]
        # gemv vs dot accumulate in different ULP order; the oracle
        # gate rounds to 6 decimals, so 1e-12 is far inside the margin
        assert np.allclose(sub["sim"].to_numpy(),
                           [s for s, _ in sims], rtol=0, atol=1e-12)


def test_range_join_vs_bruteforce(ray_session):
    """Banded range join must equal a brute-force interval scan:
    inclusive bounds, intervals spanning several bins, zero-length
    intervals, absent keys."""
    import numpy as np
    import pandas as pd
    import ray.data

    from vframe_ray.stages.joins import range_join

    rng = np.random.default_rng(5)
    lrows = [{"k": int(rng.integers(0, 6)), "t": int(rng.integers(0, 1000)),
              "event_id": i} for i in range(300)]
    rrows = []
    for i in range(60):
        lo = int(rng.integers(0, 950))
        rrows.append({"k": int(rng.integers(0, 8)), "lo": lo,
                      "hi": lo + int(rng.integers(0, 200)),  # 0-len ok
                      "win_id": i})
    left = ray.data.from_items(lrows).map_batches(
        lambda t: t.rename_columns(["k", "t", "event_id"]),
        batch_format="pyarrow")
    right = ray.data.from_items(rrows)
    out = range_join(left, right, key="k", left_on="t",
                     right_lo="lo", right_hi="hi", band=64,
                     left_cols=["event_id"], right_cols=["win_id"])
    got = sorted((r["event_id"], r["r_win_id"])
                 for r in out.to_pandas().to_dict("records"))
    want = sorted((l["event_id"], r["win_id"])
                  for l in lrows for r in rrows
                  if l["k"] == r["k"] and r["lo"] <= l["t"] <= r["hi"])
    assert got == want and len(want) > 100


def test_range_join_empty_intervals_match_nothing(ray_session):
    """hi < lo covers zero bins → no matches (inner-join semantics),
    not a negative-repeat ValueError inside a Ray task (ADVICE r3)."""
    import ray.data

    from vframe_ray.stages.joins import range_join

    left = ray.data.from_items(
        [{"k": 1, "t": 50, "event_id": 0}])
    right = ray.data.from_items(
        [{"k": 1, "lo": 100, "hi": 10, "win_id": 0},   # inverted
         {"k": 1, "lo": 40, "hi": 60, "win_id": 1}])   # valid
    out = range_join(left, right, key="k", left_on="t",
                     right_lo="lo", right_hi="hi", band=64,
                     left_cols=["event_id"], right_cols=["win_id"])
    rows = out.to_pandas().to_dict("records")
    assert [(r["event_id"], r["r_win_id"]) for r in rows] == [(0, 1)]


def test_cross_contamination_planted(ray_session):
    """A test doc copied verbatim into train must read 100%
    contaminated; a disjoint-vocab doc 0%; a half-overlapping doc in
    between — counts checked against a plain-Python shingle oracle."""
    import numpy as np
    import ray.data

    from vframe_ray.analyze import Tokenizer
    from vframe_ray.stages.dedup import cross_contamination
    from vframe_ray.stages.hashing import shingle_rows

    leak = "the quick brown fox jumps over the lazy dog again and again"
    half = "totally fresh words here quick brown fox jumps never seen"
    clean = "zz yy xx ww vv uu tt ss rr qq"
    test_rows = [{"doc_id": 0, "text": leak},
                 {"doc_id": 5, "text": half},
                 {"doc_id": 10, "text": clean}]
    train_rows = [{"doc_id": 1, "text": leak},
                  {"doc_id": 2, "text": "quick brown fox jumps plus other"
                                        " stuff making more shingles"}]
    got = cross_contamination(ray.data.from_items(test_rows),
                              ray.data.from_items(train_rows), n=3)

    tok = Tokenizer()
    def shset(text):
        import pyarrow as pa
        p, s, _ = shingle_rows(tok, pa.array([text]), 3)
        return set(s.to_pylist())
    train_sh = shset(train_rows[0]["text"]) | shset(train_rows[1]["text"])
    for r in test_rows:
        mine = shset(r["text"])
        row = got[got["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_shingles"] == len(mine)
        assert row["n_shared"] == len(mine & train_sh)
    by_id = got.set_index("doc_id")["contamination_r"]
    assert by_id[0] == 1.0 and by_id[10] == 0.0 and 0 < by_id[5] < 1
