"""Round-5 third stats wave: grouped OLS/correlation, source token TV
drift, and exact distributed percentiles — brute-force oracles,
repartition invariance, and the degenerate edges (zero x-variance,
single-value corpora, boundary ranks p=0/p=1, duplicate-heavy bins)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


# ------------------------------------------------------------- linregress

def test_linregress_vs_numpy_polyfit(ray_session):
    from vframe_ray.stages.stats import grouped_linregress
    rng = np.random.default_rng(17)
    n = 3000
    g = rng.choice(["a", "b", "c"], n)
    x = rng.integers(1, 50, n).astype(np.int64)
    noise = rng.integers(-500, 500, n)
    y = (x * 137 + 1000 + noise).astype(np.int64)
    t = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y)})
    for parts in (1, 8):
        got = grouped_linregress(
            ray.data.from_arrow(t).repartition(parts),
            group_cols=("g",), x_col="x", y_col="y")
        for _, row in got.iterrows():
            m = g == row["g"]
            slope, icept = np.polyfit(x[m].astype(float),
                                      y[m].astype(float), 1)
            corr = np.corrcoef(x[m].astype(float),
                               y[m].astype(float))[0, 1]
            assert abs(row["slope"] - slope) < 1e-6 * abs(slope)
            assert abs(row["icept"] - icept) < 1e-5 * max(abs(icept), 1)
            assert abs(row["corr"] - corr) < 1e-9
            assert row["n"] == int(m.sum())


def test_linregress_zero_variance_group(ray_session):
    """All-equal x -> den == 0 -> NaN slope/icept/corr, n still right."""
    from vframe_ray.stages.stats import grouped_linregress
    t = pa.table({"g": pa.array(["z"] * 4),
                  "x": pa.array([7, 7, 7, 7], pa.int64()),
                  "y": pa.array([1, 2, 3, 4], pa.int64())})
    got = grouped_linregress(ray.data.from_arrow(t), group_cols=("g",),
                             x_col="x", y_col="y")
    assert got["n"].iloc[0] == 4
    assert np.isnan(got["slope"].iloc[0])
    assert np.isnan(got["corr"].iloc[0])


def test_linregress_hi_lo_split_exact(ray_session):
    """y large enough that a naive int64 sum of y^2 would overflow a
    block: the hi/lo carry must reassemble Σy² exactly (checked against
    Python-int arithmetic)."""
    from vframe_ray.stages.stats import grouped_linregress
    rng = np.random.default_rng(23)
    n = 500
    x = rng.integers(1, 100, n).astype(np.int64)
    y = rng.integers(10**6, 10**7, n).astype(np.int64)   # y² ~ 1e14
    t = pa.table({"g": pa.array(["g"] * n), "x": pa.array(x),
                  "y": pa.array(y)})
    got = grouped_linregress(ray.data.from_arrow(t).repartition(4),
                             group_cols=("g",), x_col="x", y_col="y")
    # exact-int reference chain, identical float order
    N, sx, sy = n, int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    syy = sum(int(v) * int(v) for v in y)
    shi, slo = syy >> 32, syy & 0xFFFFFFFF
    nf, sxf, syf = float(N), float(sx), float(sy)
    num = nf * float(sxy) - sxf * syf
    den = nf * float(sxx) - sxf * sxf
    syyf = float(shi) * 4294967296.0 + float(slo)
    want_slope = num / den
    want_corr = num / (np.sqrt(den) * np.sqrt(nf * syyf - syf * syf))
    assert got["slope"].iloc[0] == want_slope
    assert got["corr"].iloc[0] == want_corr


# ----------------------------------------------------------------- drift

def _brute_tv(df):
    from collections import Counter
    toks = {}
    for s, sub in df.groupby("source"):
        c = Counter()
        for txt in sub["text"]:
            c.update([w for w in
                      "".join(ch if ch.isalnum() else " "
                              for ch in txt.lower()).split() if w])
        toks[s] = c
    total = Counter()
    for c in toks.values():
        total.update(c)
    N = sum(total.values())
    rows = []
    for s in sorted(toks):
        cs, ns = toks[s], sum(toks[s].values())
        num = 0
        for t in total:
            num += abs(cs.get(t, 0) * (N - ns)
                       - (total[t] - cs.get(t, 0)) * ns)
        rows.append((s, ns, num / float(2 * ns * (N - ns))))
    return pd.DataFrame(rows, columns=["source", "n_tokens", "tv"])


def test_source_drift_vs_brute_and_invariance(ray_session):
    from vframe_ray.stages.textquality import source_token_drift
    rng = np.random.default_rng(31)
    vocab_a = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["omega", "psi", "beta"]
    texts, srcs = [], []
    for i in range(120):
        s = "skewed" if i % 3 == 0 else f"plain{i % 2}"
        v = vocab_b if s == "skewed" else vocab_a
        texts.append(" ".join(rng.choice(v, 12)))
        srcs.append(s)
    t = pa.table({"source": pa.array(srcs), "text": pa.array(texts)})
    want = _brute_tv(t.to_pandas())
    for parts in (1, 6):
        got = source_token_drift(
            ray.data.from_arrow(t).repartition(parts))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted divergent source must have the largest drift
    assert got.loc[got["tv"].idxmax(), "source"] == "skewed"


def test_source_drift_identical_sources_near_zero(ray_session):
    """Sources with identical token multisets have TV exactly 0."""
    from vframe_ray.stages.textquality import source_token_drift
    t = pa.table({"source": pa.array(["a", "b", "a", "b"]),
                  "text": pa.array(["x y z", "x y z",
                                    "w w q", "w w q"])})
    got = source_token_drift(ray.data.from_arrow(t))
    assert (got["tv"] == 0.0).all()


# ------------------------------------------------------------ percentiles

def test_exact_percentiles_vs_sort(ray_session):
    from vframe_ray.stages.selection import exact_percentiles
    rng = np.random.default_rng(41)
    v = rng.integers(-10000, 10**7, 20000).astype(np.int64)
    # heavy duplicate spike: one value holds 30% of the mass
    v[:6000] = 424242
    t = pa.table({"v": pa.array(v)})
    pcts = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    sv = np.sort(v)
    for parts in (1, 8):
        got = exact_percentiles(
            ray.data.from_arrow(t).repartition(parts),
            value_col="v", pcts=pcts, bins=64)
        for _, r in got.iterrows():
            k = int(np.floor(r["pct"] * (len(v) - 1))) + 1
            assert r["rank"] == k
            assert r["val"] == sv[k - 1], r["pct"]


def test_exact_percentiles_single_value_and_tiny(ray_session):
    from vframe_ray.stages.selection import exact_percentiles
    t = pa.table({"v": pa.array([5, 5, 5], type=pa.int64())})
    got = exact_percentiles(ray.data.from_arrow(t), value_col="v",
                            pcts=(0.5,))
    assert list(got["val"]) == [5]
    t1 = pa.table({"v": pa.array([9], type=pa.int64())})
    got1 = exact_percentiles(ray.data.from_arrow(t1), value_col="v",
                             pcts=(0.0, 1.0))
    assert list(got1["val"]) == [9, 9]


# ---------------------------------------------------------------- profile

def test_profile_table_with_nulls_and_doubles(ray_session):
    """Exact n / n_null / n_distinct per column, nulls excluded from
    distinct, near-identical doubles kept distinct (injective string
    cast), repartition invariance."""
    from vframe_ray.stages.stats import profile_table
    v = pa.array([1.0, 1.0000000000000002, 2.5, None, 2.5],
                 pa.float64())
    s = pa.array(["a", None, "a", "b", None], pa.string())
    i = pa.array([7, 7, 7, 7, 7], pa.int64())
    t = pa.table({"v": v, "s": s, "i": i})
    want = pd.DataFrame({"col": ["i", "s", "v"],
                         "n": [5, 5, 5],
                         "n_null": [0, 2, 1],
                         "n_distinct": [1, 2, 3]})
    for parts in (1, 3):
        got = profile_table(ray.data.from_arrow(t).repartition(parts),
                            columns=["v", "s", "i"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------------- grouped quantile

def test_grouped_exact_quantile_vs_sort(ray_session):
    from vframe_ray.stages.selection import grouped_exact_quantile
    rng = np.random.default_rng(53)
    n = 8000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.integers(-5000, 10**6, n).astype(np.int64)
    # group 'd': constant values (span 1, single bin)
    g = np.r_[g, np.repeat("d", 7)]
    v = np.r_[v, np.full(7, 123, np.int64)]
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    for parts in (1, 6):
        got = grouped_exact_quantile(
            ray.data.from_arrow(t).repartition(parts),
            group_col="g", value_col="v", p=0.9, bins=32)
        for _, r in got.iterrows():
            sv = np.sort(v[g == r["g"]])
            k = int(np.floor(0.9 * (len(sv) - 1))) + 1
            assert r["rank"] == k
            assert r["n"] == len(sv)
            assert r["qval"] == sv[k - 1], r["g"]
    assert got.loc[got["g"] == "d", "qval"].iloc[0] == 123


# --------------------------------------------------------- quantize audit

def test_quantize_audit_brute_and_zero_vector(ray_session):
    from vframe_ray.stages.similarity import quantize_embeddings_audit
    rng = np.random.default_rng(61)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    vecs[7] = 0.0                                  # all-zero vector
    t = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    got = quantize_embeddings_audit(
        ray.data.from_arrow(t).repartition(4)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    x = vecs.astype(np.float64)
    maxabs = np.abs(x).max(axis=1)
    safe = np.where(maxabs > 0, maxabs, 1.0)
    codes = np.floor(x * 127.0 / safe[:, None] + 0.5)
    codes[maxabs == 0] = 0.0
    assert np.array_equal(got["max_code"], codes.max(axis=1))
    assert np.array_equal(got["min_code"], codes.min(axis=1))
    assert np.array_equal(got["n_zero"], (codes == 0).sum(axis=1))
    row7 = got[got["vec_id"] == 7].iloc[0]
    assert row7["n_zero"] == 8 and row7["scale_r"] == 0.0
    # symmetric scheme: extreme codes stay inside [-127, 127]
    assert got["max_code"].max() <= 127
    assert got["min_code"].min() >= -127


def test_farthest_point_sample_brute_and_invariance(ray_session):
    """Greedy k-center vs a scalar oracle on quantized codes; the seed
    is the min id; selections never repeat; repartition-invariant."""
    from vframe_ray.stages.similarity import farthest_point_sample
    rng = np.random.default_rng(67)
    vecs = rng.normal(size=(60, 6)).astype(np.float32)
    ids = (rng.permutation(60) + 10).astype(np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    # scalar oracle
    x = vecs.astype(np.float64)
    maxabs = np.abs(x).max(axis=1)
    codes = np.floor(x * 127.0 / maxabs[:, None] + 0.5).astype(np.int64)
    order = np.argsort(ids)
    sid, sc = ids[order], codes[order]
    sel = [int(sid[0])]
    want = [(1, sel[0], 0)]
    for step in range(2, 6):
        dmin = np.full(len(sid), 2**62, np.int64)
        for s in sel:
            d = ((sc - sc[sid == s][0]) ** 2).sum(axis=1)
            dmin = np.minimum(dmin, d)
        dmin[np.isin(sid, sel)] = -1
        j = np.lexsort((sid, -dmin))[0]
        sel.append(int(sid[j]))
        want.append((step, int(sid[j]), int(dmin[j])))
    for parts in (1, 5):
        got = farthest_point_sample(
            ray.data.from_arrow(t).repartition(parts), k=5)
        assert [tuple(r) for r in got.to_numpy()] == want
    assert len(set(got["id"])) == 5


def test_facet_top_terms_brute_and_ties(ray_session):
    from vframe_ray.stages.textquality import facet_top_terms
    t = pa.table({"source": pa.array(["a"] * 3 + ["b"] * 2),
                  "text": pa.array(["x x y z", "y y", "z",
                                    "q q p p", "p"])})
    # a: x=2 y=3... wait: a texts: 'x x y z','y y','z' -> x2 y3 z2
    got = facet_top_terms(ray.data.from_arrow(t).repartition(2), k=2)
    a = got[got["source"] == "a"]
    assert list(a["term"]) == ["y", "x"]      # y3, then tie x2/z2 -> x
    assert list(a["n"]) == [3, 2]
    b = got[got["source"] == "b"]
    assert list(b["term"]) == ["p", "q"]      # p3 > q2
    assert list(b["rnk"]) == [1, 2]


def test_vocab_growth_monotone_and_exact(ray_session):
    # 100 docs, doc i introduces term f"new{i}" plus shared filler —
    # vocabulary grows by exactly 1 per doc after the first, so the
    # curve is fully predictable at every decile checkpoint.
    import numpy as np
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.stats import vocab_growth
    texts = [f"shared filler words new{i}" for i in range(100)]
    tbl = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                    "text": pa.array(texts)})
    # shuffled row order: first-seen must come from doc_id, not input order
    perm = np.random.default_rng(7).permutation(100)
    ds = ray.data.from_arrow(tbl.take(perm)).repartition(5)
    out = vocab_growth(ds, n_checkpoints=10)
    assert list(out["n_docs"]) == [10 * i for i in range(1, 11)]
    # 3 shared terms + one new term per doc seen so far
    assert list(out["vocab"]) == [3 + 10 * i for i in range(1, 11)]


def test_char_entropy_byte_definition(ray_session):
    # closed-form cases incl. a non-ASCII doc: entropy is over UTF-8
    # BYTES ('é' = 2 bytes), empty doc scores 0
    import math
    import numpy as np
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.textquality import char_entropy
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["aaaa", "ab", "", "ééé"]),
    })
    out = char_entropy(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_bytes"]) == [4, 2, 0, 6]
    assert out["entropy"][0] == 0.0                     # one symbol
    assert out["entropy"][1] == round(math.log(2), 6)   # two equal
    assert out["entropy"][2] == 0.0                     # empty
    # 'ééé' = bytes c3 a9 ×3 → two symbols, 3 each, n=6: H = ln 2
    assert out["entropy"][3] == round(math.log(2), 6)


def test_bigram_pmi_favors_fixed_phrase(ray_session):
    # "san jose" always adjacent; "the" pairs with everything — PMI must
    # rank the fixed phrase first even though "the X" bigrams are more
    # frequent.  Counts verified against a scalar oracle.
    import math
    import numpy as np
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.stats import bigram_pmi
    from vframe_ray.stages.tokenize import tokenize
    docs = (["san jose is the best city in the world"] * 6
            + ["the city the world the best the san"] * 6)
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(docs))]),
        "turn_idx": pa.array(np.zeros(len(docs), np.int32)),
        "text": pa.array(docs),
    })
    out = bigram_pmi(tokenize(ray.data.from_arrow(tbl)),
                     k=5, min_count=5)
    # scalar oracle: full PMI table, same rounding and tie-break
    toks = [d.split() for d in docs]
    bgs = [(a, b) for t in toks for a, b in zip(t, t[1:])]
    T = len(bgs)
    from collections import Counter
    cnt = Counter(bgs)
    na = Counter(a for a, _ in bgs)
    nc = Counter(b for _, b in bgs)
    want = sorted(
        ((round(math.log(n * T / (na[a] * nc[b])), 6), a, b, n)
         for (a, b), n in cnt.items() if n >= 5),
        key=lambda r: (-r[0], r[1], r[2]))[:5]
    got = [(r.pmi_r, r.term_a, r.term_b, r.n_pair)
           for r in out.itertuples()]
    assert got == want
    # the always-adjacent phrase pairs outrank every "the X" pair
    assert ("san", "jose") in {(a, b) for _, a, b, _ in want}
    assert all(a != "the" for _, a, _, _ in want)


def test_term_burstiness_scalar_oracle(ray_session):
    # planted: "bursty" appears 9x in one doc only; "flat" once in
    # every doc — same cf, VMR must separate them (bursty >> flat)
    import numpy as np
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.stats import term_burstiness
    from vframe_ray.stages.tokenize import tokenize
    n = 9
    texts = ["flat " + ("bursty " * n).strip()] + ["flat"] * (n - 1)
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(np.zeros(n, np.int32)),
        "text": pa.array(texts)})
    out = term_burstiness(tokenize(
        ray.data.from_arrow(tbl).repartition(3)), n, k=5) \
        .set_index("term")
    assert out.loc["bursty", "cf"] == n and out.loc["flat", "cf"] == n
    assert out.loc["bursty", "sum_sq"] == n * n
    assert out.loc["flat", "sum_sq"] == n
    # scalar VMR: mean=1 for both; flat var=0, bursty var=(n²/n - 1)
    assert out.loc["flat", "vmr_r"] == 0.0
    assert out.loc["bursty", "vmr_r"] == round(float(n) - 1.0, 6)


def test_zipf_fit_recovers_planted_exponent(ray_session):
    # plant cf(r) = round(C / r^0.8): the OLS on ln-ln must recover
    # alpha ~ 0.8; verified against numpy.polyfit on the same points
    import numpy as np
    import pyarrow as pa
    import ray.data
    from vframe_ray.stages.stats import zipf_fit
    from vframe_ray.stages.tokenize import tokenize
    rng = np.random.default_rng(13)
    V, C = 40, 5000
    counts = np.maximum(1, np.round(
        C / np.arange(1, V + 1) ** 0.8)).astype(int)
    texts = []
    for i, c in enumerate(counts):
        toks = [f"t{i:03d}"] * int(c)
        texts.append(" ".join(toks))
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(V)]),
        "turn_idx": pa.array(np.zeros(V, np.int32)),
        "text": pa.array(texts)})
    out = zipf_fit(tokenize(ray.data.from_arrow(tbl).repartition(4)),
                   top_v=V)
    assert int(out["n_terms"][0]) == V
    x = np.log(np.arange(1, V + 1))
    y = np.log(counts.astype(float))
    slope, icept = np.polyfit(x, y, 1)
    assert abs(out["alpha_r"][0] - (-slope)) < 1e-6
    assert abs(out["intercept_r"][0] - icept) < 1e-6
    assert 0.75 < out["alpha_r"][0] < 0.85
