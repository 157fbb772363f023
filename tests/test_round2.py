"""Round-2 features: distributed phrase path, OR/NOT predicate DSL,
hot-shingle markers, MinHash star fallback, embedding near-dedup,
attribute-aware resume fingerprints, stale-segment cleanup, header probe."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index, load_index_meta
from vframe_ray.index.query import (QueryService, phrase_search_index,
                                    search_index, validate_predicates)


# --------------------------------------------------------------- phrase

def _corpus_phrases(small_corpus_dir, n=4):
    """A few 2-token phrases that actually occur in the corpus."""
    t = pq.ParquetDataset(small_corpus_dir).read(columns=["text"])
    from vframe_ray.analyze import Tokenizer
    tok = Tokenizer()
    phrases = []
    for txt in t["text"].to_pylist():
        ts = tok.tokenize(txt)
        if len(ts) >= 2:
            phrases.append(f"{ts[0]} {ts[1]}")
        if len(phrases) >= n:
            break
    return phrases


def test_phrase_distributed_vs_oracle(ray_session, small_index_dir,
                                      small_oracle, small_corpus_dir):
    from vframe_ray.analyze import Tokenizer
    tok = Tokenizer()
    phrases = _corpus_phrases(small_corpus_dir) + ["zzz qqq"]
    res = phrase_search_index(
        small_index_dir,
        [{"query_id": i, "phrase": p} for i, p in enumerate(phrases)])
    got: dict[int, set] = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], set()).add(
            (r["conv_id"], r["turn_idx"]))
    for i, p in enumerate(phrases):
        want = {small_oracle.doc_keys[d]
                for d in small_oracle.phrase_candidates(tok.tokenize(p))}
        assert got.get(i, set()) == want, (p, got.get(i), want)
    assert got.get(len(phrases) - 1, set()) == set()     # absent phrase


def test_phrase_query_service(ray_session, small_index_dir,
                              small_corpus_dir):
    phrases = _corpus_phrases(small_corpus_dir, n=2)
    want = phrase_search_index(
        small_index_dir,
        [{"query_id": i, "phrase": p} for i, p in enumerate(phrases)])
    svc = QueryService(small_index_dir, n_actors=2)
    try:
        got = svc.search_phrases(
            [{"query_id": i, "phrase": p} for i, p in enumerate(phrases)])
        assert got.to_pylist() == want.to_pylist()
    finally:
        svc.shutdown()


# ---------------------------------------------------------- predicates

def test_predicate_or_not(ray_session, small_index_dir, small_corpus_dir,
                          small_oracle):
    from vframe_ray.corpus import generate_queries
    # rebuild a tiny attr index? reuse: small_index_dir has no attrs ->
    # validate unknown-column error first
    with pytest.raises(ValueError, match="unknown attribute column"):
        validate_predicates(small_index_dir, ["role == user"])
    with pytest.raises(ValueError, match="unknown attribute column"):
        search_index(small_index_dir, generate_queries(n_terms=800)[:1],
                     predicates=["nosuchcol == 1"])


def test_predicate_dsl_or_not_masks(ray_session):
    from vframe_ray.sources.readers import compile_mask, compile_predicate
    t = pa.table({"role": ["user", "assistant", "system", "tool"],
                  "turn_idx": [0, 1, 2, 3]})
    m = compile_mask(["role == user or role == tool"])(t)
    assert m.tolist() == [True, False, False, True]
    m = compile_mask(["not role == system"])(t)
    assert m.tolist() == [True, True, False, True]
    m = compile_mask(["role == user or role == tool", "turn_idx >= 3"])(t)
    assert m.tolist() == [False, False, False, True]     # ANDed elements
    m = compile_mask(["role == user"], keep=False)(t)    # --keep invert
    assert m.tolist() == [False, True, True, True]
    with pytest.raises(ValueError, match="unknown column"):
        compile_mask(["ghost == 1"])(t)
    # scan-time expression compiles for the same grammar
    assert compile_predicate("role == user or not turn_idx >= 2") is not None


def test_or_predicate_filtered_search(ray_session, small_corpus_dir,
                                      tmp_path):
    """OR-composed predicate at query time vs oracle with the same
    predicate (reference skip-detections OR semantics)."""
    from vframe_ray.corpus import generate_queries
    from vframe_ray.oracle import OracleIndex

    src = pq.ParquetDataset(small_corpus_dir).read(
        columns=["conv_id", "turn_idx", "text", "role"])
    rows = [(c, t, x, {"role": r}) for c, t, x, r in
            zip(src["conv_id"].to_pylist(), src["turn_idx"].to_pylist(),
                src["text"].to_pylist(), src["role"].to_pylist())]
    oracle = OracleIndex(rows, SMALL_CFG)

    idx = str(tmp_path / "or_idx")
    ds = ray.data.read_parquet(small_corpus_dir,
                               columns=["conv_id", "turn_idx", "text",
                                        "role"])
    build_index(ds, idx, SMALL_CFG, attribute_cols=["role"])
    queries = generate_queries(n_terms=800)[:5]
    res = search_index(idx, queries,
                       predicates=["role == assistant or role == tool"])
    got: dict[int, list] = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], []).append(
            (r["conv_id"], r["turn_idx"], round(r["score"], 9)))
    for q in queries:
        want = [(h.conv_id, h.turn_idx, round(h.score, 9))
                for h in oracle.search(
                    q["query_text"], k=q["k"],
                    predicate=lambda a: a["role"] in ("assistant", "tool"))]
        assert got.get(q["query_id"], []) == want, q


# ------------------------------------------------------ dedup features

def test_jaccard_hot_shingle_not_silent(ray_session):
    """A boilerplate shingle above max_df is excluded from intersections
    but the true near-dup pair (sharing rare shingles too) is still
    found."""
    from vframe_ray.stages.dedup import jaccard_pairs
    texts = [f"boiler plate text unique{i} word{i} extra{i}"
             for i in range(6)]
    texts[5] = texts[4]                      # true dup pair (4, 5)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts)}))
    out = jaccard_pairs(ds, n=3, threshold=0.5, max_df=2).to_pandas()
    pairs = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
    assert (4, 5) in pairs
    # no marker rows leak into the result
    assert (out.id_a >= 0).all()


def test_minhash_star_fallback(ray_session):
    """Buckets above max_bucket emit star pairs (min id <-> others):
    connectivity preserved, no n^2 blowup, nothing silently dropped."""
    from vframe_ray.stages.dedup import minhash_candidates
    texts = ["all these documents share exactly the same words"] * 8
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(texts)}))
    out = minhash_candidates(ds, max_bucket=4).to_pandas()
    pairs = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
    assert pairs == {(0, i) for i in range(1, 8)}        # star around 0


def test_near_dedup_embeddings_planted(ray_session):
    from vframe_ray.stages.dedup import near_dedup_embeddings
    rng = np.random.default_rng(7)
    M = rng.standard_normal((6, 16))
    M[1] = M[0] + 0.001 * rng.standard_normal(16)   # near-dup of prev kept
    M[3] = M[2]                                     # exact dup of prev kept
    tbl = pa.table({
        "conv_id": pa.array(["a"] * 4 + ["b"] * 2),
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
        "embedding": pa.array(M.tolist(), pa.list_(pa.float64()))})
    out = near_dedup_embeddings(ray.data.from_arrow(tbl),
                                threshold=0.95).to_pandas()
    kept = sorted(zip(out.conv_id, out.turn_idx))
    assert kept == [("a", 0), ("a", 2), ("b", 0), ("b", 1)]


# ------------------------------------------------- resume / lineage

def test_attribute_change_invalidates_resume(ray_session, tmp_path):
    """Same text, changed attribute values -> segment must REBUILD, not
    resume (ADVICE.md: stale docmap attributes broke predicate search)."""
    idx = str(tmp_path / "attr_resume")

    def make(role):
        return pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(50)]),
            "turn_idx": pa.array([0] * 50, pa.int32()),
            "text": pa.array([f"tok{i} alpha beta" for i in range(50)]),
            "role": pa.array([role] * 50)})

    build_index(ray.data.from_arrow(make("user")), idx, SMALL_CFG,
                attribute_cols=["role"])
    r1 = search_index(idx, [{"query_id": 0, "query_text": "alpha", "k": 5}],
                      predicates=["role == user"])
    assert r1.num_rows == 5
    # rebuild with every role flipped; text identical
    build_index(ray.data.from_arrow(make("tool")), idx, SMALL_CFG,
                attribute_cols=["role"])
    r2 = search_index(idx, [{"query_id": 0, "query_text": "alpha", "k": 5}],
                      predicates=["role == user"])
    assert r2.num_rows == 0                    # stale attrs would return 5
    r3 = search_index(idx, [{"query_id": 0, "query_text": "alpha", "k": 5}],
                      predicates=["role == tool"])
    assert r3.num_rows == 5


def test_stale_segment_removed(ray_session, tmp_path):
    """Rebuilding over input that leaves a segment id empty deletes the
    stale segment instead of folding it into the manifest (ADVICE.md)."""
    from vframe_ray.stages.tokenize import assign_segment_ids
    idx = str(tmp_path / "stale_seg")
    # craft conv ids per segment (num_segments=2)
    ids0, ids1 = [], []
    i = 0
    while len(ids0) < 20 or len(ids1) < 20:
        cid = f"conv{i}"
        seg = int(assign_segment_ids(pa.array([cid]), 2)[0])
        (ids0 if seg == 0 else ids1).append(cid)
        i += 1
    ids0, ids1 = ids0[:20], ids1[:20]

    def tbl(ids):
        return pa.table({
            "conv_id": pa.array(ids),
            "turn_idx": pa.array([0] * len(ids), pa.int32()),
            "text": pa.array([f"word{j} gamma" for j in range(len(ids))])})

    from vframe_ray.config import EngineConfig, IndexConfig
    cfg = EngineConfig(index=IndexConfig(num_segments=2))
    build_index(ray.data.from_arrow(tbl(ids0 + ids1)), idx, cfg)
    _, stats, segs = load_index_meta(idx)
    assert stats["n_docs"] == 40 and len(segs) == 2
    # second build: only segment-0 convs -> seg-00001 is stale
    build_index(ray.data.from_arrow(tbl(ids0)), idx, cfg)
    _, stats2, segs2 = load_index_meta(idx)
    assert stats2["n_docs"] == 20
    assert [os.path.basename(s) for s in segs2] == ["seg-00000"]
    assert not os.path.exists(os.path.join(idx, "segments", "seg-00001"))


# ------------------------------------------------------- media probe

def test_header_probe_poison_rows(ray_session):
    from vframe_ray.stages.multimodal import media_header_probe
    t = pa.table({
        "media_id": pa.array(["a", "b", "c"]),
        "payload": pa.array([b"hello", b"", b"x" * 100], pa.binary())})
    out = media_header_probe(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert out.loc[0, "nbytes"] == 5
    assert out.loc[0, "width"] == 1 + (5 * 7) % 640
    assert out.loc[1, "error"] == "empty payload"
    assert np.isnan(out.loc[1, "width"])
    assert out.loc[2, "height"] == 1 + (100 * 13) % 480


# -------------------------------------------- registry / sinks / snippets

def test_registry_builtins_and_plugins(tmp_path):
    from vframe_ray import registry
    assert "langid" in registry.available()
    assert callable(registry.get("minhash_candidates"))
    with pytest.raises(KeyError, match="unknown stage"):
        registry.get("nope")
    # plugin dir: a module that registers a stage on import
    plug = tmp_path / "plugins"
    plug.mkdir()
    (plug / "myplug.py").write_text(
        "from vframe_ray.registry import register\n"
        "@register('my_custom_stage')\n"
        "def my_custom_stage(ds):\n"
        "    return ds\n")
    loaded = registry.load_plugins([str(plug)])
    assert loaded and "my_custom_stage" in registry.available()


def test_cli_stages_lists(capsys):
    from vframe_ray.__main__ import main
    assert main(["stages"]) == 0
    out = capsys.readouterr().out
    assert '"stage": "langid"' in out


def test_save_files_modes(ray_session, tmp_path):
    from vframe_ray.stages.sinks import save_files
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    files = []
    for i in range(3):
        f = src_dir / f"f{i}.txt"
        f.write_text(f"content {i}")
        files.append(str(f))
    files.append(str(src_dir / "missing.txt"))        # poison row
    ds = ray.data.from_arrow(pa.table({"filepath": pa.array(files)}))
    out = save_files(ds, str(tmp_path / "out"), mode="copy").to_pandas()
    ok = out[out["error"].isna()]
    assert len(ok) == 3
    for p in ok["saved_path"]:
        assert os.path.exists(p)
    assert len(out[out["error"].notna()]) == 1
    # symlink mode
    out2 = save_files(ds.filter(lambda r: "missing" not in r["filepath"]),
                      str(tmp_path / "ln"), mode="symlink").to_pandas()
    assert all(os.path.islink(p) for p in out2["saved_path"])


def test_snippet_highlight(ray_session):
    from vframe_ray.stages.snippets import highlight_hits
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["spark and window functions",
                          "nothing relevant", "window window"])})
    hits = pa.table({"doc_id": pa.array([0, 2], pa.int64()),
                     "rank": pa.array([1, 2], pa.int32())})
    out = highlight_hits(ray.data.from_arrow(docs), hits,
                         ["spark", "window"]).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "snippet"] == "«spark» and «window» functions"
    assert out.loc[1, "snippet"] == "«window» «window»"


def test_snippet_highlight_mixed_case(ray_session):
    """Highlight semantics follow the analyzer (lowercase-then-split):
    capitalized surface occurrences ARE hits and get marked; a single
    camelCase token is NOT a phrase occurrence (ADVICE r3)."""
    from vframe_ray.stages.snippets import (highlight_hits,
                                            phrase_highlight_pattern)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["Alpha Beta starts it", "alphaXbeta is one token",
                          "mid ALPHA, beta end"])})
    hits = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "rank": pa.array([1, 2, 3], pa.int32())})
    pat = phrase_highlight_pattern(["alpha", "beta"])
    out = highlight_hits(ray.data.from_arrow(docs), hits,
                         ["alpha", "beta"], pattern=pat).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert out.loc[0, "snippet"] == "«Alpha Beta» starts it"
    assert out.loc[1, "snippet"] == "alphaXbeta is one token"
    assert out.loc[2, "snippet"] == "mid «ALPHA, beta» end"


def test_winnow_fingerprints_scalar_oracle(ray_session):
    """Vectorized winnowing vs a brute-force scalar implementation of the
    SIGMOD'03 scheme (min per window, rightmost tie; short docs pick
    their global min) + the coverage guarantee on a planted shared run."""
    import hashlib
    from vframe_ray.analyze import Tokenizer
    from vframe_ray.stages.textquality import winnow_fingerprints

    k, w = 3, 4
    tok = Tokenizer()
    texts = ["the quick brown fox jumps over the lazy dog again and again",
             "tiny doc",                    # 0 grams (2 tokens < k)
             "one two three",               # exactly 1 gram
             "one two three four five",     # 3 grams < w
             "",                            # empty
             "a shared long run of tokens appears here exactly the same "
             "way with more words after",
             "prefix junk then a shared long run of tokens appears here "
             "exactly the same way tail"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = winnow_fingerprints(ds, k=k, w=w).to_pandas()
    got = {}
    for r in out.itertuples():
        got.setdefault(int(r.doc_id), set()).add((int(r.pos), int(r.fp)))

    def gh(toks, i):
        s = " ".join(toks[i:i + k])
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
        return np.uint64(v).astype(np.int64)

    for d, t in enumerate(texts):
        toks = tok.tokenize(t)
        hs = [gh(toks, i) for i in range(max(0, len(toks) - k + 1))]
        want = set()
        if hs:
            if len(hs) < w:
                m = min(np.uint64(x).astype(np.uint64) for x in
                        [np.uint64(h) for h in hs])
            windows = [range(j, min(j + w, len(hs)))
                       for j in range(max(1, len(hs) - w + 1))]
            for win in windows:
                uh = [np.uint64(hs[p]) for p in win]
                mn = min(uh)
                p = max(p for p in win if np.uint64(hs[p]) == mn)
                want.add((p, int(hs[p])))
        assert got.get(d, set()) == want, (d, got.get(d), want)

    # guarantee: docs 5 and 6 share a >= w+k-1 token run -> share a hash
    fps5 = {fp for _, fp in got[5]}
    fps6 = {fp for _, fp in got[6]}
    assert fps5 & fps6
