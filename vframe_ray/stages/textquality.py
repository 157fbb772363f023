"""Text analysis stages: token counting, quality scoring, language-ID,
document fingerprinting.

These are the textual analog of the reference's attribute-extraction
trio (reference: src/commands/utils/media-attrs.py → media-attrs-filter
→ media-attrs-summarize — per-file header attributes, filter chain,
global stats): flat per-doc feature columns computed in a vectorized
``map_batches``, filterable by the predicate DSL, aggregable.

Every stage is fully vectorized — tokens are flattened once per batch
with Arrow kernels and reduced per-row with numpy ``reduceat``/
``bincount``; md5 hashing runs once per *unique* token (stages/
hashing.py).  No per-row or per-token Python loops anywhere.

Every feature (including the fingerprint and simhash definitions) is
deliberately SQL-expressible so the DuckDB oracle can validate it
value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analyze import Tokenizer
from .hashing import dict_hash_u64, flat_tokens, segment_reduce

# Tiny per-language stopword lists for the stopword-hit heuristic
# language-ID.  Deterministic; ties broken by language name ascending.
LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is you that it he was for on are as with his they i at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über einen so zum war haben nur oder".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont la vous je avec son bien cette mais ses tout nous comme ou si leur y dont quand".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al lo como mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien me hasta hay donde quien desde todo nos".split()),
    "zh": frozenset("de le shi wo you he ta zhe zhong da lai shang guo dao ye hen zai men hao dou mei qu ni ge na".split()),
}


def _distinct_per_row(flat: pa.Array, parents: np.ndarray,
                      n_rows: int) -> np.ndarray:
    """Distinct-token count per row: dictionary codes + lexsort +
    adjacent-dup drop (no Python sets)."""
    if len(flat) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, parents))
    ps, cs = parents[order], codes[order]
    keep = np.empty(len(ps), dtype=bool)
    keep[0] = True
    np.logical_or(ps[1:] != ps[:-1], cs[1:] != cs[:-1], out=keep[1:])
    return np.bincount(ps[keep], minlength=n_rows).astype(np.int64)


class QualityStage:
    """Per-doc quality features, vectorized end-to-end:
    n_tokens, n_distinct, avg_token_len, stopword_ratio (EN list),
    punct_ratio (share of chars outside ``[0-9A-Za-z\\s]`` — the
    self-consistent ASCII rule; not driver-oracle-checked)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()
        self.stop_arr = pa.array(sorted(LANG_STOPWORDS["en"]), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].combine_chunks() \
            if isinstance(batch[self.text_col], pa.ChunkedArray) \
            else batch[self.text_col]
        texts = pc.fill_null(texts, "")
        n = len(texts)
        parents, flat, counts = flat_tokens(self.tok, texts)
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tok_chars = np.bincount(parents, weights=tok_lens, minlength=n)
        is_stop = pc.is_in(flat, value_set=self.stop_arr) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        n_stop = np.bincount(parents, weights=is_stop, minlength=n)
        n_distinct = _distinct_per_row(flat, parents, n)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # alnum-ish chars = token chars (the [a-z0-9]+ runs cover every
        # alnum char) + whitespace; plain substring counts beat a regex
        # char-class scan ~20x (memchr vs RE2 per char)
        n_ws = sum(pc.count_substring(texts, w)
                   .to_numpy(zero_copy_only=False)
                   for w in (" ", "\t", "\n", "\r"))
        n_alpha = tok_chars + n_ws.astype(np.float64)
        safe_tok = np.maximum(counts, 1).astype(np.float64)
        safe_chars = np.maximum(n_chars, 1.0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_tokens": pa.array(counts),
            "n_distinct": pa.array(n_distinct),
            "avg_token_len": pa.array(tok_chars / safe_tok),
            "stopword_ratio": pa.array(n_stop / safe_tok),
            "punct_ratio": pa.array((n_chars - n_alpha) / safe_chars),
        })


def quality_features(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(QualityStage(id_col, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)


class LangIdStage:
    """Stopword-hit language ID: predicted lang = argmax over languages of
    stopword hits; 'und' when no list scores > 0.  Ties broken by language
    code ascending (numpy argmax returns the first maximum and the score
    matrix columns are lang-sorted — stable by construction).

    Stateful analyzer + value sets built once per actor (reference
    pattern: haardetect.py:78-79 cascade loaded once)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()
        self.langs = sorted(LANG_STOPWORDS)
        self.value_sets = [pa.array(sorted(LANG_STOPWORDS[lang]), pa.string())
                           for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        parents, flat, _counts = flat_tokens(self.tok, texts)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li, vs in enumerate(self.value_sets):
            hit = pc.is_in(flat, value_set=vs) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            scores[:, li] = np.bincount(parents, weights=hit, minlength=n)
        best = np.argmax(scores, axis=1)            # first max = lang asc
        best_score = scores[np.arange(n), best]
        langs = np.array(self.langs, dtype=object)
        preds = np.where(best_score > 0, langs[best], "und")
        return pa.table({self.id_col: batch[self.id_col],
                         "pred_lang": pa.array(preds, pa.string())})


def langid(ds, id_col: str = "doc_id", text_col: str = "text",
           concurrency=None):
    from ..runtime import actor_pool
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(id_col=id_col,
                                                     text_col=text_col),
                          concurrency=concurrency or actor_pool())


# Subword-ish token estimator: letter runs, digit runs, punctuation runs
# (a BPE-style pre-tokenization rule, deliberately RE2-portable so the
# DuckDB oracle counts the same matches)
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_token_count(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Approximate LLM-token count per doc: count of BPE-ish
    pre-tokenization matches over the lowercased text — one vectorized
    RE2 kernel per batch."""
    def fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col], "")
        low = pc.utf8_lower(texts)
        n = pc.count_substring_regex(low, pattern=BPE_ISH_PATTERN)
        return pa.table({id_col: t[id_col],
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class WinnowStage:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme; public knowledge): hash every k-token
    gram, slide a window of ``w`` consecutive gram hashes, select each
    window's minimum (rightmost position on ties).  The selected
    (position, hash) set is a compact, position-aware fingerprint whose
    guarantee is that any shared run of ≥ w+k-1 tokens between two docs
    yields at least one shared selected hash.

    Fully vectorized: ordered k-grams via Arrow joins, md5 once per
    unique gram, sliding-window minima via ``sliding_window_view`` with
    reversed-argmin for the rightmost-tie rule; windows never cross row
    boundaries (validity mask, same trick as the shingle kernel).
    SQL-reproducible: window min + (h ASC, pos DESC) row_number — see
    ``oracle_sql['winnow_fingerprints']``.
    """

    def __init__(self, k: int = 3, w: int = 4, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.k, self.w = k, w
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import ordered_shingles
        texts = pc.fill_null(batch[self.text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, grams = ordered_shingles(self.tok, texts, self.k)
        empty = pa.table({self.id_col: batch[self.id_col].slice(0, 0),
                          "pos": pa.array([], pa.int32()),
                          "fp": pa.array([], pa.int64())})
        n = len(grams)
        w = self.w
        if n == 0:
            return empty
        h = dict_hash_u64(grams)
        # gram position within its row
        counts = np.bincount(parents, minlength=len(texts))
        row_starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=row_starts[1:])
        pos_in_row = np.arange(n, dtype=np.int64) - row_starts[parents]
        if n < w:
            wins = None
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, w)
            valid = parents[: n - w + 1] == parents[w - 1:]
        sel_rows: list[np.ndarray] = []
        sel_pos: list[np.ndarray] = []
        sel_fp: list[np.ndarray] = []
        if wins is not None and valid.any():
            # rightmost argmin: argmin over the REVERSED window returns
            # the first minimum of the reversal == rightmost original
            rev_arg = np.argmin(wins[valid][:, ::-1], axis=1)
            off = (w - 1) - rev_arg
            starts = np.flatnonzero(valid)
            pick = starts + off
            sel_rows.append(parents[pick])
            sel_pos.append(pos_in_row[pick])
            sel_fp.append(h[pick])
        # rows with ≥1 but < w grams: select the (rightmost) min of all
        short = (counts >= 1) & (counts < w)
        for r in np.flatnonzero(short):
            s, e = row_starts[r], row_starts[r] + counts[r]
            hr = h[s:e]
            p = len(hr) - 1 - int(np.argmin(hr[::-1]))
            sel_rows.append(np.array([r], dtype=np.int64))
            sel_pos.append(np.array([p], dtype=np.int64))
            sel_fp.append(np.array([hr[p]], dtype=np.uint64))
        if not sel_rows:
            return empty
        rows = np.concatenate(sel_rows)
        poss = np.concatenate(sel_pos)
        fps = np.concatenate([f.astype(np.uint64) for f in sel_fp])
        # distinct (row, pos): same position can win several windows
        order = np.lexsort((poss, rows))
        rows, poss, fps = rows[order], poss[order], fps[order]
        keep = np.empty(len(rows), dtype=bool)
        keep[0] = True
        np.logical_or(rows[1:] != rows[:-1], poss[1:] != poss[:-1],
                      out=keep[1:])
        ids = batch[self.id_col].take(pa.array(rows[keep]))
        return pa.table({
            self.id_col: ids,
            "pos": pa.array(poss[keep].astype(np.int32)),
            "fp": pa.array(fps[keep].astype(np.int64)),
        })


def winnow_fingerprints(ds, *, k: int = 3, w: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(WinnowStage(k, w, id_col, text_col),
                          batch_format="pyarrow")


class FingerprintStage:
    """Deterministic 64-bit document fingerprint, order-sensitive:

        fp(doc) = XOR over positions i of
                  (token_hash64(tok_i) * (2*i + 1)) mod 2**64
        (empty doc -> 0)

    Position-weighting by the odd constant ``2i+1`` (a bijection mod
    2**64) makes token order matter, unlike the bag-of-words hashes; the
    whole pipeline — md5 per unique token, wrap-around multiply, per-row
    XOR — is numpy-vectorized and bit-for-bit reproducible in DuckDB
    (``bit_xor`` + HUGEINT modmul; see ``oracle_sql['fingerprint']``).
    The analog of the reference's per-file sha256 identity
    (file_utils.py:50-60) but over normalized tokens so formatting
    changes don't alter it."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, flat, counts = flat_tokens(self.tok, texts)
        th = dict_hash_u64(flat)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos = np.arange(len(th), dtype=np.int64) - starts[parents] \
            if len(th) else np.empty(0, dtype=np.int64)
        weighted = th * (2 * pos.astype(np.uint64) + np.uint64(1))
        fp = segment_reduce(np.bitwise_xor, weighted, counts, empty=0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "fingerprint": pa.array(fp.astype(np.int64)),
        })


def fingerprints(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(FingerprintStage(id_col, text_col),
                          batch_format="pyarrow")


class RepetitionStage:
    """Gopher-style repetition features per doc (Rae et al. 2021's
    repetition-removal rules, the standard LLM-data quality filter):
    ``dup_bigram_frac`` = 1 − distinct/total adjacent bigrams and
    ``top_token_frac`` = most-frequent-token count / n_tokens.  Both
    zero on docs too short to have the statistic.

    Fully vectorized: one dictionary-encode for term codes, lexsort +
    adjacent-dup drops for the distinct counts, ``np.maximum.at`` over
    run lengths for the per-doc mode — no per-row Python.  Embarrassing
    parallelism (each doc's stats are row-local), zero shuffle."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].combine_chunks() \
            if isinstance(batch[self.text_col], pa.ChunkedArray) \
            else batch[self.text_col]
        texts = pc.fill_null(texts, "")
        n = len(texts)
        parents, flat, counts = flat_tokens(self.tok, texts)
        if len(flat):
            denc = pc.dictionary_encode(flat)
            if isinstance(denc, pa.ChunkedArray):
                denc = denc.combine_chunks()
            codes = denc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            V = np.int64(len(denc.dictionary))
            # per-doc mode count: sort (row, code), run-length encode,
            # scatter-max run lengths onto rows
            order = np.lexsort((codes, parents))
            ps, cs = parents[order], codes[order]
            new = np.r_[True, (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])]
            run_len = np.diff(np.r_[np.flatnonzero(new), len(ps)])
            top = np.zeros(n, dtype=np.int64)
            np.maximum.at(top, ps[new], run_len)
            # adjacent bigrams (flat is in (row, position) order)
            same = parents[1:] == parents[:-1]
            bp = parents[1:][same]
            key = codes[:-1][same] * V + codes[1:][same]
            tot_big = np.bincount(bp, minlength=n).astype(np.int64)
            if len(bp):
                order2 = np.lexsort((key, bp))
                p2, k2 = bp[order2], key[order2]
                keep = np.r_[True, (p2[1:] != p2[:-1])
                             | (k2[1:] != k2[:-1])]
                dist_big = np.bincount(p2[keep], minlength=n) \
                    .astype(np.int64)
            else:
                dist_big = np.zeros(n, dtype=np.int64)
        else:
            top = np.zeros(n, dtype=np.int64)
            tot_big = dist_big = np.zeros(n, dtype=np.int64)
        # identical float64 op order to the SQL oracle:
        # 1 − distinct/total and mode/n, each one division
        dup_frac = np.where(tot_big > 0,
                            1.0 - dist_big / np.maximum(tot_big, 1), 0.0)
        top_frac = np.where(counts > 0,
                            top / np.maximum(counts, 1), 0.0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_tokens": pa.array(counts),
            "dup_bigram_frac": pa.array(dup_frac),
            "top_token_frac": pa.array(top_frac),
        })


def repetition_features(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(RepetitionStage(id_col, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Model scoring (actor-pool linear quality classifier)
# ---------------------------------------------------------------------------

QUALITY_WEIGHTS = {
    "bias": -2.0,
    "n_tokens": 0.01,
    "n_distinct": 0.02,
    "avg_token_len": 0.5,
    "stopword_ratio": 3.0,
}


class QualityScorerStage:
    """Batched model scoring as a stateful actor-pool stage — the
    engine's analog of the reference's model-once-per-process inference
    (src/vframe/image/processors/base.py:57-83 loads the DNN in the
    processor constructor, then batches frames through it): the "model"
    (a linear quality classifier) is materialized ONCE per actor in
    ``__init__``; ``__call__`` scores whole Arrow batches vectorized.
    A real checkpoint would arrive as an object-store ref resolved here
    (ray.put once on the driver, ray.get once per actor) — the weights
    dict keeps this test-runnable without model files.

    The score is a LINEAR logit (no sigmoid: transcendental libm calls
    differ in the last ulp across engines), accumulated in the same
    left-to-right order as the SQL oracle's expression and rounded to
    6 dp, so engine and oracle agree bit-for-bit.
    """

    def __init__(self, weights: dict | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.w = dict(weights or QUALITY_WEIGHTS)
        self.feat = QualityStage(id_col, text_col)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.feat(batch)
        w = self.w
        s = w["bias"] + w["n_tokens"] * f["n_tokens"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = s + w["n_distinct"] * f["n_distinct"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = s + w["avg_token_len"] * f["avg_token_len"].to_numpy(
            zero_copy_only=False)
        s = s + w["stopword_ratio"] * f["stopword_ratio"].to_numpy(
            zero_copy_only=False)
        return pa.table({self.id_col: f[self.id_col],
                         "score_r": pa.array(np.round(s, 6))})


def quality_score_topk(ds, *, k: int = 50, weights: dict | None = None,
                       concurrency=(1, 4), id_col: str = "doc_id",
                       text_col: str = "text"):
    """Top-k docs by linear quality score: actor-pool scoring →
    per-block local top-k → a driver merge of ≤ blocks × k rows (never
    corpus-sized).  Ties at the 6-dp boundary break on id, matching
    the SQL ORDER BY."""
    import pandas as pd

    scored = ds.map_batches(
        QualityScorerStage,
        fn_constructor_kwargs={"weights": weights, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["score_r", id_col], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    out = scored.map_batches(local_topk,
                             batch_format="pyarrow").to_pandas()
    return out.sort_values(["score_r", id_col],
                           ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def oov_rate(ds, *, top_v: int, id_col: str = "doc_id",
             text_col: str = "text", cfg=None):
    """Vocabulary-coverage audit: build the top-``top_v`` vocabulary by
    collection frequency (ties broken by term ascending — the same
    row_number rule as the SQL oracle) and report, per non-empty doc,
    its out-of-vocabulary token count and rate — the tokenizer/vocab
    coverage diagnostic run before committing a vocab size for a
    training corpus.

    Scale shape: per-block term-count combiner (one np.unique per
    block) → ONE term-hash-bucket exchange where each term reduces to
    a single (term, cf) row → per-block local top-V (cf desc, term
    asc) so the driver merge is ≤ blocks × V rows, never vocab-sized —
    exact BECAUSE it runs after the reduce (every term appears exactly
    once, so the global top-V is contained in the union of local
    top-Vs).  The V-term vocabulary broadcasts once via ``ray.put``
    (sorted; membership is one searchsorted per block) and a second
    scan emits per-doc counts.

    Returns a Dataset of (id_col, n_tokens, n_oov, oov_rate); docs
    with zero tokens emit no row.
    """
    import pandas as pd
    import ray

    from ..analyze import Tokenizer
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets(None)
    tok = Tokenizer(cfg)

    def cf_partial(t: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(t[text_col])
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        terms, counts = np.unique(flat, return_counts=True)
        return pa.table({"term": pa.array(terms.astype(object),
                                          pa.string()),
                         "cf": pa.array(counts.astype(np.int64))})

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["term"].to_pandas()
                               .to_numpy(dtype=object))
        return t.append_column("__b",
                               pa.array((h % nb).astype(np.int32)))

    def bucket_sum(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("term", as_index=False, sort=False)["cf"].sum()
        return pa.table({"term": pa.array(agg["term"].to_numpy(object),
                                          pa.string()),
                         "cf": pa.array(agg["cf"].to_numpy(np.int64))})

    def local_topv(t: pa.Table) -> pa.Table:
        terms = t["term"].to_numpy(zero_copy_only=False)
        cf = t["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((terms, -cf))[:top_v]
        return pa.table({"term": pa.array(terms[order].astype(object),
                                          pa.string()),
                         "cf": pa.array(cf[order])})

    stats = (ds.map_batches(cf_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b").map_groups(bucket_sum,
                                        batch_format="pandas")
             .map_batches(local_topv, batch_format="pyarrow")
             .to_pandas())
    order = np.lexsort((stats["term"].to_numpy(object),
                        -stats["cf"].to_numpy(np.int64)))[:top_v]
    vocab = np.sort(stats["term"].to_numpy(object)[order])
    vocab_ref = ray.put(vocab)

    def per_doc(t: pa.Table) -> pa.Table:
        vs = ray.get(vocab_ref)
        tokens = tok.tokenize_array(t[text_col])
        n = pc.list_value_length(tokens).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        keep = n > 0
        if len(flat):
            if len(vs):
                idx = np.clip(np.searchsorted(vs, flat), 0, len(vs) - 1)
                inv = vs[idx] != flat
            else:
                inv = np.ones(len(flat), bool)
            oov = np.bincount(parents, weights=inv.astype(np.float64),
                              minlength=t.num_rows).astype(np.int64)
        else:
            oov = np.zeros(t.num_rows, np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        nk, ok = n[keep], oov[keep]
        return pa.table({id_col: pa.array(ids),
                         "n_tokens": pa.array(nk),
                         "n_oov": pa.array(ok),
                         "oov_rate": pa.array(ok.astype(np.float64)
                                              / nk.astype(np.float64))})

    return ds.map_batches(per_doc, batch_format="pyarrow",
                          zero_copy_batch=True)


def source_token_drift(ds, *, source_col: str = "source",
                       text_col: str = "text", cfg=None):
    """Distribution-drift audit: per source, the TOTAL-VARIATION
    distance between that source's token distribution and the REST of
    the corpus — the "which slice looks least like everything else"
    diagnostic run before mixing corpora into a training set.  TV is
    chosen over KL/JS precisely because it needs no logarithms: with
    integer counts ``c_s(t)`` (source s) and ``c(t)`` (corpus),

        TV(s) = sum_t |c_s(t)·(N − N_s) − (c(t) − c_s(t))·N_s|
                / (2·N_s·(N − N_s))

    so the numerator is EXACT integer arithmetic and the single final
    division is the same float64 op on both sides — a value-hash SQL
    oracle for a statistical-divergence operator.  (Integer bound: the
    per-term products stay under int64 for corpora up to ~3e9 tokens;
    beyond that, carry hi/lo partials like ``grouped_linregress``.)

    Scale shape: ONE tokenize pass emits (source, term, cnt) combiner
    partials, materialized once (bounded by blocks × vocab × sources);
    per-source token totals driver-combine from the same partials
    (sources are enum-bounded by contract); ONE term-hash-bucket
    exchange reduces each term's per-source row group against the
    broadcast totals — including the zero-count (source, term) cells a
    pivot reindex makes explicit, because "s never says t" contributes
    ``c(t)·N_s`` to the numerator.

    Returns pandas (source, n_tokens, tv) sorted by source.
    """
    import pandas as pd
    import ray

    from ..runtime import arrow_group, num_hash_buckets
    nb = num_hash_buckets(None)
    tok = Tokenizer(cfg)

    def partial(t: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(t[text_col])
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        if not len(flat):
            return pa.table({source_col: pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        src = t[source_col].to_numpy(zero_copy_only=False)[parents]
        df = pd.DataFrame({source_col: src, "term": flat})
        agg = df.groupby([source_col, "term"], as_index=False,
                         sort=False).size().rename(
            columns={"size": "cnt"})
        h = pd.util.hash_array(agg["term"].to_numpy(object))
        agg["__b"] = (h % nb).astype(np.int32)
        return arrow_group(agg)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    totals = parts.to_pandas().groupby(source_col)["cnt"].sum()
    sources = np.array(sorted(totals.index), dtype=object)
    n_s = totals.reindex(sources).to_numpy(np.int64)
    n_total = int(n_s.sum())
    tot_ref = ray.put((sources, n_s, n_total))

    def reduce(g: pd.DataFrame) -> pa.Table:
        srcs, ns, n = ray.get(tot_ref)
        empty = pd.DataFrame({source_col: pd.Series(dtype="object"),
                              "num": pd.Series(dtype=np.int64)})
        if not len(g):
            return arrow_group(empty)
        agg = g.groupby(["term", source_col], as_index=False,
                        sort=False)["cnt"].sum()
        # term × source grid with explicit zeros
        piv = agg.pivot_table(index="term", columns=source_col,
                              values="cnt", fill_value=0,
                              aggfunc="sum") \
            .reindex(columns=srcs, fill_value=0)
        cs = piv.to_numpy(np.int64)               # (terms, sources)
        ct = cs.sum(axis=1, keepdims=True)
        num = np.abs(cs * (n - ns)[None, :]
                     - (ct - cs) * ns[None, :]).sum(axis=0)
        return arrow_group(pd.DataFrame({source_col: srcs,
                                         "num": num.astype(np.int64)}))

    nums = (parts.groupby("__b").map_groups(reduce,
                                            batch_format="pandas")
            .to_pandas().groupby(source_col)["num"].sum())
    num = nums.reindex(sources).fillna(0).to_numpy(np.int64)
    tv = np.empty(len(sources), np.float64)
    for i in range(len(sources)):
        den = 2 * int(n_s[i]) * (n_total - int(n_s[i]))
        tv[i] = (float(int(num[i])) / float(den)) if den else np.nan
    return pd.DataFrame({source_col: sources, "n_tokens": n_s,
                         "tv": tv}).sort_values(source_col) \
        .reset_index(drop=True)


def facet_top_terms(ds, *, facet_col: str = "source",
                    text_col: str = "text", k: int = 5, cfg=None):
    """Per-facet top-k terms by occurrence count (ties by term asc) —
    the "what does each slice talk about" vocabulary drill-down that
    pairs with :func:`source_token_drift`'s single-number distance.

    Scale shape: per-block (facet, term, cnt) combiner partials, ONE
    hash(facet) exchange (a facet's whole term histogram co-locates, so
    the per-bucket exact sums AND the per-facet top-k both resolve
    in-bucket), driver merge = ≤ facets × k rows.

    Returns pandas (facet_col, rnk, term, n) sorted by (facet, rnk).
    """
    import pandas as pd

    from ..runtime import arrow_group, key_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    tok = Tokenizer(cfg)

    def partial(t: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(t[text_col])
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        if not len(flat):
            return pa.table({facet_col: pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        fac = t[facet_col].to_numpy(zero_copy_only=False)[parents]
        agg = pd.DataFrame({facet_col: fac, "term": flat}) \
            .groupby([facet_col, "term"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        agg["__b"] = key_bucket_of(agg[facet_col].to_numpy(), nb)
        return arrow_group(agg)

    def reduce(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby([facet_col, "term"], as_index=False,
                        sort=False)["cnt"].sum()
        if not len(agg):
            return arrow_group(pd.DataFrame(
                {facet_col: pd.Series(dtype="object"),
                 "rnk": pd.Series(dtype=np.int64),
                 "term": pd.Series(dtype="object"),
                 "n": pd.Series(dtype=np.int64)}))
        agg = agg.sort_values([facet_col, "cnt", "term"],
                              ascending=[True, False, True])
        agg["rnk"] = agg.groupby(facet_col, sort=False).cumcount() + 1
        out = agg[agg["rnk"] <= k].rename(columns={"cnt": "n"})
        return arrow_group(out[[facet_col, "rnk", "term", "n"]])

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(reduce, batch_format="pandas")
           .to_pandas())
    return out.sort_values([facet_col, "rnk"]).reset_index(drop=True)


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte values, per-row byte lengths) of a string/large_string
    Array, zero-copy from the Arrow buffers.  Nulls count as empty."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(off_buf, dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8)[offs[0]: offs[-1]]
    lens = np.diff(offs)
    if arr.null_count:
        # null rows have repeated offsets already (length 0) in Arrow
        pass
    return data, lens


def char_entropy(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 round_to: int = 6):
    """Per-doc Shannon entropy over UTF-8 bytes — the cheap repetition /
    boilerplate / low-diversity detector every quality-filter stack
    carries (a doc of one repeated character scores 0; uniform text
    scores high).  H = ln(n) − (Σ c·ln c)/n over exact integer byte
    counts, so partitioning cannot drift the value; the only float
    work is the one closed-form expression, reproduced verbatim by the
    SQL oracle (byte = character on ASCII corpora; the pytest pins the
    byte definition on non-ASCII input).

    Fully vectorized: one ``bincount`` over ``row_idx·256 + byte`` per
    block, segmented entropy via the reshaped (rows, 256) count matrix.
    Zero shuffle — the result streams per block.

    Returns a Dataset of (id, n_bytes, entropy) with entropy rounded to
    ``round_to`` decimals.
    """
    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        data, lens = _string_bytes(t[text_col].combine_chunks()
                                   if isinstance(t[text_col],
                                                 pa.ChunkedArray)
                                   else t[text_col])
        nrows = t.num_rows
        if not len(data):
            return pa.table({
                id_col: ids,
                "n_bytes": pa.array(np.zeros(nrows, np.int64)),
                "entropy": pa.array(np.zeros(nrows, np.float64))})
        row_idx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        cnt = np.bincount(row_idx * 256 + data.astype(np.int64),
                          minlength=nrows * 256).reshape(nrows, 256)
        n = lens.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            clogc = np.where(cnt > 0, cnt * np.log(
                np.where(cnt > 0, cnt, 1)), 0.0).sum(axis=1)
            ent = np.where(lens > 0, np.log(np.where(lens > 0, lens, 1))
                           - clogc / np.where(n > 0, n, 1.0), 0.0)
        return pa.table({
            id_col: ids,
            "n_bytes": pa.array(lens.astype(np.int64)),
            "entropy": pa.array(np.round(ent, round_to))})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def unigram_cross_entropy(ds, *, id_col: str = "doc_id",
                          text_col: str = "text", round_to: int = 6,
                          corpus_total: int | None = None):
    """Per-doc cross-entropy (nats/token) under the CORPUS unigram LM —
    the perplexity-proxy quality signal of the CCNet / RedPajama
    filtering stacks (there a 5-gram KenLM; here the unigram MLE so
    the score is exactly reproducible in SQL): docs made of common
    words score low, rare-token noise scores high.

        h(d) = -(1/L_d) * sum_pos ln(cf(t) / C)
             =  ln C - (sum_t tf_t * ln cf_t) / L_d

    Scale shape — mirror of :func:`~vframe_ray.stages.dedup.
    ngram_novelty`'s two-exchange plan: per-block (doc, term, tf)
    partials (a doc is whole inside its block, so block tf = doc tf)
    co-partition by hash(term); each term bucket holds EVERY row of
    its terms, so global cf is computed in-bucket and the per-row
    ``tf * ln cf`` contribution attached in the same pass — no vocab
    broadcast, no join-back.  Rows then re-bucket by hash(doc); the
    per-doc reduce orders each doc's contributions by value before the
    float sum, so the accumulation order is a pure function of the doc
    — never of block boundaries or bucket count (partition-invariant,
    like every float op here).

    ``corpus_total`` (C = total corpus tokens) is one cheap pre-pass
    when omitted; a caller with a built index reads it for free from
    ``global/stats.json``'s ``total_len`` and passes it in.

    Returns a Dataset of (id_col, n_tokens, h_r); empty docs have no
    tokens and are absent (mirror a LEFT JOIN in SQL for a roster).
    """
    import pandas as pd

    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets()

    def tf_rows(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        toks = tok.tokenize_array(pc.fill_null(t[text_col], ""))
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if not len(flat):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        parents = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        terms, codes = np.unique(flat.to_numpy(zero_copy_only=False),
                                 return_inverse=True)
        ndocs_blk = t.num_rows
        pair = codes.astype(np.int64) * ndocs_blk + parents
        upair, tfc = np.unique(pair, return_counts=True)
        return pa.table({
            id_col: pa.array(ids[(upair % ndocs_blk)]),
            "term": pa.array(terms[(upair // ndocs_blk)].astype(object),
                             pa.string()),
            "tf": pa.array(tfc.astype(np.int64))})

    if corpus_total is None:
        # cheap pre-pass: token counts only (skips tf_rows' np.unique)
        def blk_total(t: pa.Table) -> pa.Table:
            tok = Tokenizer()
            toks = tok.tokenize_array(pc.fill_null(t[text_col], ""))
            n = pc.sum(pc.list_value_length(toks)).as_py()
            return pa.table({"n": pa.array([int(n or 0)], pa.int64())})
        corpus_total = int(
            ds.map_batches(blk_total, batch_format="pyarrow",
                           zero_copy_batch=True).sum("n") or 0)
    # empty corpus: no doc ever reaches doc_combine, but keep ln
    # finite so numpy stays warning-free on the driver
    ln_c = float(np.log(float(max(corpus_total, 1))))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["term"].to_pandas().to_numpy(dtype=object))
        return t.append_column(
            "__kb", pa.array((h % nb).astype(np.int32)))

    def term_bucket(g: pd.DataFrame) -> pa.Table:
        codes, _ = pd.factorize(g["term"], sort=False)
        tf = g["tf"].to_numpy(np.int64)
        cf = np.bincount(codes, weights=tf).astype(np.int64)
        contrib = tf * np.log(cf[codes].astype(np.float64))
        ids = g[id_col].to_numpy(np.int64)
        out = arrow_group(pd.DataFrame(
            {"id": ids, "tf": tf, "c": contrib}))
        return out.append_column(
            "__db", pa.array(int_bucket_of(ids, nb)))

    def doc_combine(g: pd.DataFrame) -> pa.Table:
        ids = g["id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.float64)
        tf = g["tf"].to_numpy(np.int64)
        order = np.lexsort((c, ids))
        ids, c, tf = ids[order], c[order], tf[order]
        cuts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        s = np.add.reduceat(c, cuts)
        n_tok = np.add.reduceat(tf, cuts)
        h = np.round(ln_c - s / n_tok.astype(np.float64), round_to)
        return pa.table({id_col: pa.array(ids[cuts]),
                         "n_tokens": pa.array(n_tok.astype(np.int64)),
                         "h_r": pa.array(h, pa.float64())})

    return (ds.map_batches(tf_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__kb").map_groups(term_bucket,
                                        batch_format="pandas")
            .groupby("__db").map_groups(doc_combine,
                                        batch_format="pandas"))


def flesch_reading_ease(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", round_to: int = 6):
    """Flesch Reading Ease per doc — the classic readability score
    quality-filter stacks use as a cheap fluency prior.  Counting
    rules pinned so the value is SQL-exact:

    - words      = analyzer tokens (the shared ``[a-z0-9]+`` rule)
    - sentences  = runs of ``[.!?]+`` in the raw text, min 1
    - syllables  = runs of ``[aeiouy]+`` per token, min 1 per token

    FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words);
    every count is an exact integer and the formula is the single
    float expression the oracle reproduces.  Fully vectorized (one
    ``count_substring_regex`` over the flattened token array + one
    over the raw text), zero shuffle — streams per block.

    Returns (id_col, n_words, n_sentences, n_syllables, fre_r); docs
    with zero tokens are absent (mirror a LEFT JOIN for a roster).
    """
    def fn(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        texts = pc.fill_null(t[text_col].combine_chunks()
                             if isinstance(t[text_col], pa.ChunkedArray)
                             else t[text_col], "")
        n = t.num_rows
        parents, flat, counts = flat_tokens(tok, texts)
        sents = np.maximum(
            pc.count_substring_regex(texts, r"[.!?]+")
            .to_numpy(zero_copy_only=False).astype(np.int64), 1)
        syl_tok = np.maximum(
            pc.count_substring_regex(flat, r"[aeiouy]+")
            .to_numpy(zero_copy_only=False).astype(np.int64), 1)
        syl = np.bincount(parents, weights=syl_tok,
                          minlength=n).astype(np.int64)
        keep = counts > 0
        w = counts[keep].astype(np.float64)
        fre = np.round(206.835 - 1.015 * w / sents[keep]
                       - 84.6 * syl[keep] / w, round_to)
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)[keep]
        return pa.table({
            id_col: pa.array(ids),
            "n_words": pa.array(counts[keep].astype(np.int64)),
            "n_sentences": pa.array(sents[keep]),
            "n_syllables": pa.array(syl[keep]),
            "fre_r": pa.array(fre, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def c4_rule_filter(ds, *, id_col: str = "doc_id",
                   text_col: str = "text", min_tokens: int = 5):
    """C4-style heuristic document filter (Raffel et al. 2020, the
    cleaning pass behind the C4 corpus), restated as doc-level rules
    pinned for SQL exactness.  A doc is kept iff ALL hold:

    - ``rule_len``:   ≥ ``min_tokens`` analyzer tokens
    - ``rule_punct``: text (right-stripped of whitespace) ends with
                      terminal punctuation ``. ! ? "``
    - ``rule_brace``: contains no ``{`` (the code/boilerplate tell)
    - ``rule_lorem``: no ``lorem ipsum`` in the lowercased text

    Per-rule integer flags are returned (not just the verdict) so the
    downstream mix report can attribute WHY docs dropped.  Fully
    vectorized, zero shuffle — streams per block.

    Returns (id_col, rule_len, rule_punct, rule_brace, rule_lorem,
    kept) for every doc, flags as 0/1 int64.
    """
    def fn(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        texts = pc.fill_null(t[text_col].combine_chunks()
                             if isinstance(t[text_col], pa.ChunkedArray)
                             else t[text_col], "")
        counts = tok.doc_lengths(tok.tokenize_array(texts)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        r_len = (counts >= min_tokens).astype(np.int64)
        stripped = pc.utf8_rtrim_whitespace(texts)
        r_punct = np.zeros(t.num_rows, np.int64)
        for ch in (".", "!", "?", '"'):
            r_punct |= pc.ends_with(stripped, pattern=ch) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        r_brace = (pc.count_substring(texts, "{")
                   .to_numpy(zero_copy_only=False) == 0).astype(np.int64)
        r_lorem = (pc.count_substring(pc.utf8_lower(texts), "lorem ipsum")
                   .to_numpy(zero_copy_only=False) == 0).astype(np.int64)
        kept = r_len & r_punct & r_brace & r_lorem
        return pa.table({
            id_col: t[id_col],
            "rule_len": pa.array(r_len),
            "rule_punct": pa.array(r_punct),
            "rule_brace": pa.array(r_brace),
            "rule_lorem": pa.array(r_lorem),
            "kept": pa.array(kept)})

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
