"""Corpus statistics with explicit skew handling.

Recasts the reference's grouped-count analytics (reference:
src/commands/utils/summarize-json.py:29-105 — per-file partial counts
folded into global histograms; media-attrs-summarize.py:20-75 — global
sums) as two-phase aggregation with an explicit *salted* groupby for
hot keys (SURVEY.md §4 skew row):

1. partial: inside ``map_batches``, collapse each batch to one row per
   (key, salt) — the combiner.  Salt = ``hash(subkey) % salt_factor``
   applied to every key (cheap, uniform), so a Zipf-head term's rows
   split across ``salt_factor`` reducers instead of landing on one.
2. final: ``groupby(key).aggregate(Sum)`` over the tiny partials.

At 10^12 turns the partial stage reduces the shuffle from one row per
token occurrence to ≤ (keys × salt × blocks) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


class TermDFPartial:
    """Batch combiner: tokens list column -> one row per (term, salt) with
    partial df (docs containing term) and cf (occurrences)."""

    def __init__(self, salt_factor: int = 16):
        self.salt_factor = salt_factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        flat_np = flat.to_numpy(zero_copy_only=False)
        if len(flat_np) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "salt": pa.array([], pa.int32()),
                             "df_partial": pa.array([], pa.int64()),
                             "cf_partial": pa.array([], pa.int64())})
        terms, codes = np.unique(flat_np, return_inverse=True)
        # cf: occurrences per term; df: distinct docs per term
        cf = np.bincount(codes, minlength=len(terms))
        pair = codes.astype(np.int64) * (parents.max() + 1) + parents
        upair = np.unique(pair)
        df = np.bincount((upair // (parents.max() + 1)).astype(np.int64),
                         minlength=len(terms))
        # Salt is constant within a batch but varies ACROSS batches (derived
        # from the batch's first doc key): a hot term's per-batch partial
        # rows then spread over up to salt_factor stage-1 reducers instead
        # of all converging on hash(term)'s one reducer.
        first_key = f"{batch['conv_id'][0]}|{batch['turn_idx'][0]}"
        salt_val = int(pd.util.hash_array(np.array([first_key], dtype=object))[0]
                       % self.salt_factor)
        salt = np.full(len(terms), salt_val, dtype=np.int32)
        return pa.table({
            "term": pa.array(terms.astype(object), pa.string()),
            "salt": pa.array(salt),
            "df_partial": pa.array(df.astype(np.int64)),
            "cf_partial": pa.array(cf.astype(np.int64)),
        })


def salted_sum(ds, key: str, cols: list[str], salt_factor: int = 16):
    """Skew-safe grouped Sum: per-block combiner (a hot key leaves at
    most ONE row per block), then key-hash-bucket co-partition + one
    Arrow C group_by per bucket.

    The historical two-stage salted Ray ``aggregate`` is gone: Ray's
    aggregate() combines per group in Python (measured ~20 s over 1M
    partial rows), and the block-level combiner already bounds what any
    one reducer sees — which is everything the salt bought.
    ``salt_factor`` is retained for API compatibility (no effect).
    """
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(key).aggregate([(c, "sum") for c in cols])
        return g.rename_columns([key] + cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t[key].to_pandas().to_numpy(dtype=object))
        return t.append_column("__kb",
                               pa.array((h % nb).astype(np.int32)))

    return (ds.map_batches(combine, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__kb")
            .map_groups(combine, batch_format="pyarrow"))


def term_stats(tokenized_ds, salt_factor: int = 16):
    """tokens Dataset -> Dataset(term, df, cf): per-block TermDFPartial
    rows (≤ 1 per term per block — the combiner bounds hot-term skew),
    reduced by the same term-bucket kernel as the index build
    (index/build.term_stats_sum)."""
    from ..index.build import term_stats_sum
    partials = tokenized_ds.map_batches(
        TermDFPartial(salt_factor), batch_format="pyarrow",
        zero_copy_batch=True)
    parts = partials.map_batches(
        lambda t: pa.table({"term": t["term"], "df": t["df_partial"],
                            "cf": t["cf_partial"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return term_stats_sum(parts)


class DocLenPartial:
    """Batch combiner for global (n_docs, total_len)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        dl = batch["doclen"].to_numpy(zero_copy_only=False)
        return pa.table({"n_docs": pa.array([len(dl)], pa.int64()),
                         "total_len": pa.array([int(dl.sum())], pa.int64())})


def corpus_stats(tokenized_ds) -> dict:
    """Global (n_docs, total_len, avgdl) via partial-then-sum."""
    parts = tokenized_ds.map_batches(DocLenPartial(), batch_format="pyarrow",
                                     zero_copy_batch=True)
    agg = parts.aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("total_len", alias_name="total_len"))
    n, tl = int(agg["n_docs"] or 0), int(agg["total_len"] or 0)
    return {"n_docs": n, "total_len": tl,
            "avgdl": (tl / n) if n else 0.0}


def term_cooccurrence(tokenized_ds, vocab: list[str], *, k: int = 30,
                      n_docs: int | None = None,
                      df_map: dict[str, int] | None = None) -> pd.DataFrame:
    """Top-k co-occurring VOCAB term pairs across docs, with PMI.

    The pair space is bounded by |vocab|²/2 BY CONSTRUCTION (the caller
    picks vocab, e.g. the top-N df terms) — the standard guard against
    the quadratic blowup of unrestricted per-doc pair explosion.  Each
    block emits one bincount row per observed pair code (≤ |vocab|²/2
    rows however big the block), so the driver combine is O(pairs), not
    O(corpus).  Pair generation is fully vectorized: distinct
    (doc, term_id) via one np.unique, then the i<j index expansion with
    repeat/cumsum arithmetic — zero per-row Python.

    PMI(a,b) = ln(n_pair · N / (df_a · df_b)) over DOCUMENT frequencies
    (pointwise mutual information of "both terms in one doc").

    Returns (term_a, term_b, n_pair, pmi_r) for the top-k pairs by
    (n_pair desc, term_a, term_b), sorted by (term_a, term_b).
    """
    import ray

    varr = np.array(sorted(set(vocab)), dtype=object)
    V = len(varr)
    vocab_ref = ray.put(varr)

    def partial(batch: pa.Table) -> pa.Table:
        vs = ray.get(vocab_ref)
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        empty = pa.table({"code": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if len(flat) == 0:
            return empty
        tid = np.searchsorted(vs, flat)
        ok = (tid < V) & (vs[np.minimum(tid, V - 1)] == flat)
        if not ok.any():
            return empty
        # distinct (doc, vocab term) pairs, sorted by (doc, tid)
        key = parents[ok].astype(np.int64) * V + tid[ok]
        ukey = np.unique(key)
        d = ukey // V
        t = ukey % V
        # i<j pair expansion: element at within-doc index i pairs with
        # the cnt = m-1-i elements after it
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        m = np.diff(np.r_[starts, d.size])
        within = np.arange(d.size) - np.repeat(starts, m)
        cnt = np.repeat(m, m) - 1 - within
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(d.size), cnt)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        b_idx = np.arange(total) - np.repeat(csum[:-1], cnt) + a_idx + 1
        code = t[a_idx] * V + t[b_idx]        # ta < tb by the sort
        # O(pairs observed) memory — a dense V*V bincount is ~800 MB per
        # block task at V=10k even though only seen pairs matter (ADVICE
        # r3); np.unique yields the same (code, count) rows.
        nz, counts = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "n_p": pa.array(counts.astype(np.int64))})

    parts = tokenized_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    from ..runtime import block_refs as _block_refs
    tables = [tt for tt in ray.get(_block_refs(parts)) if tt.num_rows]
    if not tables:
        return pd.DataFrame({"term_a": [], "term_b": [],
                             "n_pair": pd.Series([], dtype="int64"),
                             "pmi_r": pd.Series([], dtype="float64")})
    t = pa.concat_tables(tables)
    g = (t.group_by("code").aggregate([("n_p", "sum")]).to_pandas()
         .rename(columns={"n_p_sum": "n_pair"}))
    g["term_a"] = varr[(g["code"] // V).to_numpy()]
    g["term_b"] = varr[(g["code"] % V).to_numpy()]
    g = g.sort_values(["n_pair", "term_a", "term_b"],
                      ascending=[False, True, True]).head(k)
    if df_map is not None and n_docs:
        dfa = g["term_a"].map(df_map).to_numpy(dtype=np.int64)
        dfb = g["term_b"].map(df_map).to_numpy(dtype=np.int64)
        g["pmi_r"] = np.round(np.log(
            (g["n_pair"].to_numpy() * float(n_docs)) / (dfa * dfb)
            .astype(np.float64)), 6)
    return g.sort_values(["term_a", "term_b"])[
        ["term_a", "term_b", "n_pair"]
        + (["pmi_r"] if "pmi_r" in g else [])].reset_index(drop=True)


def significant_terms(tokenized_ds, queries: list[dict], *,
                      n_bg: int, k: int = 10,
                      min_df_fg: int = 1) -> pd.DataFrame:
    """Significant terms: for each query, the terms most OVERREPRESENTED
    in the matching docs (any query term present) vs the whole corpus —
    lift = (df_fg / n_fg) / (df_bg / n_bg), the search-analytics
    "why did these match" operator.  Query terms themselves are
    excluded (they trivially top the list).

    Two passes over the tokenized corpus (mirroring the oracle):
    1. tiny (query, n_match) partial sum → n_fg per query;
    2. per-block distinct-doc term counts for BOTH the match set
       (per query) and the corpus (query_id = -1 sentinel rows —
       fg and bg ride the same partial), reduced by term-hash-bucket
       co-partition; each bucket joins fg with bg, computes lift, and
       emits only its LOCAL top-k per query, so the driver merge sees
       ≤ k · buckets rows however large the vocabulary.

    Returns (query_id, term, df_fg, lift_r) top-k per query by
    (lift_r desc, term asc), sorted by (query_id, term).
    """
    import ray

    from ..runtime import block_refs as _block_refs
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()
    parsed = [(int(q["query_id"]), sorted(set(q["terms"])))
              for q in queries]
    parsed_ref = ray.put(parsed)

    def _match_rows(flat, parents, n_rows, qterms):
        hit = np.isin(flat, qterms)
        rows = np.zeros(n_rows, dtype=bool)
        rows[parents[hit]] = True
        return rows

    def n_fg_partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(parsed_ref)
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        qid_o, n_o = [], []
        for qid, qterms in qs:
            qid_o.append(qid)
            n_o.append(int(_match_rows(flat, parents, batch.num_rows,
                                       np.array(qterms, dtype=object))
                           .sum()))
        return pa.table({"query_id": pa.array(qid_o, pa.int32()),
                         "n_p": pa.array(n_o, pa.int64())})

    nfg_parts = tokenized_ds.map_batches(n_fg_partial,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True).to_pandas()
    n_fg = nfg_parts.groupby("query_id")["n_p"].sum().to_dict()

    def df_partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(parsed_ref)
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        out_q, out_t, out_d = [], [], []
        if len(flat):
            terms_u, codes = np.unique(flat, return_inverse=True)
            pair = np.unique(codes.astype(np.int64) * batch.num_rows
                             + parents)          # distinct (term, doc)
            p_code, p_row = pair // batch.num_rows, pair % batch.num_rows
            # corpus background: every distinct (term, doc)
            bg = np.bincount(p_code, minlength=len(terms_u))
            out_q.append(np.full(len(terms_u), -1, dtype=np.int32))
            out_t.append(terms_u)
            out_d.append(bg.astype(np.int64))
            for qid, qterms in qs:
                rows = _match_rows(flat, parents, batch.num_rows,
                                   np.array(qterms, dtype=object))
                sel = rows[p_row]
                if not sel.any():
                    continue
                fg = np.bincount(p_code[sel], minlength=len(terms_u))
                nz = np.flatnonzero(fg)
                # exclude the query's own terms
                keep = nz[~np.isin(terms_u[nz],
                                   np.array(qterms, dtype=object))]
                if keep.size:
                    out_q.append(np.full(keep.size, qid, dtype=np.int32))
                    out_t.append(terms_u[keep])
                    out_d.append(fg[keep].astype(np.int64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "term": pa.array([], pa.string()),
                             "df_p": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "term": pa.array(np.concatenate(out_t).astype(object),
                             pa.string()),
            "df_p": pa.array(np.concatenate(out_d)),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["term"].to_pandas().to_numpy(dtype=object))
        return t.append_column("__b", pa.array((h % nb).astype(np.int32)))

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["query_id", "term"], as_index=False)["df_p"].sum()
        bg = s[s["query_id"] == -1].set_index("term")["df_p"]
        fg = s[s["query_id"] != -1]
        fg = fg[fg["df_p"] >= min_df_fg]
        rows = []
        for qid, sub in fg.groupby("query_id", sort=True):
            nf = n_fg.get(int(qid), 0)
            if not nf:
                continue
            dfb = bg.loc[sub["term"]].to_numpy(dtype=np.int64)
            dff = sub["df_p"].to_numpy(dtype=np.int64)
            lift = np.round((dff * n_bg) / (dfb * nf), 6)
            top = pd.DataFrame({"query_id": qid, "term": sub["term"],
                                "df_fg": dff, "lift_r": lift}) \
                .sort_values(["lift_r", "term"],
                             ascending=[False, True]).head(k)
            rows.append(top)
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "term": pa.array([], pa.string()),
                             "df_fg": pa.array([], pa.int64()),
                             "lift_r": pa.array([], pa.float64())})
        out = pd.concat(rows, ignore_index=True)
        return pa.table({
            "query_id": pa.array(out["query_id"].astype("int32")),
            "term": pa.array(out["term"].astype(object), pa.string()),
            "df_fg": pa.array(out["df_fg"].astype("int64")),
            "lift_r": pa.array(out["lift_r"].astype("float64")),
        })

    parts = (tokenized_ds.map_batches(df_partial, batch_format="pyarrow",
                                      zero_copy_batch=True)
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b").map_groups(combine, batch_format="pandas"))
    tables = [tt for tt in ray.get(_block_refs(parts)) if tt.num_rows]
    if not tables:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int32"),
                             "term": [], "df_fg":
                             pd.Series([], dtype="int64"),
                             "lift_r": pd.Series([], dtype="float64")})
    allp = pa.concat_tables(tables).to_pandas()
    out = (allp.sort_values(["lift_r", "term"], ascending=[False, True])
           .groupby("query_id", sort=True).head(k)
           .sort_values(["query_id", "term"]))
    return out[["query_id", "term", "df_fg", "lift_r"]].reset_index(
        drop=True)


def binned_quantiles(ds, *, key_col: str = "event_type",
                     value_col: str = "value",
                     qs: tuple = (0.5, 0.9, 0.99),
                     bin_width: float = 0.01):
    """Distributed quantiles via fixed-width bins — the deterministic
    alternative to sampling sketches: per-(key, bin) counts (Arrow C
    partial per block, bucketed pandas combine), then quantile(q) = the
    lower edge of the first bin whose cumulative count reaches
    ceil(q*n).  Exact to ``bin_width``, independent of row order and
    partitioning, and recomputable bit-exactly in SQL (floor/ceil
    double arithmetic only — no RNG, no interpolation).

    Output: (key, q, quantile), one row per key x q.
    """
    import math
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        tt = pa.table({key_col: t[key_col], "bin": pa.array(b)})
        g = tt.group_by([key_col, "bin"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "bin", "n_partial"])

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t[key_col].to_pandas()
                               .to_numpy(dtype=object))
        return t.append_column("__b",
                               pa.array((h % nb).astype(np.int32)))

    def combine(g: pd.DataFrame) -> pa.Table:
        rows = []
        for k, sub in g.groupby(key_col, sort=True):
            sub = (sub.groupby("bin", as_index=False)["n_partial"].sum()
                   .sort_values("bin"))
            cum = sub["n_partial"].cumsum().to_numpy()
            bins = sub["bin"].to_numpy()
            n = int(cum[-1])
            for q in qs:
                i = int(np.searchsorted(cum, math.ceil(q * n)))
                rows.append((k, float(q), float(bins[i] * bin_width)))
        return pa.table({key_col: pa.array([r[0] for r in rows]),
                         "q": pa.array([r[1] for r in rows], pa.float64()),
                         "quantile": pa.array([r[2] for r in rows],
                                              pa.float64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(combine, batch_format="pandas"))


def _bigram_counts(tokenized_ds):
    """Exact corpus-wide (pair, n) adjacent-bigram counts: per-block
    np.unique combiner (≤ one row per distinct bigram per block), then
    the bucketed :func:`salted_sum` reduce co-partitioned by bigram
    hash.  Shared by :func:`top_bigrams` / :func:`bigram_pmi`."""
    empty = pa.table({"pair": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens) \
            .to_numpy(zero_copy_only=False)
        if flat.size < 2:
            return empty
        same = parents[1:] == parents[:-1]
        a, b = flat[:-1][same], flat[1:][same]
        if a.size == 0:
            return empty
        # separator must survive numpy's fixed-width unicode cast
        # (\x00 is silently truncated as padding); tokens are
        # [a-z0-9]+ so a space can never collide
        pair = np.add(np.add(a, " "), b)           # object-str concat
        up, counts = np.unique(pair, return_counts=True)
        return pa.table({"pair": pa.array(up, pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    parts = tokenized_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    return salted_sum(parts, "pair", ["n"])


def top_bigrams(tokenized_ds, *, k: int = 20):
    """Corpus-wide top-k adjacent-token bigrams (reference analog: the
    summarize-json grouped histogram one level up — over token PAIRS).

    Scale shape: exact bigram counts from :func:`_bigram_counts`
    (block combiner + bucketed reduce), a per-bucket local top-k bounds
    what leaves each reducer, and the driver merges ≤ buckets×k tiny
    rows.  No all-to-all over occurrences, no dense vocab² anything.

    Returns pandas (term_a, term_b, n_pair) sorted by
    (n_pair desc, term_a, term_b), top k.
    """
    summed = _bigram_counts(tokenized_ds)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["n", "pair"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = summed.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    cand = cand.sort_values(["n", "pair"],
                            ascending=[False, True]).head(k)
    split = cand["pair"].str.split(" ", n=1, expand=True)
    out = pd.DataFrame({"term_a": split[0], "term_b": split[1],
                        "n_pair": cand["n"].astype("int64")})
    return out.reset_index(drop=True)


def tfidf_top_terms(tokenized_ds, n_docs: int, *, top: int = 3,
                    id_col: str = "doc_id"):
    """Per-document top terms by tf·idf, idf = ln(n_docs / df) — the
    keyword-extraction primitive of a training-data pipeline (what the
    reference's per-frame top-k class scores are to an image,
    base.py:134-146, this is to a document).

    Two keyed exchanges, both bounded: (doc, term, tf) rows (distinct
    per doc — each doc is one input row, so block-local tf IS global
    tf) groupby(term) to attach df, then groupby(doc) for the per-doc
    top-k.  df is attached IN the term groupby — no driver-side vocab
    broadcast, so the vocabulary can be arbitrarily large.

    Returns pandas (doc_id, rnk, term, tf, df, score_r) sorted by
    (doc_id, rnk); score_r = round(ln(n_docs/df) * tf, 6) with the
    idf-then-multiply association the SQL oracle uses.
    """
    from ..runtime import arrow_group

    def tf_partial(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens) \
            .to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if flat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        terms_u, codes = np.unique(flat, return_inverse=True)
        key = parents.astype(np.int64) * len(terms_u) + codes
        uk, counts = np.unique(key, return_counts=True)
        return pa.table({
            id_col: pa.array(ids[(uk // len(terms_u)).astype(np.int64)],
                             pa.int64()),
            "term": pa.array(terms_u[uk % len(terms_u)], pa.string()),
            "tf": pa.array(counts.astype(np.int64))})

    tf_rows = tokenized_ds.map_batches(tf_partial, batch_format="pyarrow",
                                       zero_copy_batch=True)

    def attach_df(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        g["df"] = np.int64(len(g))
        return arrow_group(g)

    with_df = tf_rows.groupby("term").map_groups(attach_df,
                                                 batch_format="pandas")

    def doc_topk(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        # rank on the UNROUNDED score (the oracle's row_number does),
        # round only for output
        g["score"] = (np.log(float(n_docs)
                             / g["df"].to_numpy(dtype=np.float64))
                      * g["tf"].to_numpy(dtype=np.float64))
        g = g.sort_values(["score", "term"],
                          ascending=[False, True]).head(top)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int32)
        g["score_r"] = np.round(g["score"].to_numpy(), 6)
        return arrow_group(g[[id_col, "rnk", "term", "tf", "df",
                              "score_r"]])

    out = with_df.groupby(id_col).map_groups(doc_topk,
                                             batch_format="pandas") \
        .to_pandas()
    return out.sort_values([id_col, "rnk"]).reset_index(drop=True)


def grouped_weighted_median(ds, *, group_cols: tuple, value_col: str,
                            weight_col: str, out_col: str = "wmedian"):
    """LOW weighted median per group: the smallest value ``v`` whose
    cumulative weight (values ascending) reaches half the group's
    total, i.e. ``2 * cumw(v) >= tot`` — the discrete estimator that
    stays integer-exact (no interpolation), so it carries a value-hash
    SQL oracle (one window cumsum + ``min(v)``), unlike
    percentile_cont-style interpolated medians whose float arithmetic
    is implementation-defined.

    Scale shape: a per-block partial groupby collapses the stream to
    one row per (group, value) — the combiner — then ONE hash(group)
    exchange; the per-bucket reduce is a single lexsort + segmented
    cumsum + first-hit scan, no per-group Python.  Rows per reducer =
    distinct values per group, bounded for currency/count domains (the
    intended use); for unbounded real domains use the
    ``binned_quantiles`` sketch instead.

    Returns pandas (``*group_cols``, ``out_col``) sorted by group.
    """
    from ..runtime import arrow_group, key_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    gcols = list(group_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gcols + [value_col, weight_col]).to_pandas()
        agg = df.groupby(gcols + [value_col], as_index=False,
                         sort=False)[weight_col].sum()
        key = agg[gcols[0]].astype(str)
        for c in gcols[1:]:
            key = key + "\x1f" + agg[c].astype(str)
        agg["__b"] = key_bucket_of(key.to_numpy(), nb)
        return arrow_group(agg)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def reduce(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(gcols + [value_col], as_index=False,
                        sort=False)[weight_col].sum()
        agg = agg.sort_values(gcols + [value_col]).reset_index(drop=True)
        if not len(agg):
            return arrow_group(agg[gcols + [value_col]].rename(
                columns={value_col: out_col}))
        codes = agg.groupby(gcols, sort=False).ngroup().to_numpy()
        w = agg[weight_col].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        cum = np.cumsum(w)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]],
                         np.diff(np.r_[starts, len(w)]))
        cumw = cum - base
        tot = np.repeat(np.add.reduceat(w, starts),
                        np.diff(np.r_[starts, len(w)]))
        hit = 2 * cumw >= tot
        # cumw is monotone and tot constant per group, so hit is a
        # suffix within each group: the minimal qualifying v sits at
        # starts + (#False in the group)
        n_false = np.add.reduceat((~hit).astype(np.int64), starts)
        first_hit = starts + n_false
        out = agg.iloc[first_hit][gcols + [value_col]].rename(
            columns={value_col: out_col})
        return arrow_group(out)

    out = parts.groupby("__b").map_groups(
        reduce, batch_format="pandas").to_pandas()
    return out.sort_values(gcols).reset_index(drop=True)


def grouped_mad_outliers(ds, *, group_cols: tuple, value_col: str,
                         id_col: str, k: int = 2,
                         med_col: str = "med", mad_col: str = "mad"):
    """Robust per-group outlier flags: rows where
    ``|v - median(group)| > k * MAD(group)`` with MAD the LOW median of
    absolute deviations — the data-cleaning filter that, unlike
    mean/stddev z-scores, is not dragged by the outliers it is hunting,
    and stays integer-exact end-to-end (low-median rule, integer k), so
    the flags hash-match a nested window-cumsum SQL oracle.

    Scale shape: ONE corpus scan builds (group, value, count) combiner
    partials (rows bounded by distinct values per group — the same
    bounded-domain contract as :func:`grouped_weighted_median`); ONE
    hash(group) exchange reduces median AND MAD together — the
    deviation histogram is a re-key of the already co-located value
    histogram, not a second exchange; the tiny (group, med, mad) table
    broadcasts via ``ray.put`` and a second corpus scan emits the
    flagged rows.  No stage ever holds more than a group's histogram.

    Returns a Dataset of (id_col, *group_cols, value_col, med_col,
    mad_col) — the flagged rows only.
    """
    import ray

    from ..runtime import arrow_group, key_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    gcols = list(group_cols)

    def _low_median(agg: pd.DataFrame, vcol: str) -> pd.DataFrame:
        agg = agg.sort_values(gcols + [vcol]).reset_index(drop=True)
        codes = agg.groupby(gcols, sort=False).ngroup().to_numpy()
        w = agg["__c"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        cum = np.cumsum(w)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]],
                         np.diff(np.r_[starts, len(w)]))
        tot = np.repeat(np.add.reduceat(w, starts),
                        np.diff(np.r_[starts, len(w)]))
        hit = 2 * (cum - base) >= tot
        first_hit = starts + np.add.reduceat((~hit).astype(np.int64),
                                             starts)
        return agg.iloc[first_hit][gcols + [vcol]]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gcols + [value_col]).to_pandas()
        agg = df.groupby(gcols + [value_col], as_index=False,
                         sort=False).size().rename(columns={"size": "__c"})
        key = agg[gcols[0]].astype(str)
        for c in gcols[1:]:
            key = key + "\x1f" + agg[c].astype(str)
        agg["__b"] = key_bucket_of(key.to_numpy(), nb)
        return arrow_group(agg)

    def med_mad(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(gcols + [value_col], as_index=False,
                        sort=False)["__c"].sum()
        if not len(agg):
            return arrow_group(pd.DataFrame(
                {c: pd.Series(dtype="object") for c in
                 gcols + [med_col, mad_col]}))
        med = _low_median(agg, value_col).rename(
            columns={value_col: med_col})
        agg = agg.merge(med, on=gcols)
        agg["__d"] = np.abs(agg[value_col].to_numpy(np.int64)
                            - agg[med_col].to_numpy(np.int64))
        dev = agg.groupby(gcols + ["__d"], as_index=False,
                          sort=False)["__c"].sum()
        mad = _low_median(dev, "__d").rename(columns={"__d": mad_col})
        return arrow_group(med.merge(mad, on=gcols))

    stats_df = (ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("__b").map_groups(med_mad,
                                           batch_format="pandas")
                .to_pandas())
    stats_ref = ray.put(stats_df)

    def flag(t: pa.Table) -> pa.Table:
        df = t.select([id_col] + gcols + [value_col]).to_pandas()
        df = df.merge(ray.get(stats_ref), on=gcols)
        keep = (np.abs(df[value_col].to_numpy(np.int64)
                       - df[med_col].to_numpy(np.int64))
                > k * df[mad_col].to_numpy(np.int64))
        return arrow_group(df.loc[keep].reset_index(drop=True))

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_trimmed_mean(ds, *, group_cols: tuple, value_col: str,
                         trim_frac: float = 0.1):
    """Trimmed mean per group: drop the ``floor(trim_frac * n)`` lowest
    and highest ROWS (by value) and average the rest — the robust
    location estimator between the mean (trim 0) and the median (trim
    0.5), integer-exact up to the single final division, so it carries
    a value-hash SQL oracle (row_number window + rank-band sum; ties at
    the cut are value-equal, so which tied row is dropped cannot change
    the sum).

    Scale shape: the :func:`grouped_weighted_median` plan — a per-block
    (group, value) count combiner, ONE hash(group) exchange, and a
    per-bucket vectorized kernel: per-group cumulative counts clip how
    much of each histogram bin the low/high trims consume
    (``clip(d - cum_before, 0, c)`` from both ends), so no row-level
    materialization ever happens on the reduce side.  Groups left empty
    by the trim (n - 2d <= 0) are dropped, matching the oracle's empty
    rank band.

    Returns pandas (*group_cols, n_kept, trimmed_sum, tmean) sorted by
    group; trimmed_sum int64, tmean = trimmed_sum / n_kept as one
    float64 division on both sides.
    """
    from ..runtime import arrow_group, key_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    gcols = list(group_cols)
    frac = float(trim_frac)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gcols + [value_col]).to_pandas()
        agg = df.groupby(gcols + [value_col], as_index=False,
                         sort=False).size().rename(columns={"size": "__c"})
        key = agg[gcols[0]].astype(str)
        for c in gcols[1:]:
            key = key + "\x1f" + agg[c].astype(str)
        agg["__b"] = key_bucket_of(key.to_numpy(), nb)
        return arrow_group(agg)

    def reduce(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(gcols + [value_col], as_index=False,
                        sort=False)["__c"].sum()
        agg = agg.sort_values(gcols + [value_col]).reset_index(drop=True)
        empty = pd.DataFrame({c: pd.Series(dtype="object")
                              for c in gcols}
                             | {"n_kept": pd.Series(dtype=np.int64),
                                "trimmed_sum": pd.Series(dtype=np.int64),
                                "tmean": pd.Series(dtype=np.float64)})
        if not len(agg):
            return arrow_group(empty)
        codes = agg.groupby(gcols, sort=False).ngroup().to_numpy()
        c = agg["__c"].to_numpy(np.int64)
        v = agg[value_col].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        counts = np.diff(np.append(starts, len(c)))
        n = np.repeat(np.add.reduceat(c, starts), counts)
        d = (n * frac).astype(np.int64)          # floor(trim_frac * n)
        cum = np.cumsum(c)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]], counts)
        cum_before = cum - base - c              # rows strictly below bin
        take_low = np.clip(d - cum_before, 0, c)
        # mirror: rows strictly above this bin = n - cum_before - c
        take_high = np.clip(d - (n - cum_before - c), 0, c)
        kept = c - take_low - take_high
        # a bin can be eaten from both ends when n - 2d < bin size
        kept = np.maximum(kept, 0)
        tsum = np.add.reduceat(kept * v, starts)
        tcnt = np.add.reduceat(kept, starts)
        out = agg.iloc[starts][gcols].reset_index(drop=True)
        out["n_kept"] = tcnt
        out["trimmed_sum"] = tsum
        keep = tcnt > 0
        out = out.loc[keep].reset_index(drop=True)
        out["tmean"] = (out["trimmed_sum"].to_numpy(np.float64)
                        / out["n_kept"].to_numpy(np.float64))
        return arrow_group(out if len(out) else empty)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(reduce, batch_format="pandas")
           .to_pandas())
    return out.sort_values(gcols).reset_index(drop=True)


def grouped_mode(ds, *, group_cols: tuple, value_col: str,
                 out_col: str = "mode", cnt_col: str = "mode_n"):
    """MODE per group: the most frequent value, ties broken by the
    smallest value — the categorical summarizer (dominant event type
    per user, dominant language per source).  Exact by construction
    (counts are integers, the tie rule is a total order), so it carries
    a value-hash SQL oracle (row_number over count desc, value asc).

    Scale shape: per-block (group, value) count combiner, ONE
    hash(group) exchange (a group's histogram co-locates), one lexsort
    per bucket picks each group's head row.  Rows per reducer =
    distinct (group, value) pairs in the bucket — the same
    bounded-value-domain contract as :func:`grouped_weighted_median`.

    Returns pandas (*group_cols, out_col, cnt_col) sorted by group.
    """
    from ..runtime import arrow_group, key_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    gcols = list(group_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gcols + [value_col]).to_pandas()
        agg = df.groupby(gcols + [value_col], as_index=False,
                         sort=False).size().rename(columns={"size": "__c"})
        key = agg[gcols[0]].astype(str)
        for c in gcols[1:]:
            key = key + "\x1f" + agg[c].astype(str)
        agg["__b"] = key_bucket_of(key.to_numpy(), nb)
        return arrow_group(agg)

    def reduce(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(gcols + [value_col], as_index=False,
                        sort=False)["__c"].sum()
        if not len(agg):
            return arrow_group(pd.DataFrame(
                {c: pd.Series(dtype="object")
                 for c in gcols + [out_col]}
                | {cnt_col: pd.Series(dtype=np.int64)}))
        agg = agg.sort_values(gcols + ["__c", value_col],
                              ascending=[True] * len(gcols)
                              + [False, True]).reset_index(drop=True)
        codes = agg.groupby(gcols, sort=False).ngroup().to_numpy()
        heads = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        out = agg.iloc[heads].rename(columns={value_col: out_col,
                                              "__c": cnt_col})
        return arrow_group(out[gcols + [out_col, cnt_col]])

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(reduce, batch_format="pandas")
           .to_pandas())
    return out.sort_values(gcols).reset_index(drop=True)


def grouped_topn_sum(ds, *, group_col: str, value_col: str, n: int,
                     sum_col: str = "topn_sum", n_col: str = "n_top"):
    """Sum of each group's n LARGEST values (SQL: sum over
    ``row_number() <= n`` ordered by value desc) — "revenue from each
    customer's top-3 orders"-style concentration features.  The sum is
    tie-safe without an id tiebreak: rows tied at the cut are
    value-equal, so any of them contributes the same amount.

    Scale shape: ZERO row-level shuffle of the full table — each block
    keeps its local top-n per group (the global top-n is a subset of
    the union of local top-ns) plus one (group, count) row, then ONE
    hash(group) exchange over those bounded partials; the per-bucket
    reduce is one lexsort + positional mask.

    Returns pandas (group_col, sum_col, n_col) sorted by group;
    n_col = min(n, group size).
    """
    from ..runtime import arrow_group, key_bucket_of, num_hash_buckets
    nb = num_hash_buckets(None)
    k = int(n)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([group_col, value_col]).to_pandas()
        if not len(df):
            return arrow_group(pd.DataFrame(
                {group_col: pd.Series(dtype="object"),
                 "__v": pd.Series(dtype=np.int64),
                 "__c": pd.Series(dtype=np.int64),
                 "__b": pd.Series(dtype=np.int32)}))
        grp = df[group_col].to_numpy()
        v = df[value_col].to_numpy(np.int64)
        _, codes = np.unique(grp, return_inverse=True)
        order = np.lexsort((-v, codes))
        starts = np.flatnonzero(np.r_[True, codes[order][1:]
                                      != codes[order][:-1]])
        gcounts = np.diff(np.append(starts, len(order)))
        pos = np.arange(len(order)) - np.repeat(starts, gcounts)
        keep = order[pos < k]
        top = pd.DataFrame({group_col: grp[keep], "__v": v[keep],
                            "__c": np.int64(0)})
        cnt = pd.DataFrame({group_col: grp[order][starts],
                            "__v": np.int64(0),
                            "__c": gcounts.astype(np.int64)})
        out = pd.concat([top, cnt], ignore_index=True)
        out["__b"] = key_bucket_of(out[group_col].to_numpy(), nb)
        return arrow_group(out)

    def reduce(g: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({group_col: pd.Series(dtype="object"),
                              sum_col: pd.Series(dtype=np.int64),
                              n_col: pd.Series(dtype=np.int64)})
        if not len(g):
            return arrow_group(empty)
        cnts = g.loc[g["__c"] > 0].groupby(group_col, sort=False) \
            ["__c"].sum()
        vals = g.loc[g["__c"] == 0]
        grp = vals[group_col].to_numpy()
        v = vals["__v"].to_numpy(np.int64)
        uniq, codes = np.unique(grp, return_inverse=True)
        order = np.lexsort((-v, codes))
        starts = np.flatnonzero(np.r_[True, codes[order][1:]
                                      != codes[order][:-1]]) \
            if len(order) else np.empty(0, np.int64)
        gcounts = np.diff(np.append(starts, len(order)))
        pos = np.arange(len(order)) - np.repeat(starts, gcounts)
        sel = pos < k
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, codes[order][sel], v[order][sel])
        out = pd.DataFrame({group_col: uniq, sum_col: sums})
        out[n_col] = np.minimum(
            cnts.reindex(uniq).fillna(0).to_numpy(np.int64), k)
        return arrow_group(out)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(reduce, batch_format="pandas")
           .to_pandas())
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_linregress(ds, *, group_cols: tuple, x_col: str,
                       y_col: str):
    """Per-group ordinary-least-squares slope/intercept and Pearson
    correlation over two INTEGER columns — the trend/association
    summary (price-vs-quantity slope per segment, value drift per
    cohort).  Exact where it matters: every moment (n, Σx, Σy, Σxy,
    Σx², Σy²) is an integer partial combined on the driver in
    arbitrary-precision Python ints (group cardinality is bounded by
    contract — the `_driver_combine` rule), and the final float64 chain
    is written in EXACTLY the operation order the SQL oracle uses, so
    each step is the same correctly-rounded IEEE op on both sides:

        num   = n·Σxy − Σx·Σy            (floats of exact ints)
        den   = n·Σx² − Σx·Σx
        slope = num / den
        icept = (Σy − slope·Σx) / n
        deny  = n·syy − Σy·Σy,  syy = float(hi)·2^32 + float(lo)
        corr  = num / (sqrt(den) · sqrt(deny))

    Σy² is carried as hi/lo int64 partials (y² can reach 1e14 per row;
    a block's Σy² would overflow int64 long before Σxy does) and
    reassembled via the identical two-float expression in SQL, so even
    the one conversion that exceeds 2^53 rounds identically.  sqrt is
    IEEE-correctly-rounded in both numpy and DuckDB (unlike ln/exp —
    measured 1-ulp libm drift, the reason this operator sticks to
    algebraic ops).  Groups with zero x-variance emit NULL slope/corr.

    Returns pandas (*group_cols, n, slope, icept, corr) sorted by
    group.
    """
    from ..runtime import arrow_group, block_refs
    import ray as _ray
    gcols = list(group_cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gcols + [x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        y2 = y * y
        df = df.assign(__n=np.int64(1), __sx=x, __sy=y, __sxy=x * y,
                       __sxx=x * x, __shi=y2 >> 32,
                       __slo=y2 & np.int64(0xFFFFFFFF))
        agg = df.groupby(gcols, as_index=False, sort=False)[
            ["__n", "__sx", "__sy", "__sxy", "__sxx", "__shi",
             "__slo"]].sum()
        return arrow_group(agg)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    tables = _ray.get(block_refs(parts))
    tables = [t for t in tables if t.num_rows] or tables[:1]
    df = pa.concat_tables(tables).to_pandas()
    rows = []
    for key, sub in df.groupby(gcols, sort=True):
        key = key if isinstance(key, tuple) else (key,)
        # exact arbitrary-precision combine, then one float chain
        n = int(sub["__n"].sum())
        sx, sy = int(sub["__sx"].sum()), int(sub["__sy"].sum())
        sxy, sxx = int(sub["__sxy"].sum()), int(sub["__sxx"].sum())
        shi, slo = int(sub["__shi"].sum()), int(sub["__slo"].sum())
        nf, sxf, syf = float(n), float(sx), float(sy)
        num = nf * float(sxy) - sxf * syf
        den = nf * float(sxx) - sxf * sxf
        syyf = float(shi) * 4294967296.0 + float(slo)
        deny = nf * syyf - syf * syf
        if den == 0.0:
            rows.append((*key, n, np.nan, np.nan, np.nan))
            continue
        slope = num / den
        icept = (syf - slope * sxf) / nf
        corr = (num / (np.sqrt(den) * np.sqrt(deny))
                if deny > 0.0 else np.nan)
        rows.append((*key, n, slope, icept, corr))
    return pd.DataFrame(rows, columns=gcols + ["n", "slope", "icept",
                                               "corr"]) \
        .sort_values(gcols).reset_index(drop=True)


def profile_table(ds, *, columns: list[str]):
    """Table profiling ("describe"): per column, the exact row count,
    null count, and distinct count — the first pass a data engineer
    runs over an unfamiliar corpus, and the reference's
    `media-attrs-summarize` (media-attrs-summarize.py:20-75) global
    stats generalized to every column.

    Exactness discipline: counts are trivially exact; the distinct
    count compares values through Arrow's string cast, which is
    injective per type (doubles render as shortest-roundtrip), so it
    equals SQL's count(DISTINCT col) without shipping values anywhere
    twice.  NULLs are excluded from distinct (the SQL rule).

    Scale shape: one scan emits, per block, one (col, n, n_null)
    count row per column plus the block's DISTINCT (col, value-string)
    pairs — the dedup combiner — then ONE hash(col, value) exchange
    dedups globally per bucket and collapses to ≤ columns rows per
    bucket before a tiny driver sum.  The driver never sees values,
    only per-bucket distinct counts.

    Returns pandas (col, n, n_null, n_distinct) sorted by col.
    """
    from ..runtime import arrow_group, num_hash_buckets
    nb = num_hash_buckets(None)

    def partial(t: pa.Table) -> pa.Table:
        col_a, val_a, n_a, nn_a, k_a = [], [], [], [], []
        for c in columns:           # per COLUMN, not per row/value
            col = t[c]
            u = pc.unique(pc.cast(col.combine_chunks().drop_null(),
                                  pa.string())) \
                .to_numpy(zero_copy_only=False)
            m = len(u)
            col_a.append(np.full(m + 1, c, object))
            val_a.append(np.r_[np.array([""], object), u])
            n_a.append(np.r_[np.int64(len(col)), np.zeros(m, np.int64)])
            nn_a.append(np.r_[np.int64(col.null_count),
                              np.zeros(m, np.int64)])
            k_a.append(np.r_[np.int8(0), np.ones(m, np.int8)])
        out = pd.DataFrame({"col": np.concatenate(col_a),
                            "val": np.concatenate(val_a),
                            "n": np.concatenate(n_a),
                            "n_null": np.concatenate(nn_a),
                            "kind": np.concatenate(k_a)})
        h = pd.util.hash_array((out["col"] + "\x1f"
                                + out["val"]).to_numpy(object))
        out["__b"] = (h % nb).astype(np.int32)
        return arrow_group(out)

    def reduce(g: pd.DataFrame) -> pa.Table:
        nd = g.loc[g["kind"] == 1].drop_duplicates(["col", "val"]) \
            .groupby("col").size().rename("n_distinct")
        cnt = g.loc[g["kind"] == 0].groupby("col")[
            ["n", "n_null"]].sum()
        out = cnt.join(nd, how="outer").fillna(0).reset_index()
        for c in ("n", "n_null", "n_distinct"):
            out[c] = out[c].astype(np.int64)
        return arrow_group(out)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("__b").map_groups(reduce, batch_format="pandas")
           .to_pandas())
    out = out.groupby("col", as_index=False)[
        ["n", "n_null", "n_distinct"]].sum()
    return out.sort_values("col").reset_index(drop=True)


def vocab_growth(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 n_checkpoints: int = 10):
    """Heaps-law vocabulary-growth curve: distinct-term count among the
    first ``⌊N·i/k⌋`` documents (ordered by ``id_col``) for i = 1..k —
    the corpus-analysis report that sizes a tokenizer vocabulary and
    spots crawl saturation (new data adding no new vocabulary).

    Physical plan (exact, no corpus-sized driver state):

    1. per-block (term, min id) partials — one np.unique + one
       ``minimum.reduceat`` per block, one output row per distinct term
       per block;
    2. bucket by hash(term) + per-bucket vectorized min → the global
       first-seen id per term;
    3. checkpoint BOUNDARY ids come from a distributed ``sort(id)`` +
       :func:`~vframe_ray.stages.scan.global_prefix_scan` rank — only
       the k boundary rows ever reach the driver;
    4. per-block k-bin histogram of first-seen vs the broadcast
       boundaries, driver-combined (k-row result) and cumsummed.

    Returns pandas (checkpoint, n_docs, vocab) with checkpoint = 1..k.
    """
    from ..analyze import Tokenizer
    from ..runtime import num_hash_buckets
    from .scan import global_prefix_scan
    nb = num_hash_buckets()
    tok = Tokenizer()
    k = int(n_checkpoints)

    def first_seen_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tokens = tok.tokenize_array(t[text_col])
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens) \
            .to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table({"term": pa.array([], pa.string()),
                             "first_p": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        terms, codes = np.unique(flat, return_inverse=True)
        order = np.argsort(codes, kind="stable")
        doc_of = ids[parents][order]
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(codes[order]))[0] + 1])
        firsts = np.minimum.reduceat(doc_of, starts)
        h = pd.util.hash_array(terms.astype(object))
        return pa.table({"term": pa.array(terms.astype(object),
                                          pa.string()),
                         "first_p": pa.array(firsts),
                         "__b": pa.array((h % nb).astype(np.int32))})

    def bucket_min(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("term", as_index=False, sort=False)[
            "first_p"].min()
        return pa.table({"term": pa.array(agg["term"].to_numpy(object),
                                          pa.string()),
                         "first": pa.array(
                             agg["first_p"].to_numpy(np.int64))})

    first_seen = (ds.map_batches(first_seen_partial,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
                  .groupby("__b").map_groups(bucket_min,
                                             batch_format="pandas"))

    # checkpoint boundary ids: rank via sort + prefix scan of a ones col
    ids_ds = ds.map_batches(
        lambda t: pa.table({id_col: t[id_col],
                            "one": pa.array(np.ones(t.num_rows,
                                                    dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True).sort(id_col)
    scanned, grand = global_prefix_scan(ids_ds, ["one"])
    n = int(grand[0])
    targets = np.unique((np.arange(1, k + 1, dtype=np.int64) * n) // k)
    targets = targets[targets >= 1]

    def pick(t: pa.Table) -> pa.Table:
        rn = t["cum_one"].to_numpy(zero_copy_only=False)
        keep = np.isin(rn, targets)
        return pa.table({"rn": pa.array(rn[keep]),
                         "bid": pa.array(t[id_col].to_numpy(
                             zero_copy_only=False)[keep]
                             .astype(np.int64))})

    bdf = scanned.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas() \
        .sort_values("rn")
    bounds = bdf["bid"].to_numpy(np.int64)        # ascending with rn

    def hist_partial(t: pa.Table) -> pa.Table:
        f = t["first"].to_numpy(zero_copy_only=False)
        # bin j counts terms with bounds[j-1] < first <= bounds[j]
        idx = np.searchsorted(bounds, f, side="left")
        cnt = np.bincount(idx, minlength=len(bounds))[:len(bounds)]
        return pa.table({"bin": pa.array(np.arange(len(bounds),
                                                   dtype=np.int64)),
                         "n_p": pa.array(cnt.astype(np.int64))})

    hp = first_seen.map_batches(hist_partial, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    hist = hp.groupby("bin", sort=True)["n_p"].sum() \
        .reindex(range(len(bounds)), fill_value=0).to_numpy(np.int64)
    vocab = np.cumsum(hist)
    rn = bdf["rn"].to_numpy(np.int64)
    # map back to checkpoint index i (duplicate targets collapse to the
    # same rank when n < k; report one row per DISTINCT rank)
    return pd.DataFrame({
        "n_docs": rn.astype("int64"),
        "vocab": vocab.astype("int64"),
    })


def bigram_pmi(tokenized_ds, *, k: int = 20, min_count: int = 5):
    """Collocation strength: pointwise mutual information over
    adjacent-token bigram EVENTS — PMI(a,b) = ln(n_ab·T / (n_a?·n_?b))
    with T = total bigrams, n_a? = bigrams with ``a`` on the left,
    n_?b = with ``b`` on the right.  Ranks fixed phrases ("new york")
    above frequent-but-independent pairs, the standard collocation
    score (Church & Hanks 1990).

    Fully distributed: exact pair counts from :func:`_bigram_counts`,
    marginals via two more :func:`salted_sum` reduces over the PAIR
    table (distinct-bigram-bounded, never occurrence-sized), marginals
    attached with two ``hash_join`` exchanges, then a per-block local
    top-k so the driver merges ≤ blocks×k rows.  All counts are exact
    int64; the ONLY float work is the final ln expression, reproduced
    verbatim by the SQL oracle.

    Returns pandas (term_a, term_b, n_pair, pmi_r) — pairs with
    n_pair ≥ min_count, top-k by (pmi_r desc, term_a, term_b).
    """
    from ray.data.aggregate import Sum as _Sum
    from .joins import hash_join
    summed = _bigram_counts(tokenized_ds)
    total = int(summed.aggregate(_Sum("n", alias_name="t"))["t"] or 0)

    def split_cols(t: pa.Table) -> pa.Table:
        sp = pc.split_pattern(t["pair"], " ", max_splits=1)
        return pa.table({"term_a": pc.list_element(sp, 0),
                         "term_b": pc.list_element(sp, 1),
                         "n_pair": t["n"]})

    # three consumers (two marginal reduces + the filtered join input)
    # would each re-execute the count lineage — pin the REDUCED pair
    # table (distinct bigrams, the compact representation; spills to
    # the object store if huge) once instead
    pairs = summed.map_batches(split_cols, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    left = salted_sum(pairs.map_batches(
        lambda t: pa.table({"term_a": t["term_a"],
                            "n_left": t["n_pair"]}),
        batch_format="pyarrow", zero_copy_batch=True),
        "term_a", ["n_left"])
    right = salted_sum(pairs.map_batches(
        lambda t: pa.table({"term_b": t["term_b"],
                            "n_right": t["n_pair"]}),
        batch_format="pyarrow", zero_copy_batch=True),
        "term_b", ["n_right"])
    # marginals/T above are over ALL bigrams; pairs below min_count can
    # never reach the output, so drop them BEFORE the two join
    # exchanges — at a Zipfian corpus the overwhelming majority of
    # distinct bigrams are singletons (measured 3.1× on the whole
    # pipeline at 600k turns)
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_pair"], min_count)),
        batch_format="pyarrow", zero_copy_batch=True)
    sch_p = pa.schema([("term_a", pa.string()), ("term_b", pa.string()),
                       ("n_pair", pa.int64())])
    j1 = hash_join(pairs, left, key="term_a",
                   left_cols=["term_a", "term_b", "n_pair"],
                   right_cols=["n_left"], left_schema=sch_p,
                   right_schema=pa.schema([("term_a", pa.string()),
                                           ("n_left", pa.int64())]))
    sch_j1 = pa.schema([("term_a", pa.string()), ("term_b", pa.string()),
                        ("n_pair", pa.int64()), ("n_left", pa.int64())])
    j2 = hash_join(j1, right, key="term_b",
                   left_cols=["term_a", "term_b", "n_pair", "n_left"],
                   right_cols=["n_right"], left_schema=sch_j1,
                   right_schema=pa.schema([("term_b", pa.string()),
                                           ("n_right", pa.int64())]))

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["n_pair"] >= min_count]
        if not len(df):
            return pa.table({"term_a": pa.array([], pa.string()),
                             "term_b": pa.array([], pa.string()),
                             "n_pair": pa.array([], pa.int64()),
                             "pmi_r": pa.array([], pa.float64())})
        nb = df["n_pair"].to_numpy(np.int64).astype(np.float64)
        na = df["n_left"].to_numpy(np.int64).astype(np.float64)
        nc = df["n_right"].to_numpy(np.int64).astype(np.float64)
        pmi = np.round(np.log((nb * float(total)) / (na * nc)), 6)
        out = pd.DataFrame({"term_a": df["term_a"].to_numpy(object),
                            "term_b": df["term_b"].to_numpy(object),
                            "n_pair": df["n_pair"].to_numpy(np.int64),
                            "pmi_r": pmi})
        out = out.sort_values(["pmi_r", "term_a", "term_b"],
                              ascending=[False, True, True]).head(k)
        return pa.table({"term_a": pa.array(out["term_a"], pa.string()),
                         "term_b": pa.array(out["term_b"], pa.string()),
                         "n_pair": pa.array(
                             out["n_pair"].to_numpy(np.int64)),
                         "pmi_r": pa.array(
                             out["pmi_r"].to_numpy(np.float64))})

    cand = j2.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    return cand.sort_values(["pmi_r", "term_a", "term_b"],
                            ascending=[False, True, True]).head(k) \
        .reset_index(drop=True)


def term_burstiness(tokenized_ds, n_docs: int, *, k: int = 20):
    """Term burstiness: variance-to-mean ratio of per-document term
    frequency over ALL docs (zeros included) for the top-k cf terms —
    separates topical terms (bursty: absent from most docs, frequent
    where present) from function words (VMR ≈ uniform).  Church &
    Gale's burstiness diagnostic, a standard stopword/keyword signal.

    Exact integer moments per term — Σtf and Σtf² from one per-block
    np.unique combiner, reduced by :func:`salted_sum` — so partitioning
    cannot drift the value; mean = Σtf/N, E[x²] = Σtf²/N,
    VMR = (E[x²] − mean²)/mean is the single float expression the SQL
    oracle reproduces.  Returns pandas (term, cf, sum_sq, vmr_r),
    top-k by (cf desc, term), sorted the same way.
    """
    def partial(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"].combine_chunks()
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens) \
            .to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table({"term": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64())})
        terms, codes = np.unique(flat, return_inverse=True)
        # per (term, doc) tf: docs are whole rows of THIS block, so
        # block-local tf is global tf — pair-code bincount
        ndocs_blk = int(parents.max()) + 1
        pair = codes.astype(np.int64) * ndocs_blk + parents
        upair, tf = np.unique(pair, return_counts=True)
        tcode = (upair // ndocs_blk).astype(np.int64)
        cf = np.bincount(tcode, weights=tf,
                         minlength=len(terms)).astype(np.int64)
        sq = np.bincount(tcode, weights=tf.astype(np.int64) ** 2,
                         minlength=len(terms)).astype(np.int64)
        return pa.table({"term": pa.array(terms.astype(object),
                                          pa.string()),
                         "cf": pa.array(cf), "sq": pa.array(sq)})

    parts = tokenized_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    summed = salted_sum(parts, "term", ["cf", "sq"])

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["cf", "term"],
                                       ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = summed.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas().sort_values(["cf", "term"],
                                 ascending=[False, True]).head(k)
    cf = cand["cf"].to_numpy(np.int64).astype(np.float64)
    sq = cand["sq"].to_numpy(np.int64).astype(np.float64)
    n = float(n_docs)
    mean = cf / n
    vmr = np.round((sq / n - mean * mean) / mean, 6)
    return pd.DataFrame({"term": cand["term"].to_numpy(object),
                         "cf": cand["cf"].to_numpy(np.int64),
                         "sum_sq": cand["sq"].to_numpy(np.int64),
                         "vmr_r": vmr}).reset_index(drop=True)


def zipf_fit(tokenized_ds, *, top_v: int = 100):
    """Zipf exponent of the corpus: OLS slope of ln(cf) on ln(rank)
    over the top ``top_v`` terms by collection frequency — the one-row
    corpus health number (natural text ≈ −1; templated/boilerplate
    corpora flatten, spam steepens).

    The heavy part — exact term cf — is the distributed
    :func:`term_stats` reduce with a per-bucket local top-k, so the
    driver sees ≤ buckets×top_v rows; the ln/OLS epilogue runs over
    top_v values with the same float expression the SQL oracle uses.

    Returns pandas with one row: (n_terms, alpha_r, intercept_r)."""
    summed = term_stats(tokenized_ds)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["cf", "term"],
                                       ascending=[False, True]) \
            .head(top_v)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = summed.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas().sort_values(["cf", "term"],
                                 ascending=[False, True]).head(top_v)
    v = len(cand)
    if not v:
        return pd.DataFrame({"n_terms": pd.array([0], dtype="int64"),
                             "alpha_r": [float("nan")],
                             "intercept_r": [float("nan")]})
    x = np.log(np.arange(1, v + 1, dtype=np.float64))
    y = np.log(cand["cf"].to_numpy(np.int64).astype(np.float64))
    vf = float(v)
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = (vf * sxy - sx * sy) / (vf * sxx - sx * sx)
    icept = (sy - slope * sx) / vf
    return pd.DataFrame({"n_terms": pd.array([v], dtype="int64"),
                         "alpha_r": [round(-slope, 6)],
                         "intercept_r": [round(icept, 6)]})


def quality_mix_report(ds, *, k: int = 5, id_col: str = "doc_id",
                       text_col: str = "text",
                       source_col: str = "source") -> "pd.DataFrame":
    """Training-mix report: document and token counts per (source,
    quality-tile) — the "what is actually in my training mix" table a
    data curator reads before setting sampling weights.  Quality =
    per-doc byte entropy (the boilerplate detector of
    :func:`~vframe_ray.stages.textquality.char_entropy`); tiles are a
    GLOBAL NTILE(k) over (entropy desc, id) with the SQL
    remainder-to-leading-tiles rule.

    Composes three exact primitives with no new shuffle machinery:
    the entropy+token kernel (one zero-shuffle map), a distributed
    sort + :func:`~vframe_ray.stages.scan.global_prefix_scan` rank
    (only O(blocks) scalars touch the driver), and per-block
    (source, tile) partials driver-combined (≤ sources·k·blocks
    rows).  The sort key is the ROUNDED entropy (6 dp) — the value
    engine and SQL agree on exactly — with id tie-breaks.

    Returns pandas (source, tile, n_docs, n_tokens) sorted.
    """
    from ..analyze import Tokenizer
    from .scan import global_prefix_scan
    from .textquality import _string_bytes

    def features(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        texts = pc.fill_null(t[text_col].combine_chunks()
                             if isinstance(t[text_col], pa.ChunkedArray)
                             else t[text_col], "")
        nrows = t.num_rows
        counts = tok.doc_lengths(tok.tokenize_array(texts)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        data, lens = _string_bytes(texts)
        if len(data):
            row_idx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            cnt = np.bincount(row_idx * 256 + data.astype(np.int64),
                              minlength=nrows * 256).reshape(nrows, 256)
            n = lens.astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                clogc = np.where(cnt > 0, cnt * np.log(
                    np.where(cnt > 0, cnt, 1)), 0.0).sum(axis=1)
                ent = np.where(lens > 0,
                               np.log(np.where(lens > 0, lens, 1))
                               - clogc / np.where(n > 0, n, 1.0), 0.0)
        else:
            ent = np.zeros(nrows, np.float64)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            source_col: t[source_col],
            "n_tokens": pa.array(counts),
            "ent_r": pa.array(np.round(ent, 6), pa.float64()),
            "one": pa.array(np.ones(nrows, np.int64))})

    feats = ds.map_batches(features, batch_format="pyarrow",
                           zero_copy_batch=True)
    ranked = feats.sort(["ent_r", id_col], descending=[True, False])
    scanned, grand = global_prefix_scan(ranked, ["one"])
    n = int(grand[0])

    def _ntile(ranks: np.ndarray) -> np.ndarray:
        # SQL NTILE(k): first n%k tiles get one extra row
        q, rem = divmod(n, k)
        head = rem * (q + 1)
        safe_q = max(q, 1)
        return np.where(ranks <= head,
                        (ranks - 1) // (q + 1) + 1,
                        rem + (ranks - head - 1) // safe_q + 1) \
            .astype(np.int64)

    def tile_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({source_col: pa.array([], pa.string()),
                             "tile": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        rank = t["cum_one"].to_numpy(zero_copy_only=False)
        g = pa.table({source_col: t[source_col],
                      "tile": pa.array(_ntile(rank)),
                      "n_tokens": t["n_tokens"]}) \
            .group_by([source_col, "tile"]) \
            .aggregate([([], "count_all"), ("n_tokens", "sum")])
        return g.rename_columns([source_col, "tile", "n_docs",
                                 "n_tokens"])

    parts = scanned.map_batches(tile_partial, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    out = parts.groupby([source_col, "tile"], as_index=False) \
        .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
    return out.sort_values([source_col, "tile"]).reset_index(drop=True)


def mix_weights(ds, *, alpha: float = 0.7, id_col: str = "doc_id",
                text_col: str = "text",
                source_col: str = "source") -> "pd.DataFrame":
    """Temperature-scaled sampling weights per source — the multinomial
    mix table of multi-corpus training (alpha < 1 upweights small
    sources, the standard smoothing): w_s = n_s^alpha / Σ_t n_t^alpha
    over per-source TOKEN counts.

    One zero-shuffle map emits per-block (source, n_tokens) partials;
    :func:`salted_sum` reduces them; the |sources|-row epilogue
    (power + normalize) runs on the driver, mirrored verbatim in SQL.
    Returns pandas (source, n_tokens, weight_r) sorted by source.
    """
    from ..analyze import Tokenizer

    def partial(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        n = tok.doc_lengths(tok.tokenize_array(
            pc.fill_null(t[text_col], ""))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({source_col: t[source_col],
                      "n": pa.array(n)}) \
            .group_by(source_col).aggregate([("n", "sum")])
        return g.rename_columns([source_col, "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = salted_sum(parts, source_col, ["n"]).to_pandas()
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    p = np.power(n, alpha)
    w = np.round(p / p.sum(), 6)
    out = pd.DataFrame({source_col: agg[source_col].to_numpy(object),
                        "n_tokens": agg["n"].to_numpy(np.int64),
                        "weight_r": w})
    return out.sort_values(source_col).reset_index(drop=True)
