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
