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
    """Generic skew-safe Sum aggregation: two-stage groupby with a
    per-batch salt column so no reducer receives every row of a hot key.

    Stage 1 groups by (key, salt) — a hot key's rows split across up to
    ``salt_factor`` reducers; stage 2 merges the ≤ salt_factor partials.
    """
    def _salt(batch: pa.Table) -> pa.Table:
        first = str(batch[key][0]) if batch.num_rows else ""
        sv = int(pd.util.hash_array(np.array([first], dtype=object))[0]
                 % salt_factor)
        return batch.append_column(
            "salt", pa.array(np.full(batch.num_rows, sv, dtype=np.int32)))

    salted = ds.map_batches(_salt, batch_format="pyarrow", zero_copy_batch=True)
    stage1 = salted.groupby([key, "salt"]).aggregate(
        *[Sum(c, alias_name=f"{c}_s") for c in cols])
    return stage1.groupby(key).aggregate(
        *[Sum(f"{c}_s", alias_name=c) for c in cols])


def term_stats(tokenized_ds, salt_factor: int = 16):
    """tokens Dataset -> Dataset(term, df, cf) via salted two-phase agg.

    Stage 1 keys partials by (term, salt) purely so no single reducer
    receives a hot term's every partial at once; stage 2 merges the
    ≤ salt_factor rows per term.
    """
    partials = tokenized_ds.map_batches(
        TermDFPartial(salt_factor), batch_format="pyarrow",
        zero_copy_batch=True)
    salted = partials.groupby(["term", "salt"]).aggregate(
        Sum("df_partial", alias_name="df_s"),
        Sum("cf_partial", alias_name="cf_s"))
    return salted.groupby("term").aggregate(
        Sum("df_s", alias_name="df"),
        Sum("cf_s", alias_name="cf"))


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
