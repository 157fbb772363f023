"""Document chunking and sequence packing — the two reshaping steps
every LLM training-data pipeline runs between raw documents and model
batches (the text analog of the reference's frame sampling /
save-video container regrouping, media.py:343-384).

Both operators are deterministic and SQL-mirrorable, so they carry
exact DuckDB oracles like every other ``queries()`` entry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analyze import Tokenizer
from ..config import AnalyzerConfig


def chunk_documents(ds, *, size: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text",
                    cfg: AnalyzerConfig | None = None):
    """Split each document into token-window chunks: chunk ``i`` covers
    analyzed tokens ``[i*stride, i*stride + size)`` for every start
    below the doc's token count (so tail chunks may be short and a
    0-token doc yields no chunks).  Overlap = ``size - stride``.

    Vectorized: one ``tokenize_array`` per batch, then one
    ``pc.list_slice`` + ``binary_join`` per CHUNK ORDINAL (a small
    bounded loop over ceil(max_len/stride) values, never over rows).
    Streams block-by-block; output rows ≈ input tokens / stride.

    Returns a Dataset of (id_col, chunk_idx, n_tokens, chunk_text).
    """
    tok = Tokenizer(cfg)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "chunk_idx": pa.array([], pa.int32()),
                      "n_tokens": pa.array([], pa.int64()),
                      "chunk_text": pa.array([], pa.string())})

    def stage(batch: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(batch[text_col])
        n = pc.list_value_length(tokens).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = batch[id_col]
        if n.size == 0 or int(n.max()) == 0:
            return empty
        out = []
        max_chunks = int(-(-(int(n.max())) // stride))
        for ci in range(max_chunks):
            keep = n > ci * stride
            if not keep.any():
                break
            mask = pa.array(keep)
            sliced = pc.list_slice(tokens.filter(mask), ci * stride,
                                   ci * stride + size)
            out.append(pa.table({
                id_col: ids.filter(mask),
                "chunk_idx": pa.array(
                    np.full(int(keep.sum()), ci, dtype=np.int32)),
                "n_tokens": pc.cast(pc.list_value_length(sliced),
                                    pa.int64()),
                "chunk_text": pc.binary_join(
                    pc.cast(sliced, pa.list_(pa.string())), " "),
            }))
        return pa.concat_tables(out)

    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)


def pack_sequences(ds, *, budget: int = 512, group_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   cfg: AnalyzerConfig | None = None,
                   split_id_width: int | None = None):
    """Greedy sequential sequence packing: within each ``group_col``
    (documents ordered by ``id_col``), a doc joins sequence
    ``prior_tokens // budget`` where ``prior_tokens`` is the running
    token total BEFORE it — the deterministic streaming packer
    (sequences fill to ≥ budget then roll over; a window cumsum, so the
    exact same rule is one SQL window expression).

    Default plan: per-group ``map_groups`` — the only exchange is the
    groupby(``group_col``) shuffle; the cumsum inside a group is
    sequential by definition (np.cumsum, no Python loop).  Assumes a
    group's docs fit one reducer.

    ``split_id_width`` is the giant-group escape hatch (two-pass plan):
    docs are sliced by ``id_col // split_id_width`` — monotone in the
    pack order, so every doc of slice s packs before every doc of slice
    s+1.  Pass 1 computes per-(group, slice) token totals (tiny: one
    int per slice), the driver prefix-sums them into per-slice carried
    offsets, and pass 2 co-partitions by hash(group, slice) and runs
    the same cumsum per slice with the carried offset added.  Output is
    IDENTICAL to the single-reducer path (pytest-asserted), but no
    reducer ever holds more than one slice of any group — a dominant
    ``source`` at the 100-TB design point streams through
    group_tokens/split-width reducers instead of one.

    Returns a Dataset of (id_col, group_col, n_tokens, seq_id).
    """
    from ..runtime import arrow_group

    tok = Tokenizer(cfg)

    def count_tokens(batch: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(batch[text_col])
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            "n_tokens": pc.cast(pc.list_value_length(tokens), pa.int64()),
        })

    counted = ds.map_batches(count_tokens, batch_format="pyarrow",
                             zero_copy_batch=True)

    if split_id_width is None:
        def pack(g: pd.DataFrame) -> pa.Table:
            g = g.sort_values(id_col).reset_index(drop=True)
            n = g["n_tokens"].to_numpy(dtype=np.int64)
            prior = np.cumsum(n) - n
            g["seq_id"] = prior // budget
            return arrow_group(g[[id_col, group_col, "n_tokens",
                                  "seq_id"]])

        return counted.groupby(group_col).map_groups(
            pack, batch_format="pandas")

    # ---- giant-group pre-split path ----
    import ray
    from ..runtime import block_refs, num_hash_buckets, pair_bucket_of
    nb = num_hash_buckets(None)
    W = int(split_id_width)
    # counted feeds both passes; materialize so tokenization runs once
    # (3 narrow columns — the object store spills if needed)
    counted = counted.materialize()

    def slice_of(t: pa.Table) -> np.ndarray:
        return (t[id_col].to_numpy(zero_copy_only=False)
                .astype(np.int64) // W)

    # pass 1: per-(group, slice) token totals, block-level Arrow
    # partials -> tiny driver combine (≤ groups × occupied slices rows)
    def totals(t: pa.Table) -> pa.Table:
        t = t.append_column("__slice", pa.array(slice_of(t)))
        g = t.group_by([group_col, "__slice"]).aggregate(
            [("n_tokens", "sum")])
        return g.rename_columns([group_col, "__slice", "tok_p"])

    parts = counted.map_batches(totals, batch_format="pyarrow",
                                zero_copy_batch=True)
    tabs = ray.get(block_refs(parts))
    tabs = [t for t in tabs if t.num_rows] or tabs[:1]
    tot = pa.concat_tables(tabs).group_by([group_col, "__slice"]) \
        .aggregate([("tok_p", "sum")]).to_pandas()
    tot.columns = [group_col, "__slice", "tok"]
    tot = tot.sort_values([group_col, "__slice"]).reset_index(drop=True)
    cum = tot.groupby(group_col, sort=False)["tok"].cumsum()
    tot["__offset"] = (cum - tot["tok"]).astype(np.int64)
    offsets_ref = ray.put(tot[[group_col, "__slice", "__offset"]])

    # pass 2: co-partition by hash(group, slice); per bucket one
    # vectorized segmented cumsum with the carried offset
    def add_bucket(t: pa.Table) -> pa.Table:
        sl = slice_of(t)
        gh = pd.util.hash_array(
            t[group_col].to_pandas().to_numpy(dtype=object)) \
            .astype(np.int64)
        return pa.table({
            "__b": pa.array(pair_bucket_of(gh, sl, nb)),
            "__slice": pa.array(sl),
            id_col: t[id_col], group_col: t[group_col],
            "n_tokens": t["n_tokens"]})

    def pack_sliced(g: pd.DataFrame) -> pa.Table:
        g = g.merge(ray.get(offsets_ref), on=[group_col, "__slice"]) \
            .sort_values([group_col, "__slice", id_col]) \
            .reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        cs = np.cumsum(n)
        seg = (g[group_col].ne(g[group_col].shift())
               | g["__slice"].ne(g["__slice"].shift())).to_numpy()
        starts = np.flatnonzero(seg)
        counts = np.diff(np.append(starts, len(g)))
        base = np.repeat(cs[starts] - n[starts], counts)
        prior = g["__offset"].to_numpy(np.int64) + (cs - base) - n
        g["seq_id"] = prior // budget
        return arrow_group(g[[id_col, group_col, "n_tokens", "seq_id"]])

    return (counted.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("__b").map_groups(pack_sliced,
                                       batch_format="pandas"))


def duplicate_chunk_fraction(ds, *, size: int = 16,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             cfg: AnalyzerConfig | None = None):
    """Cross-document chunk-level duplication: split every doc into
    NON-OVERLAPPING ``size``-token chunks and report, per doc, the
    fraction of its chunks whose text also appears in ≥ 1 OTHER doc —
    the chunk-granularity contamination/near-copy signal (C4/Gopher
    style dedup diagnostics at sub-document resolution).

    Two bounded exchanges:
    1. chunks co-partition by hash(chunk_text) buckets; inside a bucket
       duplicates are decided by grouping on the TEXT itself, so a
       64-bit hash collision can never create a false duplicate (it
       only co-locates two innocent groups).  Each bucket emits ≤ one
       partial row per (doc, bucket): chunk + duplicate counts.
    2. partials co-partition by hash(doc) and sum; the final division
       is one float64 op, matching the SQL oracle bit-for-bit.

    Returns a Dataset of (id_col, n_chunks, dup_chunk_frac) — docs
    with zero chunks (empty text) emit no row; callers needing them
    left-join the doc table (see ``__ray_entry__``)."""
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from .hashing import dict_hash_u64
    nb = num_hash_buckets(None)
    chunks = chunk_documents(ds, size=size, stride=size, id_col=id_col,
                             text_col=text_col, cfg=cfg)

    def bucket_by_chunk(t: pa.Table) -> pa.Table:
        ct = t["chunk_text"]
        if isinstance(ct, pa.ChunkedArray):
            ct = ct.combine_chunks()
        h = dict_hash_u64(ct)
        return pa.table({"__b": pa.array(int_bucket_of(h, nb)),
                         id_col: t[id_col], "chunk_text": ct})

    def mark(g: pd.DataFrame) -> pa.Table:
        dup = g.groupby("chunk_text", sort=False)[id_col] \
            .transform("nunique").to_numpy() >= 2
        part = pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                             "dup": dup.astype(np.int64)})
        agg = part.groupby(id_col, as_index=False, sort=False).agg(
            n_chunks_p=("dup", "size"), n_dup_p=("dup", "sum"))
        return arrow_group(agg)

    parts = (chunks.map_batches(bucket_by_chunk, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("__b").map_groups(mark, batch_format="pandas"))

    def bucket_by_doc(t: pa.Table) -> pa.Table:
        k = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b2", pa.array(int_bucket_of(k, nb)))

    def combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(id_col, as_index=False, sort=False).agg(
            n_chunks=("n_chunks_p", "sum"), n_dup=("n_dup_p", "sum"))
        agg["n_chunks"] = agg["n_chunks"].astype(np.int64)
        agg["dup_chunk_frac"] = (agg["n_dup"].to_numpy(np.int64)
                                 / agg["n_chunks"].to_numpy(np.int64))
        return arrow_group(agg[[id_col, "n_chunks", "dup_chunk_frac"]])

    return (parts.map_batches(bucket_by_doc, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("__b2").map_groups(combine, batch_format="pandas"))


def dup_span_coverage(ds, *, size: int = 8, id_col: str = "doc_id",
                      text_col: str = "text",
                      cfg: AnalyzerConfig | None = None):
    """POSITIONAL exact-substring duplication: for every doc, the
    fraction of its token positions covered by at least one
    ``size``-token n-gram whose exact text also occurs in >= 1 OTHER
    doc — the span-coverage metric of suffix-array training-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"), realized with rolling n-grams instead of a global
    suffix array.  Distinct from :func:`duplicate_chunk_fraction`:
    chunks are non-overlapping (a copied passage that straddles a
    chunk boundary is invisible), while overlapping grams catch every
    aligned-or-not repeated span and the interval union converts hits
    back into "how much of THIS doc is duplicated text".

    Scale shape — ONE scan, TWO bounded exchanges:
    1. gram stream (one row per token position, built with ``size``
       shifted slices of the flattened token array + a single
       ``binary_join_element_wise`` — no per-row Python) co-partitions
       by hash(gram_text); inside a bucket duplicates are decided on
       the TEXT (a 64-bit collision only co-locates innocents).  Each
       bucket emits the dup (doc, pos) rows plus ONE gram-count
       partial row per doc it saw — so the doc's token count is
       recovered downstream (sum(partials) + size - 1) without a
       second pass over the corpus.
    2. partials co-partition by hash(doc); per doc the covered-token
       total is the interval union of the dup spans — same-length
       intervals sorted by start, so it is one vectorized
       ``min(diff, size)`` sum, no per-doc loop.
    The gram exchange ships ~``size``× the text bytes; a rolling-hash
    prefilter could cut that but would decide dups on hashes — the
    text-in-bucket discipline is kept deliberately.

    Docs with fewer than ``size`` tokens have no grams and emit no row
    (callers needing them left-join the doc table, as with
    :func:`duplicate_chunk_fraction`).

    Returns a Dataset of (id_col, n_tokens, n_dup_grams,
    covered_tokens, dup_span_frac).
    """
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    from .hashing import dict_hash_u64
    nb = num_hash_buckets(None)
    L = int(size)
    tok = Tokenizer(cfg)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64()),
                      "gram_text": pa.array([], pa.string())})

    def gramify(batch: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(batch[text_col])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        n = pc.list_value_length(tokens).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = n >= L
        flat = tokens.flatten()
        if not keep.any() or len(flat) < L:
            return empty
        total = len(flat)
        # gram_all[j] = flat[j] .. flat[j+L-1] joined — L slices, one
        # Arrow join kernel over the whole block
        gram_all = pc.binary_join_element_wise(
            *[flat.slice(k, total - L + 1) for k in range(L)], " ")
        starts = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=starts[1:])
        nd = n[keep] - L + 1                      # grams per kept doc
        doc_rep = np.repeat(ids[keep], nd)
        pos = np.arange(int(nd.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(nd) - nd, nd)
        j = np.repeat(starts[:-1][keep], nd) + pos
        grams = pc.take(gram_all, pa.array(j))
        return pa.table({id_col: pa.array(doc_rep),
                         "pos": pa.array(pos),
                         "gram_text": grams})

    def bucket_by_gram(t: pa.Table) -> pa.Table:
        gt = t["gram_text"]
        if isinstance(gt, pa.ChunkedArray):
            gt = gt.combine_chunks()
        h = dict_hash_u64(gt)
        return t.append_column("__b", pa.array(int_bucket_of(h, nb)))

    def mark(g: pd.DataFrame) -> pa.Table:
        dup = g.groupby("gram_text", sort=False)[id_col] \
            .transform("nunique").to_numpy() >= 2
        ids = g[id_col].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        cnt = g.groupby(id_col, as_index=False, sort=False) \
            .agg(cnt=("pos", "size"))
        out = pd.DataFrame({
            id_col: np.concatenate([ids[dup],
                                    cnt[id_col].to_numpy(np.int64)]),
            "pos": np.concatenate([pos[dup],
                                   np.full(len(cnt), -1, np.int64)]),
            "cnt": np.concatenate([np.zeros(int(dup.sum()), np.int64),
                                   cnt["cnt"].to_numpy(np.int64)])})
        return arrow_group(out)

    parts = (ds.map_batches(gramify, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(bucket_by_gram, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("__b").map_groups(mark, batch_format="pandas"))

    def bucket_by_doc(t: pa.Table) -> pa.Table:
        k = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b2", pa.array(int_bucket_of(k, nb)))

    def coverage(g: pd.DataFrame) -> pa.Table:
        cnts = g[g["pos"] < 0].groupby(id_col, as_index=False,
                                       sort=False)["cnt"].sum()
        cnts["n_tokens"] = cnts["cnt"].to_numpy(np.int64) + L - 1
        d = g[g["pos"] >= 0].sort_values([id_col, "pos"])
        ids = d[id_col].to_numpy(np.int64)
        pos = d["pos"].to_numpy(np.int64)
        if len(ids):
            # same-length intervals sorted by start: union length is
            # min(next_start - start, L) summed, L for each doc's last
            seg = np.full(len(ids), L, dtype=np.int64)
            same = ids[:-1] == ids[1:]
            seg[:-1][same] = np.minimum(pos[1:] - pos[:-1], L)[same]
            doc_starts = np.flatnonzero(np.r_[True, ~same])
            cov = pd.DataFrame({
                id_col: ids[doc_starts],
                "covered_tokens": np.add.reduceat(seg, doc_starts),
                "n_dup_grams": np.diff(np.r_[doc_starts, len(ids)])})
        else:
            cov = pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                "covered_tokens":
                                    pd.Series(dtype=np.int64),
                                "n_dup_grams": pd.Series(dtype=np.int64)})
        out = cnts[[id_col, "n_tokens"]].merge(cov, on=id_col, how="left")
        for c in ("covered_tokens", "n_dup_grams"):
            out[c] = out[c].fillna(0).astype(np.int64)
        out["dup_span_frac"] = (out["covered_tokens"].to_numpy(np.float64)
                                / out["n_tokens"].to_numpy(np.float64))
        return arrow_group(out[[id_col, "n_tokens", "n_dup_grams",
                                "covered_tokens", "dup_span_frac"]])

    return (parts.map_batches(bucket_by_doc, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("__b2").map_groups(coverage, batch_format="pandas"))
