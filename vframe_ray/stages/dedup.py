"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
within-conversation near-dup.

Recasts the reference's dedup family:
- exact:   `vf dedup sha256` (reference: src/commands/dedup/sha256.py:36-134
  — multiprocess SHA256 + drop_duplicates keep-first) → content-hash column
  in a vectorized ``map_batches``, then ``groupby(hash).map_groups(first)``.
- near:    `pipe skip-phash` / `skip-cnn` rolling per-container similarity
  (reference: src/commands/pipe/skip-phash.py:31-157, skip-cnn.py:26-97)
  → ordered ``map_groups`` per conversation (sequential state within the
  group), and corpus-wide LSH band buckets for the cross-container case
  the reference never solved (it only dedups within a stream).

Scale notes: every variant is shuffle-by-key (hash, band bucket, or
shingle) — no all-pairs stage ever materializes; candidate pairs are
generated per-bucket and verified vectorized.  All kernels are
numpy/Arrow-vectorized over flattened token streams (stages/hashing.py);
md5 runs once per unique token/shingle.  Hot-key behavior is explicit:

- ``jaccard_pairs`` drops shingles whose document frequency exceeds
  ``max_df`` (boilerplate) in a deterministic upstream filter that the
  SQL oracle replicates, and REPORTS how many were dropped (the "no
  silent caps" rule) — Jaccard is then exact over the surviving shingle
  space.
- ``minhash_candidates`` caps giant band buckets by emitting STAR pairs
  (min-id ↔ each other id) instead of all pairs — connectivity for
  connected-component dup clustering is preserved, the n² blowup is not,
  and the rule is deterministic (SQL-replicable).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..analyze import Tokenizer
from ..runtime import actor_pool as _pool
from ..runtime import arrow_group as _arrow
from .hashing import (MERSENNE31, dict_hash_u64, row_starts_nz, shingle_rows)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------- exact

def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "text_sha") -> pa.Table:
    """sha256 of the payload column (hashlib per row is C-speed and
    releases the GIL; the reference hashes whole files the same way,
    file_utils.py:50-60)."""
    texts = batch[text_col].to_pylist()
    hashes = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def dedup_exact(ds, key_cols: list[str], text_col: str = "text"):
    """Keep the first row (by ``key_cols`` ascending) per distinct text.

    groupby(sha-hash-BUCKET) shuffle → vectorized per-bucket
    drop_duplicates — the distributed drop_duplicates(keep='first') of
    dedup/sha256.py:131.  Key cardinality is the unique-document count,
    so neither a per-sha map_groups (1 ms UDF dispatch per group) nor
    Ray's aggregate() (per-group Python combine) survives at scale; the
    bucket kernel is one C pass per bucket.
    """
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["text_sha"].to_pandas()
                               .to_numpy(dtype=object))
        return t.append_column("__hb",
                               pa.array((h % nb).astype(np.int32)))

    def first_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["text_sha"] + key_cols)
        return _arrow(g.drop_duplicates("text_sha", keep="first")
                      .drop(columns="__hb").reset_index(drop=True))

    return (hashed.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__hb").map_groups(first_bucket,
                                        batch_format="pandas"))


# ------------------------------------------------------------- shingles

def _shingle_set(tokens: list[str], n: int) -> set[str]:
    """Scalar reference implementation (test oracle); the hot path is the
    vectorized :func:`vframe_ray.stages.hashing.shingle_rows`."""
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


class ShingleStage:
    """doc rows -> exploded distinct (id, shingle, dsize) rows, vectorized."""

    def __init__(self, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, strings, sizes = shingle_rows(self.tok, texts, self.n)
        ids = batch[self.id_col].take(pa.array(parents))
        return pa.table({self.id_col: ids,
                         "shingle": strings,
                         "dsize": pa.array(sizes, pa.int64())})


def cross_contamination(test_ds, train_ds, *, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_buckets: int | None = None) -> "pd.DataFrame":
    """Train/test DECONTAMINATION check: for each test doc, how many of
    its distinct n-gram shingles also appear anywhere in the train
    corpus (the n-gram-overlap contamination test LLM eval sets run
    before training).

    Shape: both sides shingle via the shared vectorized kernel
    (:func:`~vframe_ray.stages.hashing.shingle_rows`), route by
    hash(shingle) bucket, and each bucket does ONE vectorized is_in of
    its test shingles against its distinct train-shingle set — a pure
    semi-join count, never a doc-pair explosion (unlike similarity
    joins, no per-pair work exists to blow up on hot shingles).
    Per-bucket partials are ≤ |test docs| rows, so the final combine is
    bounded by test docs × buckets — eval sets are small by nature
    (documented assumption; shard the final sum by id bucket if a
    "test" corpus ever rivals train size).

    Returns (doc_id, n_shingles, n_shared, contamination_r) for every
    test doc with ≥1 shingle, sorted by doc_id.
    """
    import ray

    from ..analyze import Tokenizer
    from ..runtime import block_refs as _block_refs
    from ..runtime import num_hash_buckets
    from .hashing import shingle_rows
    nb = num_hash_buckets(num_buckets)
    tok = Tokenizer()

    def mk_partial(side: int):
        def partial(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            parents, strings, sizes = shingle_rows(tok, t[text_col], n)
            h = pd.util.hash_array(strings.to_numpy(zero_copy_only=False)
                                   .astype(object))
            return pa.table({
                "__b": pa.array((h % nb).astype(np.int32)),
                "id": pa.array(ids[parents]),
                "sh": strings,
                "n_row": pa.array(sizes),
                "side": pa.array(np.full(len(parents), side,
                                         dtype=np.int8)),
            })
        return partial

    unioned = test_ds.map_batches(mk_partial(1), batch_format="pyarrow") \
        .union(train_ds.map_batches(mk_partial(0),
                                    batch_format="pyarrow"))

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        te = g[g["side"] == 1]
        if not len(te):
            return pa.table({"id": pa.array([], pa.int64()),
                             "n_shingles_p": pa.array([], pa.int64()),
                             "n_shared_p": pa.array([], pa.int64())})
        train_set = pd.unique(g.loc[g["side"] == 0, "sh"])
        hit = te["sh"].isin(train_set)
        agg = te.assign(hit=hit.astype(np.int64)).groupby(
            "id", as_index=False).agg(n_shingles_p=("sh", "size"),
                                      n_shared_p=("hit", "sum"))
        return pa.table({
            "id": pa.array(agg["id"].astype("int64")),
            "n_shingles_p": pa.array(agg["n_shingles_p"].astype("int64")),
            "n_shared_p": pa.array(agg["n_shared_p"].astype("int64")),
        })

    parts = unioned.groupby("__b").map_groups(bucket_counts,
                                              batch_format="pandas")
    tables = [t for t in ray.get(_block_refs(parts)) if t.num_rows]
    if not tables:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_shingles": pd.Series([], dtype="int64"),
                             "n_shared": pd.Series([], dtype="int64"),
                             "contamination_r":
                             pd.Series([], dtype="float64")})
    df = pa.concat_tables(tables).to_pandas().groupby(
        "id", as_index=False)[["n_shingles_p", "n_shared_p"]].sum()
    out = pd.DataFrame({
        "doc_id": df["id"].astype("int64"),
        "n_shingles": df["n_shingles_p"].astype("int64"),
        "n_shared": df["n_shared_p"].astype("int64")})
    out["contamination_r"] = np.round(
        out["n_shared"].to_numpy() / out["n_shingles"].to_numpy(), 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def _pair_intersections(ds, *, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_df: int = 1000):
    """Shared candidate-pair machinery for :func:`jaccard_pairs` /
    :func:`containment_pairs`: any pair sharing ≥ 1 shingle is a
    candidate (``groupby(shingle)`` is an equi-join key, never
    all-pairs); returns a Dataset of exact
    (id_a, id_b, size_a, size_b, intersection) with id_a < id_b.

    Hot-shingle (boilerplate) skew: shingles shared by more than
    ``max_df`` documents contribute NOTHING to the intersection counts
    (set sizes stay full), so the reported overlap is computed over
    shared non-boilerplate shingles — EXACT whenever no shingle exceeds
    ``max_df``, conservative (never over-reports) otherwise.  Every
    dropped bucket emits a marker row (id_a = id_b = -1) that the
    caller's verify stage counts and logs — never a silent cap
    (SURVEY.md §4; the deterministic rule is replicated by the SQL
    oracles via HAVING count(*) <= max_df).
    """
    sh = ds.map_batches(ShingleStage(n, id_col, text_col),
                        batch_format="pyarrow")
    # Co-partition by HASH BUCKET of the shingle, not by shingle: a
    # per-shingle map_groups pays ~1 ms UDF dispatch per group — minutes
    # of pure overhead at 250k+ distinct shingles.  The bucket hash
    # (pandas hash_array, fixed key) only routes; exact shingle grouping
    # happens vectorized inside the bucket kernel.
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["shingle"].to_pandas().to_numpy(dtype=object))
        return t.append_column(
            "__bucket", pa.array((h % nb).astype(np.int32)))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        ids_all = g[id_col].to_numpy(dtype=np.int64)
        if len(ids_all) and ids_all.min() < 0:
            # -1 is reserved as the hot-shingle marker sentinel below; a
            # legitimately negative id would be miscounted as a marker
            # and its pairs silently dropped (ADVICE.md round 2)
            raise ValueError(
                f"jaccard_pairs requires non-negative {id_col!r} values "
                f"(got {int(ids_all.min())}); -1 is reserved as the "
                f"boilerplate-shingle marker")
        codes, _ = pd.factorize(g["shingle"])
        order = np.lexsort((ids_all, codes))
        c, ids = codes[order], ids_all[order]
        szs = g["dsize"].to_numpy(dtype=np.int64)[order]
        starts = np.concatenate(
            [[0], np.nonzero(c[1:] != c[:-1])[0] + 1, [len(c)]])
        counts = np.diff(starts)
        a_out, b_out, sa_out, sb_out = [], [], [], []
        for ri in np.nonzero(counts > max_df)[0]:
            # boilerplate shingle: counted marker row, never a silent drop
            a_out.append(np.array([-1], np.int64))
            b_out.append(np.array([-1], np.int64))
            sa_out.append(np.array([counts[ri]], np.int64))
            sb_out.append(np.array([0], np.int64))
        # Python touches only the runs with >= 2 docs (true collisions)
        for ri in np.nonzero((counts >= 2) & (counts <= max_df))[0]:
            st, sz = starts[ri], counts[ri]
            i, j = np.triu_indices(sz, k=1)
            a_out.append(ids[st + i]); b_out.append(ids[st + j])
            sa_out.append(szs[st + i]); sb_out.append(szs[st + j])
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        return pa.table({"id_a": cat(a_out), "id_b": cat(b_out),
                         "size_a": cat(sa_out), "size_b": cat(sb_out)})

    cand = sh.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(bucket_pairs, batch_format="pandas")

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["id_a", "id_b", "size_a", "size_b"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["id_a", "id_b", "size_a", "size_b",
                                 "inter_partial"])

    # Per-pair intersection totals via PAIR-bucket co-partitioning + one
    # vectorized pandas sum per bucket.  Ray's sort-based
    # ``aggregate(Sum)`` combines per GROUP in Python — measured 7.7k
    # rows/s on 1.1M candidate-pair keys (4-int64 key), 250+ s of pure
    # dispatch; the bucketed kernel does the same reduce in ~1 s.
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        from ..runtime import pair_bucket_of
        return t.append_column("__pb", pa.array(pair_bucket_of(
            t["id_a"].to_numpy(zero_copy_only=False),
            t["id_b"].to_numpy(zero_copy_only=False), nb)))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby(["id_a", "id_b", "size_a", "size_b"], sort=False,
                         as_index=False)["inter_partial"].sum()
               .rename(columns={"inter_partial": "intersection"}))
        return _arrow(out)

    return (cand.map_batches(count_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(add_pair_bucket, batch_format="pyarrow")
            .groupby("__pb").map_groups(sum_bucket,
                                        batch_format="pandas"))


def _drop_hot_markers(batch: pa.Table, max_df: int, op: str) -> pa.Table:
    """Count + log the hot-shingle marker rows, then filter them out."""
    markers = pc.equal(batch["id_a"], -1)
    n_hot = pc.sum(pc.if_else(markers, batch["intersection"],
                              pa.scalar(0, batch["intersection"].type))
                   ).as_py() or 0
    if n_hot:
        logger.warning("%s: %d boilerplate shingles with df > %d "
                       "excluded from intersections", op, n_hot, max_df)
        print(f"[{op}] dropped {n_hot} shingles with df > {max_df}",
              flush=True)
        batch = batch.filter(pc.invert(markers))
    return batch


def jaccard_pairs(ds, *, n: int = 3, threshold: float = 0.5,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_df: int = 1000):
    """n-gram Jaccard duplicate pairs via shingle equi-join.

    Candidates and exact per-pair intersection counts come from
    :func:`_pair_intersections` (including the deterministic
    hot-shingle df ≤ ``max_df`` rule); a pair is kept when
    |A∩B| / (|A|+|B|-|A∩B|) ≥ τ.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    inter = _pair_intersections(ds, n=n, id_col=id_col,
                                text_col=text_col, max_df=max_df)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        batch = _drop_hot_markers(batch, max_df, "jaccard_pairs")
        sa = batch["size_a"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sb = batch["size_b"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        inter_n = batch["intersection"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        jac = inter_n / (sa + sb - inter_n)
        keep = jac >= threshold
        return pa.table({
            "id_a": pc.cast(batch["id_a"].filter(pa.array(keep)),
                            pa.int64()),
            "id_b": pc.cast(batch["id_b"].filter(pa.array(keep)),
                            pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })

    return inter.map_batches(verify, batch_format="pyarrow")


def containment_pairs(ds, *, n: int = 3, threshold: float = 0.6,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_df: int = 1000):
    """Near-containment pairs: |A∩B| / min(|A|,|B|) ≥ τ over n-token
    shingle sets — the quote / subset-duplication detector (a short doc
    pasted inside a longer one has low Jaccard but containment ≈ 1, the
    reason CCNet-style dedup pipelines track containment separately
    from Jaccard).  Candidates and exact intersection counts are shared
    with :func:`jaccard_pairs` via :func:`_pair_intersections`
    (including the hot-shingle df ≤ ``max_df`` rule).

    Returns (id_a, id_b, intersection, size_a, size_b, containment)
    with id_a < id_b; intersection/sizes are exact int64, containment
    is the single final float division (SQL-reproducible).
    """
    inter = _pair_intersections(ds, n=n, id_col=id_col,
                                text_col=text_col, max_df=max_df)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "intersection": pa.array([], pa.int64()),
                             "size_a": pa.array([], pa.int64()),
                             "size_b": pa.array([], pa.int64()),
                             "containment": pa.array([], pa.float64())})
        batch = _drop_hot_markers(batch, max_df, "containment_pairs")
        sa = batch["size_a"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sb = batch["size_b"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        inter_n = batch["intersection"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cont = inter_n.astype(np.float64) / np.minimum(sa, sb)
        keep = cont >= threshold
        ka = pa.array(keep)
        return pa.table({
            "id_a": pc.cast(batch["id_a"].filter(ka), pa.int64()),
            "id_b": pc.cast(batch["id_b"].filter(ka), pa.int64()),
            "intersection": pa.array(inter_n[keep], pa.int64()),
            "size_a": pa.array(sa[keep], pa.int64()),
            "size_b": pa.array(sb[keep], pa.int64()),
            "containment": pa.array(cont[keep], pa.float64()),
        })

    return inter.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- MinHash

class MinHashStage:
    """doc rows -> (id, band, k0..k{r-1}) rows, fully vectorized.

    Shingle → minhash (k universal-hash permutations over md5-derived
    31-bit shingle hashes, modulus 2^31-1) → LSH bands keyed by the RAW
    signature tuple as ``rows_per_band`` int64 columns (no opaque band
    hash, no string formatting) — the band key is therefore reproducible
    in SQL (pivoted min-hash values; see
    ``oracle_sql['minhash_candidates']``).  State (permutation params)
    built once per actor (reference pattern: detect.py:73 load-once).
    Docs with zero shingles emit no rows.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, n: int = 3,
                 id_col: str = "doc_id", text_col: str = "text",
                 seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE31, num_perm).astype(np.uint64)
        self.b = rng.integers(0, MERSENNE31, num_perm).astype(np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.n, self.id_col, self.text_col = n, id_col, text_col
        self.tok = Tokenizer()

    def signatures(self, sh_hash31: np.ndarray, counts: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
        """(sig matrix (n_nonempty_rows, num_perm), nonempty_mask) from
        per-row shingle hash segments (counts aligned with rows)."""
        starts, nz = row_starts_nz(counts)
        if not starts.size:
            return np.empty((0, self.num_perm), dtype=np.uint64), nz
        # (num_perm, n_shingles): a*h + b mod M, all < 2^62 — safe in u64
        hv = (self.a[:, None] * sh_hash31[None, :] + self.b[:, None]) \
            % np.uint64(MERSENNE31)
        sig = np.minimum.reduceat(hv, starts, axis=1).T
        return sig, nz

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, strings, _sizes = shingle_rows(self.tok, texts, self.n)
        counts = np.bincount(parents, minlength=len(texts)) \
            .astype(np.int64) if len(parents) else \
            np.zeros(len(texts), dtype=np.int64)
        sh31 = dict_hash_u64(strings) % np.uint64(MERSENNE31)
        sig, nz = self.signatures(sh31, counts)
        n_nz = sig.shape[0]
        if n_nz == 0:
            return pa.table({self.id_col: batch[self.id_col].slice(0, 0),
                             "band": pa.array([], pa.int32()),
                             "band_key": pa.array([], pa.string())})
        ids_nz = batch[self.id_col].take(pa.array(np.flatnonzero(nz)))
        if isinstance(ids_nz, pa.ChunkedArray):
            ids_nz = ids_nz.combine_chunks()
        rpb = self.rows_per_band
        sig2 = sig.reshape(n_nz * self.bands, rpb).astype(np.int64)
        idx = np.repeat(np.arange(n_nz, dtype=np.int64), self.bands)
        cols = {
            self.id_col: ids_nz.take(pa.array(idx)),
            "band": pa.array(np.tile(
                np.arange(self.bands, dtype=np.int32), n_nz)),
        }
        for j in range(rpb):
            cols[f"k{j}"] = pa.array(sig2[:, j])
        return pa.table(cols)

    @property
    def band_key_cols(self) -> list[str]:
        return ["band"] + [f"k{j}" for j in range(self.rows_per_band)]


def minhash_candidates(ds, *, num_perm: int = 64, bands: int = 16, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       max_bucket: int = 1000):
    """Distinct candidate duplicate pairs from LSH band collisions.

    Buckets larger than ``max_bucket`` emit STAR pairs (min id ↔ each
    other id) instead of all pairs: candidate connectivity for dup
    clustering is preserved without the n² blowup, deterministically
    (the SQL oracle replicates the same rule).  Approximate recall;
    verify with ``jaccard_pairs``-style exact check downstream when
    exactness matters."""
    mh = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, n=n,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=_pool())
    key_cols = ["band"] + [f"k{j}" for j in range(num_perm // bands)]

    # Co-partition by HASH BUCKET of the band key, not by band key: at
    # 16 bands x corpus size most band keys are singletons and a
    # per-key map_groups pays ~1 ms dispatch each.  The bucket mix only
    # routes; exact band-key grouping happens vectorized inside.
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        for c in key_cols[1:]:
            h = (h * np.uint64(0x100000001B3)
                 ^ t[c].to_numpy(zero_copy_only=False).astype(np.uint64))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        ka = g[key_cols].to_numpy()
        ids_all = g[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort(
            (ids_all,) + tuple(ka[:, i]
                               for i in reversed(range(ka.shape[1]))))
        ka, ids = ka[order], ids_all[order]
        new = (np.any(ka[1:] != ka[:-1], axis=1)
               if len(ka) > 1 else np.empty(0, bool))
        starts = np.concatenate(
            [[0], np.nonzero(new)[0] + 1, [len(ids)]])
        counts = np.diff(starts)
        a_out, b_out = [], []
        for ri in np.nonzero(counts >= 2)[0]:   # only true collisions
            st, sz = starts[ri], counts[ri]
            u = ids[st:st + sz]
            if sz > max_bucket:         # star fallback, never silent-empty
                a, b = np.full(sz - 1, u[0]), u[1:]
            else:
                i, j = np.triu_indices(sz, k=1)
                a, b = u[i], u[j]
            a_out.append(a); b_out.append(b)
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        return pa.table({"id_a": cat(a_out), "id_b": cat(b_out)})

    cand = mh.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(bucket_pairs, batch_format="pandas")

    # distinct (id_a, id_b) across bands: PAIR-bucket co-partition + one
    # vectorized drop_duplicates per bucket (Ray's aggregate(Count)
    # combines per group in Python — unusable at 1M+ pair keys)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        from ..runtime import pair_bucket_of
        return t.append_column("__pb", pa.array(pair_bucket_of(
            t["id_a"].to_numpy(zero_copy_only=False),
            t["id_b"].to_numpy(zero_copy_only=False), nb)))

    def uniq_bucket(g: pd.DataFrame) -> pa.Table:
        return _arrow(g.drop_duplicates(["id_a", "id_b"])
                      [["id_a", "id_b"]].reset_index(drop=True))

    return cand.map_batches(add_pair_bucket, batch_format="pyarrow") \
        .groupby("__pb").map_groups(uniq_bucket, batch_format="pandas")


# -------------------------------------------------------------- SimHash

class SimHashStage:
    """64-bit SimHash per doc — the textual analog of the reference's
    64-bit perceptual hash (im_utils.py:37-47).

        bit j set  iff  sum over tokens of (±1 by bit j of
        token_hash64(tok)) > 0;  empty doc -> 0.

    Vectorized: md5 per unique token, per-token bit matrix via
    ``np.unpackbits`` (little-endian bit order == bit j at column j),
    per-row sums via ``add.reduceat``, repack via ``np.packbits``.
    SQL-reproducible (see ``oracle_sql['simhash']``)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()

    @staticmethod
    def simhash64(tokens: list[str]) -> int:
        """Scalar reference implementation (test oracle)."""
        if not tokens:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in tokens:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= (1 << i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import flat_tokens
        texts = pc.fill_null(batch[self.text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, flat, counts = flat_tokens(self.tok, texts)
        th = dict_hash_u64(flat)
        out = np.zeros(len(counts), dtype=np.uint64)
        if len(th):
            # (ntok, 64) uint8 bit matrix; bitorder='little' puts bit j of
            # the little-endian u64 at column j
            bits = np.unpackbits(th[:, None].view(np.uint8),
                                 axis=1, bitorder="little")
            starts, nz = row_starts_nz(counts)
            cnt = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
            n_tok_nz = counts[nz][:, None]
            bit_set = (2 * cnt - n_tok_nz) > 0
            packed = np.packbits(bit_set, axis=1, bitorder="little")
            out[nz] = packed.view(np.uint64).reshape(-1)
        return pa.table({self.id_col: batch[self.id_col],
                         "simhash": pa.array(out.astype(np.int64))})


def simhash_table(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(SimHashStage(id_col, text_col),
                          batch_format="pyarrow")


# ------------------------------------- within-conversation near-dedup

def near_dedup_in_conversation(ds, *, threshold: float = 0.8, n: int = 1,
                               conv_col: str = "conv_id",
                               order_col: str = "turn_idx",
                               text_col: str = "text"):
    """Drop turns too similar to the PREVIOUS KEPT turn of the same
    conversation — the exact semantics of the reference's rolling
    perceptual-hash skip (skip-phash.py:106-143: ``hash_pre`` updates
    only when the frame is kept, reset per container).

    Ordered ``map_groups`` per conversation; the group is sorted inside
    (arrival order is arbitrary, SURVEY.md §7.4).  Shingle sets are
    computed for the WHOLE group in one vectorized pass; the (inherently
    sequential) keep-chain walks per-row over small sorted int arrays.
    """
    tok = Tokenizer()

    def dedup_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_col).reset_index(drop=True)
        texts = pa.array(g[text_col].fillna("").tolist(), pa.string())
        parents, strings, _sz = shingle_rows(tok, texts, n)
        codes = pc.dictionary_encode(strings)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        cvals = codes.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64) if len(strings) else np.empty(0, np.int64)
        # per-row sorted distinct code arrays (shingle_rows already
        # dedupes per row and orders by row)
        counts = np.bincount(parents, minlength=len(g)) \
            if len(parents) else np.zeros(len(g), dtype=np.int64)
        offs = np.zeros(len(g) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        keep = np.zeros(len(g), dtype=bool)
        prev: np.ndarray | None = None
        for i in range(len(g)):
            cur = np.sort(cvals[offs[i]:offs[i + 1]])
            if prev is not None and (len(cur) or len(prev)):
                inter = np.intersect1d(cur, prev,
                                       assume_unique=True).size
                union = len(cur) + len(prev) - inter
                if union and inter / union >= threshold:
                    continue                   # near-dup of previous kept
            keep[i] = True
            prev = cur
        return _arrow(g[keep])

    return ds.groupby(conv_col).map_groups(dedup_group, batch_format="pandas")


# --------------------------- rolling embedding near-dedup (skip-cnn analog)

def near_dedup_embeddings(ds, *, threshold: float = 0.95,
                          conv_col: str = "conv_id",
                          order_col: str = "turn_idx",
                          vec_col: str = "embedding"):
    """Drop rows whose embedding is too cosine-similar to the previous
    KEPT row of the same conversation — the reference's `pipe skip-cnn`
    (src/commands/pipe/skip-cnn.py:26-97: CNN feature vs feat_pre,
    ``cosine_similarity`` threshold, reset per container).

    Vector math per group is one normalize + per-step dot; groups are
    bounded by conversation length, the shuffle key is ``conv_col``.
    """
    def dedup_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_col).reset_index(drop=True)
        M = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        M = M / norms[:, None]
        keep = np.zeros(len(g), dtype=bool)
        prev = None
        for i in range(len(g)):
            if prev is not None and float(M[i] @ prev) >= threshold:
                continue
            keep[i] = True
            prev = M[i]
        return _arrow(g[keep])

    return ds.groupby(conv_col).map_groups(dedup_group, batch_format="pandas")


def ngram_novelty(ds, *, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Per-doc shingle novelty: the fraction of a doc's DISTINCT
    n-token shingles whose global first occurrence (min id over the
    corpus) is this doc — the crawl-saturation curve per document (a
    late near-copy scores ≈ 0 novelty; fresh content scores ≈ 1).
    Ties: a shingle first seen in several docs is novel only in the
    LOWEST id (strictly "seen before" semantics for everyone later).

    One shingle-hash exchange: each bucket holds every occurrence of
    its shingles, so the per-bucket kernel computes the global min id
    AND credits each (doc, shingle) pair as novel/not in the same pass
    — no join-back.  Per-doc partial counts then bucket by hash(id)
    (≤ one row per doc per shingle-bucket), and the final combine is
    one vectorized sum per doc bucket.

    Returns a Dataset of (id, n_shingles, n_novel, novelty_r);
    novelty_r = round(n_novel / n_shingles, 6), docs with zero
    shingles are absent (mirror LEFT JOIN + COALESCE in SQL when a
    full roster is needed).
    """
    from ..runtime import arrow_group, int_bucket_of, num_hash_buckets
    nb = num_hash_buckets()

    sh = ds.map_batches(ShingleStage(n, id_col, text_col),
                        batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["shingle"].to_pandas().to_numpy(dtype=object))
        return t.append_column(
            "__bucket", pa.array((h % nb).astype(np.int32)))

    def bucket_novel(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy(np.int64)
        codes, _ = pd.factorize(g["shingle"], sort=False)
        nsh = codes.max() + 1 if len(codes) else 0
        firsts = np.full(nsh, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(firsts, codes, ids)
        novel = (firsts[codes] == ids).astype(np.int64)
        agg = pd.DataFrame({"id": ids, "novel": novel}).groupby(
            "id", as_index=False, sort=False).agg(
            n_p=("novel", "size"), novel_p=("novel", "sum"))
        out = arrow_group(agg)
        return out.append_column("__db", pa.array(int_bucket_of(
            agg["id"].to_numpy(np.int64), nb)))

    def doc_combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("id", as_index=False, sort=False)[
            ["n_p", "novel_p"]].sum()
        novelty = np.round(agg["novel_p"].to_numpy(np.int64)
                           / agg["n_p"].to_numpy(np.int64), 6)
        return pa.table({
            id_col: pa.array(agg["id"].to_numpy(np.int64)),
            "n_shingles": pa.array(agg["n_p"].to_numpy(np.int64)),
            "n_novel": pa.array(agg["novel_p"].to_numpy(np.int64)),
            "novelty_r": pa.array(novelty, pa.float64())})

    return (sh.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(bucket_novel,
                                            batch_format="pandas")
            .groupby("__db").map_groups(doc_combine,
                                        batch_format="pandas"))


def cross_source_dups(ds, *, id_col: str = "doc_id",
                      source_col: str = "source",
                      text_col: str = "text"):
    """Cross-source duplication matrix: for each UNORDERED source pair,
    how many distinct texts occur in BOTH — the provenance report that
    finds mirror sites / syndicated content before training-mix
    weighting.  Exact over full text equality (sha256), symmetric
    pairs reported once as (source_a < source_b).

    One hash(text_sha) exchange; each bucket reduces its hashes to
    distinct (sha, source) pairs and emits the per-sha source-pair
    expansions — bounded by |sources per sha|² per duplicate, never a
    corpus-wide explosion.  Partial pair counts driver-combine
    (≤ |sources|² rows).  Returns pandas
    (source_a, source_b, n_texts) sorted.
    """
    from ..runtime import num_hash_buckets
    nb = num_hash_buckets()

    def pruned(t: pa.Table) -> pa.Table:
        t = pa.table({source_col: t[source_col], text_col: t[text_col]})
        t = add_content_hash(t, text_col)
        h = pd.util.hash_array(t["text_sha"].to_pandas()
                               .to_numpy(dtype=object))
        return pa.table({
            "__b": pa.array((h % nb).astype(np.int32)),
            "sha": t["text_sha"], source_col: t[source_col]})

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["sha", source_col])
        cnt = d.groupby("sha", sort=False)[source_col].nunique()
        multi = d[d["sha"].isin(cnt[cnt > 1].index)]
        a_out, b_out = [], []
        for _, sub in multi.groupby("sha", sort=False):
            ss = sorted(sub[source_col])
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    a_out.append(ss[i])
                    b_out.append(ss[j])
        out = pd.DataFrame({"source_a": a_out, "source_b": b_out})
        agg = out.groupby(["source_a", "source_b"], as_index=False,
                          sort=False).size() if len(out) else \
            pd.DataFrame({"source_a": [], "source_b": [], "size": []})
        return pa.table({
            "source_a": pa.array(agg["source_a"], pa.string()),
            "source_b": pa.array(agg["source_b"], pa.string()),
            "n_p": pa.array(agg["size"].to_numpy(np.int64)
                            if len(agg) else
                            np.empty(0, np.int64))})

    parts = (ds.map_batches(pruned, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("__b").map_groups(bucket_pairs,
                                        batch_format="pandas")
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"source_a": pd.Series([], dtype=object),
                             "source_b": pd.Series([], dtype=object),
                             "n_texts": pd.Series([], dtype="int64")})
    out = parts.groupby(["source_a", "source_b"], as_index=False)[
        "n_p"].sum().rename(columns={"n_p": "n_texts"})
    return out.sort_values(["source_a", "source_b"]) \
        .reset_index(drop=True).astype({"n_texts": "int64"})


def dedup_normalized(ds, key_cols: list[str], *, text_col: str = "text"):
    """Exact dedup over NORMALIZED text — the C4/RefinedWeb
    normalization step: lowercase, every non-alphanumeric run
    collapsed to a single space, leading/trailing runs stripped.  That
    rule is exactly the analyzer token stream joined by spaces, so the
    engine reuses ``tokenize_array`` + one ``binary_join`` per block
    and the SQL mirror is ``array_to_string(list(term ORDER BY pos),
    ' ')`` over the shared tok CTE — one normalization definition on
    both sides.  Physically :func:`dedup_exact` on the derived column
    (hash-bucketed keep-first by ``key_cols``); the helper columns are
    dropped from the output.
    """
    from ..analyze import Tokenizer

    def add_norm(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        toks = tok.tokenize_array(pc.fill_null(t[text_col], ""))
        if pa.types.is_large_list(toks.type) and \
                pa.types.is_large_string(toks.type.value_type):
            # binary_join has no (large_list<large_string>, scalar)
            # kernel; the item type drives the dispatch — keep the
            # large offsets, shrink only the items
            toks = toks.cast(pa.large_list(pa.string()))
        return t.append_column("__norm", pc.binary_join(toks, " "))

    normed = ds.map_batches(add_norm, batch_format="pyarrow",
                            zero_copy_batch=True)
    kept = dedup_exact(normed, key_cols, text_col="__norm")

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in ("__norm", "text_sha")
                               if c in t.column_names])

    return kept.map_batches(strip, batch_format="pyarrow",
                            zero_copy_batch=True)


def winnow_pairs(ds, *, k: int = 3, w: int = 4, min_shared: int = 2,
                 max_df: int = 1000, id_col: str = "doc_id",
                 text_col: str = "text"):
    """MOSS-style plagiarism pairing over WINNOWED fingerprints
    (Schleimer et al. 2003): doc pairs sharing ≥ ``min_shared``
    distinct selected hashes.  Winnowing keeps ~2/(w+1) of the k-gram
    hashes while guaranteeing any shared run of ≥ w+k−1 tokens yields
    a shared selection — the sub-quadratic alternative to full-shingle
    Jaccard when only LONG shared runs matter.

    Same physical plan as :func:`jaccard_pairs`: one hash(fp) exchange
    pairs docs per fingerprint (fingerprints held by > ``max_df`` docs
    are excluded — the deterministic hot-key rule, mirrored in SQL),
    pair partials re-bucket by hash(pair) for the exact shared count.
    Returns a Dataset of (id_a, id_b, n_shared), n_shared ≥ min_shared.
    """
    from ..runtime import arrow_group, num_hash_buckets, pair_bucket_of
    from .textquality import WinnowStage
    nb = num_hash_buckets()

    fps = ds.map_batches(WinnowStage(k, w, id_col, text_col),
                         batch_format="pyarrow")

    def distinct_fp(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col, "fp"]).aggregate([])
        h = g["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(nb)
        return g.append_column("__fb", pa.array(b.astype(np.int32)))

    def pair_in_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates([id_col, "fp"])
        df_per_fp = g.groupby("fp")[id_col].transform("size")
        g = g[df_per_fp <= max_df]
        m = g.merge(g, on="fp")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        agg = m.groupby([f"{id_col}_x", f"{id_col}_y"],
                        as_index=False).size()
        out = pd.DataFrame({
            "id_a": agg[f"{id_col}_x"].to_numpy(np.int64),
            "id_b": agg[f"{id_col}_y"].to_numpy(np.int64),
            "n_p": agg["size"].to_numpy(np.int64)})
        t = arrow_group(out)
        return t.append_column("__pb", pa.array(pair_bucket_of(
            out["id_a"].to_numpy(np.int64),
            out["id_b"].to_numpy(np.int64), nb)))

    def pair_combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["id_a", "id_b"], as_index=False)["n_p"].sum()
        agg = agg[agg["n_p"] >= min_shared].rename(
            columns={"n_p": "n_shared"})
        return arrow_group(agg.sort_values(["id_a", "id_b"]))

    return (fps.map_batches(distinct_fp, batch_format="pyarrow")
            .groupby("__fb").map_groups(pair_in_bucket,
                                        batch_format="pandas")
            .groupby("__pb").map_groups(pair_combine,
                                        batch_format="pandas"))


def continuation_pairs(ds, *, k: int = 5, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Crawl-concatenation / split-document detector: DIRECTED pairs
    (a, b) where doc a's LAST ``k`` analyzer tokens equal doc b's
    FIRST ``k`` tokens — the signature of one source page split
    across two crawl records (b continues a).  Docs with fewer than
    ``k`` tokens have no key and never pair.

    One hash(key) exchange: each doc emits one tail-key row and one
    head-key row; a bucket joins tails × heads on the exact key text
    (a ≠ b).  A pair can arise from exactly ONE key string, so
    in-bucket distinct is globally distinct — no second exchange.
    Returns a Dataset of (id_a, id_b) sorted within blocks.
    """
    from ..runtime import arrow_group, num_hash_buckets
    nb = num_hash_buckets()

    def keys(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        toks = tok.tokenize_array(pc.fill_null(t[text_col], ""))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = n >= k
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "key": pa.array([], pa.string()),
                             "side": pa.array([], pa.int8())})
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        starts = np.zeros(len(n), np.int64)
        np.cumsum(n[:-1], out=starts[1:])
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)[keep]
        s0, e0 = starts[keep], (starts + n)[keep]
        sep = pa.scalar(" ", flat.type)
        # k shifted takes aligned at row starts / row ends (list_slice
        # rejects negative starts, so tails go through the flat array)
        head = pc.binary_join_element_wise(
            *[flat.take(pa.array(s0 + j)) for j in range(k)], sep)
        tail = pc.binary_join_element_wise(
            *[flat.take(pa.array(e0 - k + j)) for j in range(k)], sep)
        return pa.table({
            id_col: pa.array(np.concatenate([ids, ids])),
            "key": pa.concat_arrays([
                tail.cast(pa.string()), head.cast(pa.string())]),
            "side": pa.array(np.r_[np.zeros(len(ids), np.int8),
                                   np.ones(len(ids), np.int8)])})

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["key"].to_pandas().to_numpy(object))
        return t.append_column("__kb",
                               pa.array((h % nb).astype(np.int32)))

    def pair_bucket(g: pd.DataFrame) -> pa.Table:
        tails = g[g["side"] == 0]
        heads = g[g["side"] == 1]
        m = tails.merge(heads, on="key")
        m = m[m[f"{id_col}_x"] != m[f"{id_col}_y"]]
        out = pd.DataFrame({
            "id_a": m[f"{id_col}_x"].to_numpy(np.int64),
            "id_b": m[f"{id_col}_y"].to_numpy(np.int64)}) \
            .drop_duplicates().sort_values(["id_a", "id_b"])
        return arrow_group(out)

    return (ds.map_batches(keys, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__kb").map_groups(pair_bucket,
                                        batch_format="pandas"))
