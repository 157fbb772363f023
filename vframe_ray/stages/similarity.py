"""Similarity search over embedding columns (list<float>).

The reference extracts L2-normalized CNN feature vectors and compares
them by cosine similarity against rolling state (reference:
src/commands/pipe/features.py:33-68; skip-cnn.py:62-91
``cosine_similarity(feat_cur, feat_pre)``).  Here that capability
becomes corpus-scale top-k retrieval:

- ``cosine_topk``  — brute-force exact: the query matrix is broadcast
  once (``ray.put``), each batch does one numpy matmul, keeps its local
  top-k, and a tiny global merge finishes (scatter-gather; no shuffle
  of the embedding table itself).
- ``lsh_topk``     — the scale path: random-hyperplane (SRP) bucket
  signatures put near vectors in the same bucket; queries only scan
  their own bucket's rows.  Approximate; recall grows with n_tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..runtime import actor_pool as _pool


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteForceStage:
    """Holds the broadcast, pre-normalized query matrix; emits each
    batch's local top-k rows per query."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)                   # {qid: vector}
        self.qids = np.array(sorted(q))
        self.Q = _normalize(np.stack([q[i] for i in self.qids]))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        M = _normalize(np.stack(
            batch[self.vec_col].to_pandas().to_numpy()))
        sims = self.Q @ M.T                        # (nq, nrows)
        out_q, out_id, out_sim = [], [], []
        k = min(self.k, sims.shape[1])
        for r, qid in enumerate(self.qids):
            row = sims[r]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                out_q.append(int(qid))
                out_id.append(int(ids[j]))
                out_sim.append(float(row[j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            self.id_col: pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })


def cosine_topk(ds, queries: dict[int, np.ndarray], k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                batch_size: int = 4096, concurrency=None) -> pa.Table:
    """Exact cosine top-k of every query vector against the dataset.

    Result (query_id, rank, id, sim) with deterministic tie-break on
    ascending id.  Queries broadcast once via ``ray.put`` (the guide's
    small-side pattern) — never re-shipped per batch.
    """
    q_ref = ray.put({int(i): np.asarray(v, dtype=np.float64)
                     for i, v in queries.items()})
    partial = ds.map_batches(
        _BruteForceStage,
        fn_constructor_kwargs=dict(queries_ref=q_ref, k=k, id_col=id_col,
                                   vec_col=vec_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _pool())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", id_col, "sim"]]

    merged = partial.groupby("query_id").map_groups(merge,
                                                    batch_format="pandas")
    out = merged.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(out, preserve_index=False)


def cosine_dup_pairs(ds, *, threshold: float = 0.9,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     batch_size: int = 4096) -> pa.Table:
    """EXACT embedding near-duplicate pairs: all (a, b) with cosine ≥ τ,
    a < b — the corpus-wide skip-cnn analog (skip-cnn.py:62-91 compares
    only within a stream; this is the cross-corpus case).

    This is the exact BASELINE: the full normalized matrix is broadcast
    once (``ray.put``) and every batch does one matmul against it, so
    work is O(N²/batch) and broadcast memory is O(N·d) — right for
    oracle-checkable validation and mid-size corpora.  The scale path
    for 100 TB is the SRP-bucketed candidate generation of
    :func:`lsh_topk` / ``minhash_candidates``-style band joins followed
    by this exact verification per bucket.
    Returns (id_a, id_b, sim_r) with sim rounded to 6 dp (both sides of
    the oracle comparison round identically).
    """
    rows = ds.to_pandas()
    ids_all = rows[id_col].to_numpy()
    M = _normalize(np.stack(rows[vec_col].to_numpy()))
    ref = ray.put((ids_all, M))

    def stage(t: pa.Table) -> pa.Table:
        ids_a, Mall = ray.get(ref)
        ids_b = t[id_col].to_numpy(zero_copy_only=False)
        B = _normalize(np.stack(t[vec_col].to_pandas().to_numpy()))
        sims = np.round(B @ Mall.T, 6)              # (nbatch, N)
        ii, jj = np.nonzero(sims >= threshold)
        a = ids_b[ii]
        b = ids_a[jj]
        keep = a < b
        return pa.table({
            "id_a": pa.array(a[keep].astype(np.int64)),
            "id_b": pa.array(b[keep].astype(np.int64)),
            "sim_r": pa.array(sims[ii, jj][keep].astype(np.float64)),
        })

    out = ds.map_batches(stage, batch_format="pyarrow",
                         batch_size=batch_size).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Tiny Lloyd's k-means on a driver-side sample (normalized rows) —
    enough to place IVF centroids; not a general-purpose trainer."""
    rng = np.random.default_rng(seed)
    C = sample[rng.choice(len(sample), size=min(k, len(sample)),
                          replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ C.T, axis=1)       # cosine on unit rows
        for j in range(len(C)):
            members = sample[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                C[j] = c / n if n else C[j]
    return C


def ivf_topk(ds, queries: dict[int, np.ndarray], k: int = 10, *,
             n_centroids: int = 16, n_probe: int = 4,
             sample_size: int = 2048, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """IVF (inverted-file) approximate cosine top-k.

    Train centroids on a driver-side sample (``ds.random_sample``-style
    limit — one small read), assign every row to its nearest centroid in
    a ``map_batches`` (one pass, no shuffle of the vectors beyond the
    bucket groupby), then scan only the ``n_probe`` closest buckets per
    query.  The classic scale path when brute force is too much and SRP
    recall is too coarse; recall grows with n_probe.
    """
    # Deterministic, order-independent training sample: keep rows whose
    # Knuth-hashed id falls in the smallest hash band, sized ~2×
    # sample_size, then cap.  (ds.limit() took the FIRST N rows — biased
    # on sorted input; a hash band samples uniformly across the corpus
    # without a shuffle or an RNG.)
    n_total = ds.count()
    frac = min(1.0, (2.0 * sample_size) / max(n_total, 1))
    cut = np.uint64(int(frac * 2**32))

    def hash_band(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return t.filter(pa.array(h < cut))

    sample_rows = (ds.map_batches(hash_band, batch_format="pyarrow",
                                  zero_copy_batch=True)
                   .limit(sample_size).to_pandas())
    S = _normalize(np.stack(sample_rows[vec_col].to_numpy()))
    C = _kmeans(S, n_centroids, seed=seed)
    c_ref = ray.put(C)

    class AssignStage:
        def __init__(self):
            self.C = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _normalize(np.stack(batch[vec_col].to_pandas().to_numpy()))
            cid = np.argmax(M @ self.C.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(cid))

    bucketed = ds.map_batches(AssignStage, batch_format="pyarrow",
                              concurrency=_pool())

    qids = sorted(queries)
    Qm = _normalize(np.stack([np.asarray(queries[i], dtype=np.float64)
                              for i in qids]))
    qsims = Qm @ C.T                                     # (nq, n_centroids)
    probe = np.argsort(-qsims, axis=1)[:, :n_probe]
    qmap: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            qmap.setdefault(int(c), []).append(qi)
    qmap_ref = ray.put((qmap, Qm, qids))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        qmap_l, Qm_l, qids_l = ray.get(qmap_ref)
        wanted = qmap_l.get(int(g["centroid"].iloc[0]))
        empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                              id_col: pd.Series([], dtype=np.int64),
                              "sim": pd.Series([], dtype=np.float64)})
        if not wanted:
            return empty
        M = _normalize(np.stack(g[vec_col].to_numpy()))
        ids = g[id_col].to_numpy()
        sims = Qm_l[wanted] @ M.T
        rows = []
        kk = min(k, sims.shape[1])
        for r, qi in enumerate(wanted):
            top = np.argpartition(-sims[r], kk - 1)[:kk]
            for j in top:
                rows.append((int(qids_l[qi]), int(ids[j]),
                             float(sims[r, j])))
        return pd.DataFrame(rows, columns=["query_id", id_col, "sim"]) \
            if rows else empty

    cand = bucketed.groupby("centroid").map_groups(scan,
                                                   batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(id_col)
             .sort_values(["sim", id_col], ascending=[False, True]).head(k)
             .reset_index(drop=True))
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", id_col, "sim"]]

    merged = cand.groupby("query_id").map_groups(merge, batch_format="pandas")
    out = merged.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(out, preserve_index=False)


class SRPBucketStage:
    """Signed-random-projection bucket signature per row (one per hash
    table): near-duplicate embeddings collide with high probability."""

    def __init__(self, dim: int, n_bits: int = 12, n_tables: int = 4,
                 seed: int = 42, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.vec_col = vec_col
        self.n_tables = n_tables
        self.weights = (1 << np.arange(n_bits, dtype=np.int64))

    def signatures(self, M: np.ndarray) -> np.ndarray:
        """(n_tables, nrows) int64 bucket ids."""
        out = np.empty((self.n_tables, M.shape[0]), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (self.planes[t] @ M.T) > 0            # (n_bits, nrows)
            out[t] = (bits.T @ self.weights)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(np.stack(batch[self.vec_col].to_pandas().to_numpy()))
        sigs = self.signatures(M)
        n = M.shape[0]
        tables = np.repeat(np.arange(self.n_tables, dtype=np.int32), n)
        cols = {name: pa.concat_arrays([batch[name].combine_chunks()]
                                       * self.n_tables)
                for name in batch.column_names}
        cols["table_id"] = pa.array(tables)
        cols["bucket"] = pa.array(sigs.reshape(-1))
        return pa.table(cols)


def lsh_topk(ds, queries: dict[int, np.ndarray], k: int = 10, *,
             dim: int, n_bits: int = 10, n_tables: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Approximate cosine top-k: rows and queries are SRP-bucketed; each
    (table, bucket) group scans only its own rows against the queries that
    hash there.  The scale path when brute force (O(N·Q)) is too much —
    the shuffle key is (table_id, bucket), never all-pairs."""
    stage = SRPBucketStage(dim, n_bits, n_tables, vec_col=vec_col)
    qids = sorted(queries)
    Qm = _normalize(np.stack([np.asarray(queries[i], dtype=np.float64)
                              for i in qids]))
    qsig = stage.signatures(Qm)                     # (n_tables, nq)
    # query lookup per (table, bucket)
    qmap: dict[tuple[int, int], list[int]] = {}
    for t in range(n_tables):
        for qi, qid in enumerate(qids):
            qmap.setdefault((t, int(qsig[t, qi])), []).append(qi)
    qmap_ref = ray.put((qmap, Qm, qids))

    bucketed = ds.map_batches(stage, batch_format="pyarrow")

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        qmap_l, Qm_l, qids_l = ray.get(qmap_ref)
        t = int(g["table_id"].iloc[0])
        b = int(g["bucket"].iloc[0])
        wanted = qmap_l.get((t, b))
        empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                              id_col: pd.Series([], dtype=np.int64),
                              "sim": pd.Series([], dtype=np.float64)})
        if not wanted:
            return empty
        M = _normalize(np.stack(g[vec_col].to_numpy()))
        ids = g[id_col].to_numpy()
        sims = Qm_l[wanted] @ M.T
        rows = []
        for r, qi in enumerate(wanted):
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims[r], kk - 1)[:kk]
            for j in top:
                rows.append((int(qids_l[qi]), int(ids[j]),
                             float(sims[r, j])))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["query_id", id_col, "sim"])

    cand = bucketed.groupby(["table_id", "bucket"]).map_groups(
        scan, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(id_col)
             .sort_values(["sim", id_col], ascending=[False, True]).head(k)
             .reset_index(drop=True))
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", id_col, "sim"]]

    merged = cand.groupby("query_id").map_groups(merge, batch_format="pandas")
    out = merged.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(out, preserve_index=False)
