"""Deterministic HyperLogLog distinct-count sketch.

The approximate-aggregate story for 100-TB pipelines: an exact
COUNT(DISTINCT) needs a corpus-sized exchange
(relational.daily_active_users co-locates every user's rows); the HLL
register array is a FIXED 2^p bytes per group however large the input,
merges by elementwise max (so per-block partials combine associatively
— the partial-aggregate shape of every reduce in this repo), and the
estimate is deterministic: the hash is the repo's SQL-portable 64-bit
md5 prefix (stages/hashing.py: ``('0x' || substr(md5(v),1,16))::
UBIGINT``), bucket/rho are integer bit ops, and the register sum is
INTEGER arithmetic (Σ 2^(52−M_j) as a big int), so the same estimate
is computable in DuckDB SQL bit-for-bit — an *approximate* operator
with an *exact* oracle.

Reference analog: the reference has no sketches (SURVEY §2.5); this is
part of the beyond-reference training-data family.

rho derivation: h >> 52 selects the register; w = low 52 bits;
rho = 53 − bit_length(w) (w=0 → 53).  bit_length comes from
``np.frexp`` — float64 holds any 52-bit int exactly and frexp reads
the exponent field, so there is no log2 rounding hazard at 2^k − 1
(np.log2(2**52 - 1) rounds UP to 52.0 and would be off by one).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .hashing import md5_u64

HLL_P = 12
HLL_M = 1 << HLL_P                       # 4096 registers
_W_BITS = 64 - HLL_P                     # 52
_W_MASK = np.uint64((1 << _W_BITS) - 1)


def hll_alpha_mm(m: int = HLL_M) -> float:
    """alpha_m · m² of the standard HLL estimator (Flajolet et al.
    2007) — for m ≥ 128, alpha_m = 0.7213 / (1 + 1.079/m)."""
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def hll_registers(values) -> np.ndarray:
    """Dense (HLL_M,) uint8 register array for a batch of string
    values (pa.Array / list / np object array)."""
    h = md5_u64(values)
    j = (h >> np.uint64(_W_BITS)).astype(np.int64)
    w = h & _W_MASK
    # exact bit_length via the float64 exponent field (see module doc)
    bl = np.frexp(w.astype(np.float64))[1]
    rho = (_W_BITS + 1 - bl).astype(np.uint8)
    reg = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(reg, j, rho)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches = elementwise register max."""
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    """Deterministic HLL estimate with the small-range (linear
    counting) correction, in the exact float-op order the SQL oracle
    uses: C · 2^52 / S with S = Σ_j 2^(52−M_j) summed as INTEGERS."""
    m = len(reg)
    counts = np.bincount(reg.astype(np.int64), minlength=_W_BITS + 2)
    # integer register sum: empty registers (rho 0) contribute 2^52
    s = sum(int(c) << (_W_BITS - r) for r, c in enumerate(counts.tolist())
            if c)
    v = int(counts[0])
    raw = hll_alpha_mm(m) * float(1 << _W_BITS) / float(s)
    if raw <= 2.5 * m and v > 0:
        return float(m) * math.log(float(m) / v)
    return raw


def hll_distinct_by_key(ds, key_col: str, val_col: str) -> "pa.Table":
    """Approximate COUNT(DISTINCT ``val_col``) per ``key_col`` group.

    Per-block partials are SPARSE register rows (key, j, rho-max) —
    ≤ |keys|·m rows per block, usually far fewer — combined by one
    grouped max (key cardinality here is enum-bounded → driver
    combine; a corpus-scaling key would route through the standard
    hash-bucket exchange, registers merging by max inside buckets).
    Returns (key_col, est) sorted by key."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = pc.cast(t[val_col], pa.string())
        h = md5_u64(vals)
        j = (h >> np.uint64(_W_BITS)).astype(np.int64)
        w = h & _W_MASK
        bl = np.frexp(w.astype(np.float64))[1]
        rho = (_W_BITS + 1 - bl).astype(np.int64)
        df = {"k": keys, "j": j, "rho": rho}
        import pandas as pd
        g = pd.DataFrame(df).groupby(["k", "j"], sort=False,
                                     as_index=False)["rho"].max()
        return pa.table({key_col: pa.array(g["k"]),
                         "j": pa.array(g["j"].to_numpy(np.int64)),
                         "rho": pa.array(g["rho"].to_numpy(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    from ..runtime import block_refs
    tables = [t for t in ray.get(block_refs(parts)) if t.num_rows]
    if not tables:
        return pa.table({key_col: pa.array([], pa.string()),
                         "est": pa.array([], pa.float64())})
    t = pa.concat_tables(tables)
    merged = t.group_by([key_col, "j"]).aggregate([("rho", "max")]) \
        .rename_columns([key_col, "j", "rho"])
    keys_np = merged[key_col].to_numpy(zero_copy_only=False)
    out_k, out_e = [], []
    for k in sorted(set(keys_np.tolist())):
        sel = keys_np == k
        reg = np.zeros(HLL_M, dtype=np.uint8)
        jj = merged["j"].to_numpy()[sel]
        rr = merged["rho"].to_numpy()[sel]
        np.maximum.at(reg, jj, rr.astype(np.uint8))
        out_k.append(k)
        out_e.append(hll_estimate(reg))
    return pa.table({key_col: pa.array(out_k),
                     "est": pa.array(out_e, pa.float64())})


CMS_WIDTH, CMS_DEPTH, CMS_DENOM = 1024, 4, 50


def cms_bucket(d: int, terms: list[str], width: int = CMS_WIDTH
               ) -> np.ndarray:
    """Row-``d`` CountMin bucket per term: the SQL-portable md5 prefix
    of ``"{d}:{term}"`` mod width (DuckDB:
    ``('0x'||substr(md5(d::VARCHAR||':'||term),1,16))::UBIGINT % w``).
    Runs per UNIQUE term only — vocabulary-bounded, never per
    occurrence."""
    h = md5_u64([f"{d}:{t}" for t in terms])
    return (h % np.uint64(width)).astype(np.int64)


def cms_heavy_hitters(tokenized_ds, *, width: int = CMS_WIDTH,
                      depth: int = CMS_DEPTH,
                      denom: int = CMS_DENOM) -> "pa.Table":
    """CountMin heavy hitters over the corpus token stream: terms whose
    sketch estimate reaches n_tokens // denom + 1 (> 1/denom of all
    occurrences), with est_count = min over depth rows of the term's
    bucket counts — the classic one-sided guarantee est ≥ true, so no
    true heavy hitter is ever missed (false positives possible under
    collisions, never false negatives).

    Scale shape: the sketch is LINEAR, so each block contributes a
    ≤ depth×width partial (d, bucket, count) — a FIXED-size exchange
    however large the corpus — summed exactly (integers, associative).
    Candidate enumeration rides the same pass as per-block distinct
    terms (vocabulary-bounded, the same artifact the index dictionary
    stores); estimates are integer minima, so the paired SQL oracle is
    EXACT despite the operator being approximate.

    Returns (term, est_count) sorted by term."""

    def partial(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"].combine_chunks()
        vc = pc.list_flatten(tokens).value_counts()
        terms = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols_d, cols_b, cols_c, cols_t = [], [], [], []
        for d in range(depth):
            agg = np.zeros(width, np.int64)
            np.add.at(agg, cms_bucket(d, terms, width), cnts)
            nz = np.nonzero(agg)[0]
            cols_d.append(np.full(len(nz), d, np.int64))
            cols_b.append(nz.astype(np.int64))
            cols_c.append(agg[nz])
            cols_t.append(np.full(len(nz), None, object))
        # vocab marker rows (d = -1) carry the candidate terms
        cols_d.append(np.full(len(terms), -1, np.int64))
        cols_b.append(np.zeros(len(terms), np.int64))
        cols_c.append(np.zeros(len(terms), np.int64))
        cols_t.append(np.array(terms, object))
        return pa.table({
            "d": pa.array(np.concatenate(cols_d)),
            "b": pa.array(np.concatenate(cols_b)),
            "c": pa.array(np.concatenate(cols_c)),
            "term": pa.array(np.concatenate(cols_t), pa.string())})

    parts = tokenized_ds.map_batches(partial, batch_format="pyarrow",
                                     batch_size=None,
                                     zero_copy_batch=True)
    from ..runtime import block_refs
    tables = [t for t in ray.get(block_refs(parts)) if t.num_rows]
    empty = pa.table({"term": pa.array([], pa.string()),
                      "est_count": pa.array([], pa.int64())})
    if not tables:
        return empty
    t = pa.concat_tables(tables)
    mat_rows = t.filter(pc.greater_equal(t["d"], 0)) \
        .group_by(["d", "b"]).aggregate([("c", "sum")]) \
        .rename_columns(["d", "b", "c"])
    mat = np.zeros((depth, width), np.int64)
    mat[mat_rows["d"].to_numpy(), mat_rows["b"].to_numpy()] = \
        mat_rows["c"].to_numpy()
    vocab = sorted(set(pc.filter(
        t["term"], pc.equal(t["d"], -1)).to_pylist()))
    if not vocab:
        return empty
    n = int(mat[0].sum())
    thresh = n // denom + 1
    est = np.full(len(vocab), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        est = np.minimum(est, mat[d, cms_bucket(d, vocab, width)])
    keep = est >= thresh
    return pa.table({
        "term": pa.array(np.array(vocab, object)[keep], pa.string()),
        "est_count": pa.array(est[keep], pa.int64())})


KMV_K = 128


def kmv_partial(values, k: int = KMV_K) -> np.ndarray:
    """k smallest DISTINCT md5-prefix hashes of a value batch (sorted
    uint64) — the KMV synopsis.  Associative: merging two partials is
    union→sort→cut, so per-block partials combine in any order."""
    h = np.unique(md5_u64(values))
    return h[:k]


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int = KMV_K) -> np.ndarray:
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_distinct(sk: np.ndarray, k: int = KMV_K) -> float:
    """Distinct-count estimate: (k−1) · 2^64 / θ with θ = the k-th
    smallest hash (exact until this ONE float division).  Sketches
    smaller than k saw every distinct value — return the exact count."""
    if len(sk) < k:
        return float(len(sk))
    theta = int(sk[k - 1])
    return (k - 1) * 18446744073709551616.0 / float(theta)


def kmv_overlap(sk_a: np.ndarray, sk_b: np.ndarray,
                k: int = KMV_K) -> float:
    """|A ∩ B| estimate from two KMV sketches: cut both to the shared
    threshold θ = min(θ_A, θ_B) (hashes < θ are a uniform sample of
    each set), count hash matches, scale by 2^64/θ.  All integer until
    the final division, so the DuckDB oracle reproduces it exactly.
    Degenerate sketches (either side saw < k values) are exact on the
    intersection of what they saw."""
    exact_a, exact_b = len(sk_a) < k, len(sk_b) < k
    inter = np.intersect1d(sk_a, sk_b)
    if exact_a and exact_b:
        return float(len(inter))
    theta = min(int(sk_a[-1]) if not exact_a else (1 << 64),
                int(sk_b[-1]) if not exact_b else (1 << 64))
    n = int(np.count_nonzero(inter < np.uint64(theta)))
    return n * 18446744073709551616.0 / float(theta)


def kmv_user_overlap(ds, type_a: str, type_b: str, *,
                     key_col: str = "event_type",
                     val_col: str = "user_id",
                     k: int = KMV_K) -> "pa.Table":
    """Estimated distinct users of two event types and their overlap,
    from ONE pass of fixed-size KMV partials (≤ 2k hashes per block —
    corpus-size-independent exchange; the exact alternative co-locates
    every user's rows).  Returns one row
    (est_a, est_b, est_overlap)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = pc.cast(t[val_col], pa.string())
        out_s, out_h = [], []
        for side, tname in (("a", type_a), ("b", type_b)):
            sel = keys == tname
            if sel.any():
                sk = kmv_partial(pc.filter(vals, pa.array(sel)), k)
                out_s.append(np.full(len(sk), side, object))
                out_h.append(sk)
        if not out_s:
            return pa.table({"side": pa.array([], pa.string()),
                             "h": pa.array([], pa.uint64())})
        return pa.table({"side": pa.array(np.concatenate(out_s),
                                          pa.string()),
                         "h": pa.array(np.concatenate(out_h),
                                       pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    from ..runtime import block_refs
    tables = [t for t in ray.get(block_refs(parts)) if t.num_rows]
    sk = {"a": np.array([], np.uint64), "b": np.array([], np.uint64)}
    if tables:
        t = pa.concat_tables(tables)
        sides = t["side"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        for side in ("a", "b"):
            sk[side] = np.unique(hs[sides == side])[:k]
    return pa.table({
        "est_a": pa.array([kmv_distinct(sk["a"], k)], pa.float64()),
        "est_b": pa.array([kmv_distinct(sk["b"], k)], pa.float64()),
        "est_overlap": pa.array([kmv_overlap(sk["a"], sk["b"], k)],
                                pa.float64())})
