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
