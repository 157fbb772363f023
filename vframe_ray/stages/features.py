"""Feature hashing (the hashing trick): text → fixed-dim sparse
signed-count features, the classic streaming featurizer for
training-data pipelines (Weinberger et al., ICML 2009 — public
algorithm).

Entirely within-batch — each doc's features derive from its own tokens,
so the stage is a pure ``map_batches`` with NO shuffle at any corpus
size.  Values are exact int64 sums of ±1 signs, which keeps the DuckDB
oracle value-exact (the hash is the engine-wide SQL-portable
``token_hash64`` md5 prefix, stages/hashing.py).

Reference analog: `pipe features` (src/commands/pipe/features.py) — a
per-record feature vector extracted in a stateless batch stage; here
the "model" is a hash function, so no actor state is needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analyze import Tokenizer
from .hashing import dict_hash_u64, flat_tokens


def hashed_features_batch(t: pa.Table, *, dim: int, text_col: str,
                          id_col: str, tokenizer: Tokenizer) -> pa.Table:
    """Long-form (id, bucket, value) signed hashed counts for one batch.

    bucket = token_hash64 % dim; sign = −1 when the hash's top bit is
    set else +1 (the sign bit decorrelates collisions so collided
    features cancel in expectation); value = Σ sign over the doc's
    tokens in that bucket.  Zero-sum (fully cancelled) buckets are
    dropped — the SQL mirror is ``HAVING sum(sign) <> 0``."""
    parents, flat, _counts = flat_tokens(tokenizer, t[text_col])
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    h = dict_hash_u64(flat)
    bucket = (h % np.uint64(dim)).astype(np.int64)
    sign = np.where((h >> np.uint64(63)).astype(bool), -1, 1) \
        .astype(np.int64)
    key = parents * dim + bucket
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.bincount(inv, weights=sign).astype(np.int64)
    keep = vals != 0
    uk, vals = uk[keep], vals[keep]
    return pa.table({
        "doc_id": pa.array(ids[uk // dim], pa.int64()),
        "bucket": pa.array(uk % dim, pa.int64()),
        "value": pa.array(vals, pa.int64()),
    })


def hashed_features(ds, *, dim: int = 64, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Dataset → long-form (doc_id, bucket, value) hashed features."""
    tok = Tokenizer()

    def batch(t: pa.Table) -> pa.Table:
        return hashed_features_batch(t, dim=dim, text_col=text_col,
                                     id_col=id_col, tokenizer=tok)

    return ds.map_batches(batch, batch_format="pyarrow",
                          zero_copy_batch=True)
