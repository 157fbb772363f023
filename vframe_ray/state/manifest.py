"""Per-partition lineage manifests — the checkpoint/resume contract.

Recasts the reference's incremental sha256 cache reconciliation
(reference: src/commands/dedup/sha256.py:74-105 — hash only new files,
anti-join cache vs inputs) and its prior-run JSON re-hydration
(reference: src/vframe/models/media.py:79-111) as per-segment manifests:

- every segment directory is written atomically (tmp dir + rename) and
  carries a ``manifest.json`` with a *content fingerprint* of the exact
  input rows that produced it;
- a resumed build recomputes each segment's input fingerprint cheaply
  and skips segments whose manifest already matches — the anti-join of
  pending work against finished work;
- a finished index has a top-level manifest listing all segments, so a
  query engine never reads a half-written segment.
"""

from __future__ import annotations

import json
import os
import shutil


def fingerprint_rows(conv_ids, turn_idxs, texts,
                     extra_cols: dict | None = None) -> str:
    """Order-insensitive content hash of a segment's input rows.

    XOR-fold of per-row 64-bit hashes (vectorized) → insensitive to
    arrival order (blocks reach the builder in nondeterministic order),
    sensitive to content.  Inputs are pyarrow arrays or sequences.

    ``extra_cols`` (name -> array) folds every attribute column that
    lands in the docmap into the per-row hash — ADVICE.md round 1: a
    resumed build over input whose attributes changed (text unchanged)
    must NOT skip the segment, or predicate-filtered search silently
    serves stale attribute values.
    """
    import numpy as np
    import pandas as pd

    def _np(x):
        try:
            return x.to_numpy(zero_copy_only=False)
        except (AttributeError, TypeError):
            return np.asarray(x)

    hc = pd.util.hash_array(_np(conv_ids).astype(object))
    ht = pd.util.hash_array(_np(turn_idxs).astype(np.int64))
    hx = pd.util.hash_array(_np(texts).astype(object))
    mixed = hc * np.uint64(0x9E3779B97F4A7C15) ^ (ht + np.uint64(1)) \
        * np.uint64(0xC2B2AE3D27D4EB4F) ^ hx
    for name in sorted(extra_cols or {}):
        col = _np(extra_cols[name]).astype(object)
        # name folded in so renaming a column changes the fingerprint
        salt = np.uint64(
            int(pd.util.hash_array(np.array([name], dtype=object))[0]) | 1)
        # bijective mix (xor then odd multiply), NOT a plain xor of the
        # column hash: a constant column xored per row would cancel out
        # of the fold whenever the row count is even
        mixed = (mixed ^ pd.util.hash_array(col) * salt) \
            * np.uint64(0xFF51AFD7ED558CCD)
    acc = np.bitwise_xor.reduce(mixed) if len(mixed) else np.uint64(0)
    # fold in the row count so permutations of multisets stay distinct-ish
    return f"{int(acc):016x}{len(mixed):016x}"


def write_atomic_dir(tmp_dir: str, final_dir: str) -> None:
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)


def write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def completed_segment(seg_dir: str, fingerprint: str | None = None) -> bool:
    """True iff ``seg_dir`` holds a finished segment (and, when given,
    one built from inputs with the same fingerprint)."""
    mpath = os.path.join(seg_dir, "manifest.json")
    if not os.path.exists(mpath):
        return False
    try:
        m = read_json(mpath)
    except (ValueError, OSError):
        return False
    if fingerprint is not None and m.get("input_fingerprint") != fingerprint:
        return False
    return all(os.path.exists(os.path.join(seg_dir, f))
               for f in ("docs.parquet", "terms.parquet"))
