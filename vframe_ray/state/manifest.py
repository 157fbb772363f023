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

import hashlib
import json
import os
import shutil


def fingerprint_rows(conv_ids, turn_idxs, texts) -> str:
    """Order-insensitive content hash of a segment's input rows.

    XOR of per-row sha1 digests → insensitive to arrival order (blocks
    reach the builder in nondeterministic order), sensitive to content.
    """
    acc = 0
    for c, t, x in zip(conv_ids, turn_idxs, texts):
        h = hashlib.sha1(f"{c}\x00{t}\x00{x}".encode()).digest()[:16]
        acc ^= int.from_bytes(h, "big")
    return f"{acc:032x}"


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
