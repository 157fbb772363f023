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


TERMS_SWAP_JOURNAL = "terms.swap.json"


def recover_terms_swap(gdir: str) -> None:
    """Roll a crashed global-dictionary swap forward (idempotent).

    :func:`swap_terms_dir` replaces ``<gdir>/terms`` with two renames;
    a crash between them would leave the index with NO dictionary
    (ADVICE r4 #2a).  The journal written before the first rename makes
    every intermediate state recoverable: the new dictionary is always
    complete by journal time (its parquet files are fully written
    first), so recovery rolls FORWARD to it.  Every step tolerates a
    concurrent recoverer/writer finishing it first (best-effort
    renames); the final state is validated, not the steps."""
    j = os.path.join(gdir, TERMS_SWAP_JOURNAL)
    if not os.path.exists(j):
        return
    try:
        info = read_json(j)
    except (OSError, ValueError):
        return
    terms = os.path.join(gdir, "terms")
    new = os.path.join(gdir, info["new"])
    bak = os.path.join(gdir, info["bak"])
    if os.path.isdir(new):
        if os.path.isdir(terms) and not os.path.isdir(bak):
            try:
                os.rename(terms, bak)
            except OSError:
                pass
        if not os.path.isdir(terms):
            try:
                os.rename(new, terms)
            except OSError:
                pass
    if os.path.isdir(terms) and not os.path.isdir(new):
        # swap complete: clear the backup and the journal
        shutil.rmtree(bak, ignore_errors=True)
        try:
            os.remove(j)
        except OSError:
            pass


def swap_terms_dir(gdir: str, new_terms_dir: str, run_id: str) -> None:
    """Journaled replace of the global dictionary ``<gdir>/terms`` by
    ``new_terms_dir`` (which must be fully written).  POSIX cannot
    atomically replace a non-empty directory, so the two renames are
    bracketed by an intent journal; :func:`recover_terms_swap` (called
    here, by the other writers, and by :func:`terms_dir` readers)
    finishes an interrupted swap.  Single concurrent WRITER assumed
    (extend/compact are index-exclusive ops); concurrent readers are
    safe — they hold open file handles or roll the same journal
    forward."""
    recover_terms_swap(gdir)
    terms = os.path.join(gdir, "terms")
    bak = terms + ".old-" + run_id
    write_json(os.path.join(gdir, TERMS_SWAP_JOURNAL),
               {"new": os.path.basename(new_terms_dir),
                "bak": os.path.basename(bak)})
    if os.path.isdir(terms):
        os.rename(terms, bak)
    try:
        os.rename(new_terms_dir, terms)
    except OSError:
        if not os.path.isdir(terms):     # nobody finished it for us
            raise
    shutil.rmtree(bak, ignore_errors=True)
    try:
        os.remove(os.path.join(gdir, TERMS_SWAP_JOURNAL))
    except OSError:
        pass


def terms_dir(index_dir: str) -> str:
    """Path of the global dictionary, healing an interrupted swap
    first — readers opening an index that crashed mid-swap see the new
    dictionary instead of ENOENT.  Accepts an alias file (resolved
    here so the fuzzy/prefix/wildcard dictionary paths follow the
    same indirection as load_index_meta)."""
    index_dir = alias_resolve(index_dir)
    gdir = os.path.join(index_dir, "global")
    recover_terms_swap(gdir)
    return os.path.join(gdir, "terms")


PENDING_DELETE_JOURNAL = "pending_delete.json"


def defer_segment_delete(index_dir: str, seg_names: list[str]) -> None:
    """Queue retired segment directories for deferred removal.

    In-place compaction must NOT rmtree merged sources right after the
    manifest swap: in-flight queries that loaded the OLD manifest still
    read those dirs (ADVICE r4 #2c).  Retired segments are appended to
    a journal with a timestamp; :func:`gc_deferred_deletes` removes
    them once a grace period has passed."""
    import time
    path = os.path.join(index_dir, PENDING_DELETE_JOURNAL)
    cur = []
    if os.path.exists(path):
        try:
            cur = read_json(path)["pending"]
        except (OSError, ValueError, KeyError):
            cur = []
    now = time.time()
    have = {p["segment"] for p in cur}
    cur.extend({"segment": s, "retired_at": now}
               for s in seg_names if s not in have)
    write_json(path, {"pending": cur})


def gc_deferred_deletes(index_dir: str, *,
                        grace_seconds: float = 60.0) -> int:
    """Remove retired segment dirs older than ``grace_seconds``
    (call sites: compaction rounds, extends — any index-exclusive
    writer).  Returns the number of directories removed."""
    import time
    path = os.path.join(index_dir, PENDING_DELETE_JOURNAL)
    if not os.path.exists(path):
        return 0
    try:
        pending = read_json(path)["pending"]
    except (OSError, ValueError, KeyError):
        return 0
    now = time.time()
    keep, dropped = [], 0
    for p in pending:
        if now - p["retired_at"] >= grace_seconds:
            shutil.rmtree(os.path.join(index_dir, "segments",
                                       p["segment"]), ignore_errors=True)
            dropped += 1
        else:
            keep.append(p)
    if keep or dropped:
        write_json(path, {"pending": keep})
    return dropped


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


# ------------------------------------------------------------- aliases

def alias_set(alias_path: str, index_dir: str) -> None:
    """Atomically point ``alias_path`` (a small json file) at an index
    directory — the Elasticsearch index-alias indirection that makes
    blue-green reindexing a single atomic swap: build the new index
    under a fresh dir, flip the alias, retire the old dir at leisure.
    The write is tmp + ``os.replace`` so a reader never sees a torn
    alias."""
    import json
    import os
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"alias_to": os.path.abspath(index_dir)}, f)
    os.replace(tmp, alias_path)


def alias_resolve(path: str) -> str:
    """Resolve ``path`` if it is an alias FILE (one hop — aliases to
    aliases are rejected to keep resolution O(1) and loop-free);
    directories and non-alias paths pass through unchanged."""
    import json
    import os
    if os.path.isfile(path):
        with open(path) as f:
            target = json.load(f)["alias_to"]
        if os.path.isfile(target):
            raise ValueError(f"alias {path!r} points at another alias")
        return target
    return path
