"""Dataset sources.

Recasts the reference's `pipe open` generator (reference:
src/commands/pipe/open.py:40-120; src/vframe/models/media.py:73-218 —
glob dir / filelist / prior JSON, slice, shuffle, existence check,
attribute pre-filters) onto ``ray.data.read_parquet`` with column
pruning and row-group predicate pushdown.  The reference's attribute
pre-filter DSL (`skip-file.py` + click_utils.py:139-207 ``attr op value``
triples) becomes `pyarrow.dataset` expressions compiled by
``compile_predicate``.
"""

from __future__ import annotations

import glob
import os
import operator

import pyarrow.compute as pc

import ray.data

_OPS = {
    "<": operator.lt, "<=": operator.le, ">": operator.gt, ">=": operator.ge,
    "==": operator.eq, "=": operator.eq, "!=": operator.ne,
}


def compile_predicate(expr: str):
    """Compile one ``attr op value`` triple to a pyarrow dataset expression.

    Mirrors the reference's operator table (click_utils.py:139-152):
    e.g. ``"turn_idx >= 3"``, ``"role == user"``, ``"ts < 2024-06-01"``.
    """
    parts = expr.split(None, 2)
    if len(parts) != 3 or parts[1] not in _OPS:
        raise ValueError(f"predicate must be 'attr op value', got {expr!r}")
    attr, op, raw = parts
    val: object
    try:
        val = int(raw)
    except ValueError:
        try:
            val = float(raw)
        except ValueError:
            val = raw.strip("'\"")
    return _OPS[op](pc.field(attr), pc.scalar(val))


def compile_mask(predicates: list[str]):
    """Compile ``attr op value`` triples to a vectorized row-mask function
    ``pa.Table -> np.ndarray[bool]`` (ANDed).  The query-time counterpart
    of :func:`compile_predicate`'s scan-time pushdown — used to filter
    docmap attributes during scoring (skip-labels analog)."""
    import numpy as np
    import pandas as pd

    parsed = []
    for expr in predicates:
        parts = expr.split(None, 2)
        if len(parts) != 3 or parts[1] not in _OPS:
            raise ValueError(f"predicate must be 'attr op value', "
                             f"got {expr!r}")
        parsed.append((parts[0], _OPS[parts[1]], parts[2].strip("'\"")))

    def mask(table) -> "np.ndarray":
        m = np.ones(table.num_rows, dtype=bool)
        for attr, op, raw in parsed:
            col = table[attr].to_numpy(zero_copy_only=False)
            val: object = raw
            kind = np.asarray(col).dtype.kind
            if kind in "iuf":
                val = float(raw) if "." in raw else int(raw)
            elif kind == "M":
                val = np.datetime64(pd.Timestamp(raw))
            m &= op(col, val)
        return m

    return mask


def transcript_files(path: str) -> list[str]:
    """Resolve a file, directory, or glob to a sorted parquet file list
    (the reference's sorted glob_multi, file_utils / media.py:155-160)."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    elif any(ch in path for ch in "*?["):
        files = sorted(glob.glob(path))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    return files


def read_transcripts(path: str, *, columns: list[str] | None = None,
                     predicates: list[str] | None = None,
                     limit: int | None = None,
                     shuffle_seed: int | None = None) -> "ray.data.Dataset":
    """Read a transcripts table with pruning at the read.

    ``predicates`` are ANDed ``attr op value`` strings pushed into the
    parquet scan; ``limit`` ≈ the reference's ``--slice``; ``shuffle_seed``
    ≈ ``--randomize`` (open.py:22-30).
    """
    filt = None
    for p in predicates or ():
        e = compile_predicate(p)
        filt = e if filt is None else filt & e
    ds = ray.data.read_parquet(transcript_files(path), columns=columns,
                               filter=filt)
    if shuffle_seed is not None:
        ds = ds.random_shuffle(seed=shuffle_seed)
    if limit is not None:
        ds = ds.limit(limit)
    return ds
