"""As-of join: for each left row, the latest right row with the same key
whose timestamp is <= the left row's timestamp.

Reference analog: the reference aligns detection streams to video frames
by "the most recent decoded frame at this timestamp" inside one process
(`src/vframe/models/media.py:343-384` frame iteration + per-frame
metadata attach); an as-of join is that alignment expressed as a
dataflow operator over two tables — a primitive Ray Data lacks.

Implementation: ONE co-partitioning shuffle.  Both sides are mapped to a
unified schema tagged with ``__side`` and co-grouped by the join key
(`groupby(key).map_groups`); inside each group a single
``np.searchsorted`` over the time-sorted right rows matches every left
row.  No broadcast, no driver loop, no per-row Python.

Partitioning assumptions (custom-operator rule):
- Work and memory per task are O(rows of ONE key); skewed keys bound the
  group size.  For hot keys the group still sorts in one task — salt the
  key upstream and post-merge if a single key's rows exceed worker heap.
- Determinism under timestamp ties: the right side is first deduplicated
  to ONE row per (key, ts), keeping the largest ``tie_col`` — mirrored
  verbatim in the SQL oracle so engine and oracle can never disagree on
  which tied row wins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import arrow_group as _arrow


def asof_join(left, right, *, key: str, left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              tie_col: str, prefix: str = "r_", no_match: int = -1):
    """Backward as-of join of two Datasets.

    Returns a Dataset with ``left_cols`` plus ``prefix + c`` for each of
    ``right_cols`` (``no_match`` sentinel where the key has no right row
    at or before the left timestamp — explicit sentinel instead of a
    nullable column keeps the joined column a plain int64).
    """
    lsch = [(c, 1) for c in left_cols]
    rsch = [(c, 0) for c in right_cols]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {"__key": t[key], "__ts": t[left_on],
                "__side": pa.array(np.ones(len(t), dtype=np.int8))}
        for c, _ in lsch:
            cols[c] = t[c]
        for c, _ in rsch:
            cols["__r_" + c] = pa.nulls(len(t), pa.int64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {"__key": t[key], "__ts": t[right_on],
                "__side": pa.array(np.zeros(len(t), dtype=np.int8))}
        for c, _ in lsch:
            cols[c] = pa.nulls(len(t), t.schema.field(key).type
                               if c == key else pa.int64())
        for c, _ in rsch:
            cols["__r_" + c] = t[c].cast(pa.int64()) \
                if c != right_on else t[c]
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def match(g: pd.DataFrame) -> pa.Table:
        l = g[g["__side"] == 1]
        if not len(l):
            return _arrow(pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in
                 left_cols + [prefix + c for c in right_cols]}))
        r = g[g["__side"] == 0]
        # deterministic tie rule: one right row per ts, max tie_col wins
        r = r.sort_values(["__ts", "__r_" + tie_col]) \
             .drop_duplicates("__ts", keep="last")
        lt = l["__ts"].to_numpy()
        idx = np.searchsorted(r["__ts"].to_numpy(), lt, side="right") - 1
        # left cols ride through the union with nulls on right-side rows,
        # so the group df upcasts them to float64 — restore int64 here
        out = {c: l[c].to_numpy(dtype=np.int64, na_value=no_match)
               for c in left_cols}
        for c in right_cols:
            vals = r["__r_" + c].to_numpy(dtype=np.int64, na_value=no_match) \
                if len(r) else np.empty(0, dtype=np.int64)
            out[prefix + c] = np.where(
                idx >= 0, vals[np.clip(idx, 0, None)] if len(r) else no_match,
                no_match).astype(np.int64)
        return _arrow(pd.DataFrame(out))

    return unioned.groupby("__key").map_groups(match, batch_format="pandas")


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], post=None):
    """Large-large equi-join by co-partitioning (shuffle hash join).

    The broadcast joins in pipelines/relational.py are the right tool
    when one side fits in the object store; this is the other case: both
    sides big, ONE keyed shuffle of (left ∪ right), and inside each
    key's group the join is a within-group cartesian of the two sides
    (correct for equi-joins: every group row shares the key).  Inner
    join semantics.

    ``post`` (optional): a pandas->pandas function applied to each
    joined group BEFORE emission.  Because a key's joined rows live in
    exactly ONE group, any per-key aggregate placed here is exact — the
    classic join+aggregate fusion that saves the second shuffle a
    groupby-after-join would cost at 100 TB.

    Partitioning assumption: group memory is O(|L_k| x |R_k|) for one
    key k — salt hot keys upstream if a single key's join output
    exceeds worker heap."""
    # Exact Arrow types for every carried column: null-padding the other
    # side and the group-level pandas upcast (int64-with-nulls ->
    # float64) must both round-trip back to the source type, or blocks
    # from different groups drift schema.
    lsch = left.schema().base_schema
    rsch = right.schema().base_schema
    types = {**{c: lsch.field(c).type for c in left_cols},
             **{c: rsch.field(c).type for c in right_cols}}

    def tag(side):
        cols_self = left_cols if side else right_cols
        cols_other = right_cols if side else left_cols

        def fn(t: pa.Table) -> pa.Table:
            out = {"__key": t[key],
                   "__side": pa.array(
                       np.full(len(t), side, dtype=np.int8))}
            for c in cols_self:
                out[c] = t[c]
            for c in cols_other:
                out[c] = pa.nulls(len(t), types[c])
            return pa.table(out)
        return fn

    unioned = left.map_batches(tag(1), batch_format="pyarrow").union(
        right.map_batches(tag(0), batch_format="pyarrow"))

    def join_group(g: pd.DataFrame) -> pa.Table:
        l = g.loc[g["__side"] == 1, left_cols]
        r = g.loc[g["__side"] == 0, right_cols]
        j = l.merge(r, how="cross") if len(l) and len(r) else \
            pd.DataFrame(columns=left_cols + right_cols)
        j = post(j) if post else j
        t = _arrow(j)
        # restore source types (safe=False: values came from these very
        # types; the only "unsafe" step is undoing pandas' null-upcast)
        target = pa.schema([(f, types.get(f, t.schema.field(f).type))
                            for f in t.schema.names])
        return t.cast(target, safe=False)

    return unioned.groupby("__key").map_groups(join_group,
                                               batch_format="pandas")
