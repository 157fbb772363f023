"""Stream-shaped operators over the events table: gap sessionization and
tumbling windows.

The reference's streaming semantics are per-container rolling state with
group-change flush (reference: src/commands/pipe/save-gif.py:41-142 —
accumulate frames per video, flush on container change;
skip-phash.py:106-114 — state reset per container).  Ray Data has no
event-time windows (guide §streaming), so both operators follow the
canonical recast: partition by key, sort by ts INSIDE the group, run the
windowing logic over the ordered group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import arrow_group as _arrow


def sessionize(ds, *, gap_seconds: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts"):
    """Gap-based sessions per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.

    Output: one row per session
    (user_id, session_idx, session_start, session_end, n_events, sum_value)
    where session_idx is 0-based in ts order within the key.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"])
        ts = g[ts_col].to_numpy()
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > np.timedelta64(gap_seconds, "s")
        sess = np.cumsum(gap) - 1
        g = g.assign(session_idx=sess.astype(np.int64))
        out = g.groupby("session_idx").agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum"),
        ).reset_index()
        out.insert(0, key_col, g[key_col].iloc[0])
        return _arrow(out)

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def rollup_conversations(ds, *, conv_col: str = "conv_id",
                         order_col: str = "turn_idx",
                         text_col: str = "text", sep: str = "\n"):
    """One artifact per container: join every turn of a conversation into
    a single ordered document — the group-change-flush sink semantics of
    the reference's `pipe save-gif` / `save-video` (accumulate frames
    per container, flush one artifact on change, save-gif.py:41-142) as
    an explicit ``groupby(conv).map_groups``.

    Output: (conv_col, n_turns, transcript) — SQL-oracle-checkable via
    ``string_agg(text, sep ORDER BY order_col)``.
    """

    def per_conv(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_col)
        return _arrow(pd.DataFrame({
            conv_col: [g[conv_col].iloc[0]],
            "n_turns": np.array([len(g)], dtype=np.int64),
            "transcript": [sep.join(x or "" for x in g[text_col])],
        }))

    return ds.groupby(conv_col).map_groups(per_conv, batch_format="pandas")


def tumbling_window(ds, *, ts_col: str = "ts", key_col: str = "event_type"):
    """Per (key, day) tumbling aggregate: n events, sum/avg value.
    Day truncation is pure column math → stays a two-phase aggregate
    (combiner in map_batches, small final groupby)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    def add_day(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch[ts_col], unit="day"),
                      pa.timestamp("us"))
        return batch.append_column("day", day)

    withday = ds.map_batches(add_day, batch_format="pyarrow",
                             zero_copy_batch=True)
    return withday.groupby([key_col, "day"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"))
