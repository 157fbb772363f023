"""Co-partitioned joins Ray Data lacks as primitives: backward as-of
join and large-large shuffle hash join.

Reference analog (as-of): the reference aligns detection streams to
video frames by "the most recent decoded frame at this timestamp" inside
one process (`src/vframe/models/media.py:343-384` frame iteration +
per-frame metadata attach); an as-of join is that alignment expressed as
a dataflow operator over two tables.

Both operators use the same physical plan: ONE keyed shuffle of
(left ∪ right) tagged with ``__side``, co-partitioned into HASH BUCKETS
of keys (``groupby("__bucket")``), then one *vectorized* pandas kernel
per bucket (``merge`` / ``merge_asof``) — never a Python call per key.
Bucketing matters: a per-key ``map_groups`` pays ~1 ms of UDF dispatch
per group, which at 150k keys is minutes of pure overhead; per-bucket it
is ``num_buckets`` calls total, each C-vectorized over all its keys.

Partitioning assumptions (custom-operator rule):
- A bucket's rows must fit one worker's heap; keys are spread over
  ``num_buckets`` (default 4x cluster CPUs — override upward for TB
  inputs) by an avalanching integer hash, so only a single pathological
  hot KEY (not bucket) can overfill — salt such keys upstream.
- As-of determinism under timestamp ties: the right side is first
  deduplicated to ONE row per (key, ts), keeping the largest
  ``tie_col`` — mirrored verbatim in the SQL oracle so engine and
  oracle can never disagree on which tied row wins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import arrow_group as _arrow


from ..runtime import int_bucket_of as _bucket_of
from ..runtime import key_bucket_of as _key_bucket_of
from ..runtime import num_hash_buckets as _num_buckets


def asof_join(left, right, *, key: str, left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              tie_col: str, prefix: str = "r_", no_match: int = -1,
              num_buckets: int | None = None):
    """Backward as-of join of two Datasets.

    Returns a Dataset with ``left_cols`` plus ``prefix + c`` for each of
    ``right_cols`` (``no_match`` sentinel where the key has no right row
    at or before the left timestamp — explicit sentinel instead of a
    nullable column keeps the joined column a plain int64).
    """
    nb = _num_buckets(num_buckets)

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__bucket": _bucket_of(k, nb), "__key": t[key],
                "__ts": t[left_on],
                "__side": pa.array(np.ones(len(t), dtype=np.int8))}
        for c in left_cols:
            cols[c] = t[c]
        for c in right_cols:
            cols["__r_" + c] = pa.nulls(len(t), pa.int64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__bucket": _bucket_of(k, nb), "__key": t[key],
                "__ts": t[right_on],
                "__side": pa.array(np.zeros(len(t), dtype=np.int8))}
        for c in left_cols:
            cols[c] = pa.nulls(len(t), t.schema.field(key).type
                               if c == key else pa.int64())
        for c in right_cols:
            cols["__r_" + c] = t[c].cast(pa.int64()) \
                if c != right_on else t[c]
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_cols = left_cols + [prefix + c for c in right_cols]

    def match(g: pd.DataFrame) -> pa.Table:
        # one hash bucket of keys; merge_asof(by=__key) matches every
        # left row vectorized.  left cols rode through the union with
        # nulls on right-side rows (pandas upcasts to float64) — they
        # are restored to int64 on output.
        l = g[g["__side"] == 1]
        if not len(l):
            return _arrow(pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in out_cols}))
        r = g[g["__side"] == 0]
        ls = l.sort_values("__ts")
        out = {c: ls[c].to_numpy(dtype=np.int64, na_value=no_match)
               for c in left_cols}
        if not len(r):
            for c in right_cols:
                out[prefix + c] = np.full(len(l), no_match, dtype=np.int64)
            return _arrow(pd.DataFrame(out))
        # deterministic tie rule: one right row per (key, ts), max tie wins
        r = r.sort_values(["__key", "__ts", "__r_" + tie_col]) \
             .drop_duplicates(["__key", "__ts"], keep="last")
        j = pd.merge_asof(
            ls[["__key", "__ts"]],
            r.sort_values("__ts")[["__key", "__ts"]
                                  + ["__r_" + c for c in right_cols]],
            on="__ts", by="__key", direction="backward")
        for c in right_cols:
            out[prefix + c] = j["__r_" + c] \
                .to_numpy(dtype=np.int64, na_value=no_match)
        return _arrow(pd.DataFrame(out))

    return unioned.groupby("__bucket").map_groups(match,
                                                  batch_format="pandas")


def range_join(left, right, *, key: str, left_on: str,
               right_lo: str, right_hi: str, band: int,
               left_cols: list[str], right_cols: list[str],
               post=None, num_buckets: int | None = None):
    """Equi-key + interval (band/range) join: emit (left, right) pairs
    where ``left.key == right.key`` AND ``right_lo <= left.left_on <=
    right_hi`` (inclusive).  Inner semantics.  All position/time
    columns are int64 in the caller's unit (cast timestamps upstream).

    Physical plan — the classic banded range join:
    - each RIGHT interval is replicated into the fixed-width time bins
      it covers (``band`` ≈ max interval length ⇒ ≤ 2 replicas/row);
    - each LEFT row carries exactly the bin of its own timestamp;
    - ONE keyed shuffle co-partitions by hash(key) (a key's events AND
      all its interval replicas land in one bucket), then one
      vectorized pandas merge on (key, bin) + a between filter per
      bucket.  A (left, right) pair can only meet in the LEFT row's
      bin, so no dedup pass is needed.

    ``post`` (optional): pandas->pandas per-bucket hook.  Because every
    row of a key is in exactly one bucket, per-RIGHT-row aggregates
    (e.g. events per interval) computed here are exact — the same
    join+aggregate fusion as :func:`hash_join`.

    Partitioning assumptions: per-bucket rows fit a worker heap
    (keys spread over ``num_buckets``); replication factor =
    interval_length/band + 1, so pick ``band`` near the typical
    interval length.
    """
    nb = _num_buckets(num_buckets)
    lsch = left.schema().base_schema
    types = {**{c: lsch.field(c).type for c in left_cols},
             **{"r_" + c: pa.int64() for c in right_cols}}

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__bucket": _bucket_of(k, nb), "__key": pa.array(k),
                "__bin": pa.array(ts // band), "__ts": pa.array(ts),
                "__side": pa.array(np.ones(len(t), dtype=np.int8)),
                "__lo": pa.nulls(len(t), pa.int64()),
                "__hi": pa.nulls(len(t), pa.int64())}
        for c in left_cols:
            cols[c] = t[c]
        for c in right_cols:
            cols["__r_" + c] = pa.nulls(len(t), pa.int64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = t[right_lo].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t[right_hi].to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = lo // band
        # empty intervals (hi < lo) cover 0 bins and match nothing
        # (inner-join semantics) instead of poisoning np.repeat with a
        # negative count deep inside the Ray task (ADVICE r3).
        cnt = np.maximum(hi // band - b0 + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), cnt)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        bins = (np.arange(int(cnt.sum())) - np.repeat(csum[:-1], cnt)
                + b0[idx])
        cols = {"__bucket": _bucket_of(k[idx], nb),
                "__key": pa.array(k[idx]), "__bin": pa.array(bins),
                "__ts": pa.nulls(len(idx), pa.int64()),
                "__side": pa.array(np.zeros(len(idx), dtype=np.int8)),
                "__lo": pa.array(lo[idx]), "__hi": pa.array(hi[idx])}
        for c in left_cols:
            cols[c] = pa.nulls(len(idx), types[c])
        for c in right_cols:
            cols["__r_" + c] = t[c].take(pa.array(idx)).cast(pa.int64())
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_cols = left_cols + ["r_" + c for c in right_cols]

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        l = g[g["__side"] == 1]
        r = g[g["__side"] == 0]
        if len(l) and len(r):
            j = l[["__key", "__bin", "__ts"] + left_cols].merge(
                r[["__key", "__bin", "__lo", "__hi"]
                  + ["__r_" + c for c in right_cols]],
                on=["__key", "__bin"])
            j = j[(j["__ts"] >= j["__lo"]) & (j["__ts"] <= j["__hi"])]
            j = j.rename(columns={"__r_" + c: "r_" + c
                                  for c in right_cols})[out_cols]
        else:
            j = pd.DataFrame(columns=out_cols)
        j = post(j) if post else j
        t = _arrow(j)
        # restore source types (the group frame null-padded the other
        # side, so pandas upcast int64 -> float64; undo it on output)
        target = pa.schema([(f, types.get(f, t.schema.field(f).type))
                            for f in t.schema.names])
        return t.cast(target, safe=False)

    return unioned.groupby("__bucket").map_groups(join_bucket,
                                                  batch_format="pandas")


def _key_hash64(keys) -> np.ndarray:
    """Full avalanched uint64 per key — the hash behind
    ``runtime.key_bucket_of``, exposed unreduced for the Bloom filter
    (ints and int-valued floats through the integer mix, strings via
    ``pd.util.hash_array``)."""
    a = np.asarray(keys)
    if a.dtype.kind in "iuf":
        h = a.astype(np.int64).astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
    else:
        h = pd.util.hash_array(a.astype(object)).astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
    return h ^ (h >> np.uint64(31))


def _bloom_positions(h: np.ndarray, bits: int):
    """Two probe positions per key (double hashing: idx_i = h1 + i·h2
    mod bits, h2 forced odd so the stride never degenerates)."""
    h1 = h % np.uint64(bits)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(bits)
    return h1, (h1 + h2) % np.uint64(bits)


def bloom_build(keys, bits: int) -> np.ndarray:
    """Packed-bit Bloom filter (uint8[bits/8]) of a key batch."""
    bm = np.zeros(bits // 8, np.uint8)
    h = _key_hash64(keys)
    for idx in _bloom_positions(h, bits):
        np.bitwise_or.at(bm, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(
                             np.uint8))
    return bm


def bloom_test(bm: np.ndarray, keys) -> np.ndarray:
    """Membership mask: True = possibly present (false positives only
    — a pruned row is NEVER a join match, so pruning preserves the
    join result exactly)."""
    bits = len(bm) * 8
    h = _key_hash64(keys)
    keep = np.ones(len(h), bool)
    for idx in _bloom_positions(h, bits):
        keep &= (bm[(idx >> np.uint64(3)).astype(np.int64)]
                 >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return keep


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], post=None,
              num_buckets: int | None = None,
              left_schema: "pa.Schema | None" = None,
              right_schema: "pa.Schema | None" = None,
              runtime_filter: bool = False,
              filter_bits: int = 1 << 23):
    """Large-large equi-join by co-partitioning (shuffle hash join).

    The broadcast joins in pipelines/relational.py are the right tool
    when one side fits in the object store; this is the other case: both
    sides big, ONE keyed shuffle of (left ∪ right) into hash buckets,
    one vectorized ``pandas.merge`` per bucket.  Inner join semantics.

    ``post`` (optional): a pandas->pandas function applied to each
    bucket's joined frame BEFORE emission; it must return stable dtypes
    on empty input.  Every row of a key lands in exactly ONE bucket, so
    per-key aggregates computed here are exact — the classic
    join+aggregate fusion that saves the second shuffle a
    groupby-after-join would cost at 100 TB.

    ``runtime_filter=True`` adds a Spark-style Bloom runtime filter:
    one extra pass over the RIGHT side builds a fixed-size packed
    bitmap (per-block partials OR-combined — ``filter_bits/8`` bytes
    however large the input), broadcast once via ``ray.put``, and the
    LEFT side drops keys the filter rejects BEFORE the exchange.
    Output-identical by construction (false positives merely ship a
    row that then joins to nothing); the win is exchange volume when
    the right side is selective (a date/status-filtered dimension
    pruning a fact table).  Costs one re-execution of the right
    dataset's lineage — use when right ≪ left."""
    # Exact Arrow types for every carried column: null-padding the other
    # side and the group-level pandas upcast (int64-with-nulls ->
    # float64) must both round-trip back to the source type, or blocks
    # from different groups drift schema.
    # explicit schemas take precedence: Dataset.schema()'s limit-1 probe
    # resolves to None when an upstream filter leaves the probe block
    # empty (e.g. a date-pruned read behind a Project rename)
    lsch = left_schema if left_schema is not None \
        else left.schema().base_schema
    rsch = right_schema if right_schema is not None \
        else right.schema().base_schema
    types = {**{c: lsch.field(c).type for c in left_cols},
             **{c: rsch.field(c).type for c in right_cols}}
    nb = _num_buckets(num_buckets)

    def tag(side):
        cols_self = set(left_cols if side else right_cols)

        def fn(t: pa.Table) -> pa.Table:
            # generic key bucketing: int64 keys use the integer mix,
            # string keys hash first (join machinery below is
            # dtype-agnostic — pandas merges on "__key" either way)
            k = t[key].to_numpy(zero_copy_only=False)
            out = {"__bucket": _key_bucket_of(k, nb), "__key": t[key],
                   "__side": pa.array(
                       np.full(len(t), side, dtype=np.int8))}
            # CANONICAL column order on both sides (left_cols then
            # right_cols) — per-side orders made the union's block
            # schemas disagree, which Ray Data warns may misbehave
            for c in left_cols + right_cols:
                if c in out:
                    continue            # shared column (e.g. the key)
                # self columns are cast to the DECLARED type (zero-copy
                # when already equal): an explicit left/right_schema that
                # widens a storage type (int32 parquet column declared
                # int64) must not leave the union's two inputs with
                # disagreeing block schemas
                out[c] = t[c].cast(types[c]) if c in cols_self \
                    else pa.nulls(len(t), types[c])
            return pa.table(out)
        return fn

    if runtime_filter:
        import ray

        def bloom_partial(t: pa.Table) -> pa.Table:
            bm = bloom_build(t[key].to_numpy(zero_copy_only=False),
                             filter_bits)
            return pa.table({"bm": pa.array([bm.tobytes()],
                                            pa.binary())})

        from ..runtime import block_refs as _block_refs
        parts = right.map_batches(bloom_partial, batch_format="pyarrow",
                                  batch_size=None)
        bm = np.zeros(filter_bits // 8, np.uint8)
        for t in ray.get(_block_refs(parts)):
            for chunk in t["bm"].to_pylist():
                bm |= np.frombuffer(chunk, np.uint8)
        bm_ref = ray.put(bm)

        def prune(t: pa.Table) -> pa.Table:
            keep = bloom_test(ray.get(bm_ref),
                              t[key].to_numpy(zero_copy_only=False))
            return t.filter(pa.array(keep))

        left = left.map_batches(prune, batch_format="pyarrow",
                                zero_copy_batch=True)

    unioned = left.map_batches(tag(1), batch_format="pyarrow").union(
        right.map_batches(tag(0), batch_format="pyarrow"))

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        l = g.loc[g["__side"] == 1, ["__key"] + left_cols]
        r = g.loc[g["__side"] == 0, ["__key"] + right_cols]
        j = l.merge(r, on="__key")[left_cols + right_cols] \
            if len(l) and len(r) else \
            pd.DataFrame(columns=left_cols + right_cols)
        j = post(j) if post else j
        t = _arrow(j)
        # restore source types (safe=False: values came from these very
        # types; the only "unsafe" step is undoing pandas' null-upcast)
        target = pa.schema([(f, types.get(f, t.schema.field(f).type))
                            for f in t.schema.names])
        return t.cast(target, safe=False)

    return unioned.groupby("__bucket").map_groups(join_bucket,
                                                  batch_format="pandas")


def nearest_join(left, right, *, key: str, left_on: str, right_on: str,
                 left_cols: list[str], right_id: str,
                 prefix: str = "nearest_", gap_col: str = "gap_us",
                 num_buckets: int | None = None):
    """NEAREST-timestamp join: each left row matched to the right row
    of the same ``key`` whose timestamp is CLOSEST in either direction
    — incident correlation, sensor alignment, "which error is nearest
    this purchase".  :func:`asof_join` looks only backward; this is the
    bidirectional member of the family.

    Tie rule (total order, mirrored by the SQL oracle's row_number over
    ``(abs_diff, r_ts, r_id)``): equal distance before/after prefers
    the EARLIER right timestamp; equal timestamps prefer the smallest
    right id.  Left rows whose key has no right rows are dropped
    (inner-nearest).  ``left_cols`` and ``right_id`` must be
    int64-typed (the asof_join null-ride discipline).

    Scale shape: ONE hash(key) co-partitioning exchange of both sides;
    per bucket the right side sorts once by (key, ts, id) and every
    left row resolves with two searchsorted probes over a composite
    ``key_code*SPAN + ts_offset`` key (monotone across the bucket — no
    per-key Python): the insertion point's neighbours are the only
    nearest candidates, and the chosen neighbour is remapped to its
    (key, ts) run head so duplicate-timestamp ties pick the smallest
    id.  Returns a Dataset of ``left_cols`` + ``left_on`` +
    ``prefix+id`` + ``prefix+ts`` + ``gap_col`` (int64 microseconds,
    non-negative).
    """
    nb = _num_buckets(num_buckets)

    def tag(side: int, ts_col: str):
        # left columns ride as __l_<c>, the right id as __r_id —
        # DISTINCT namespaces, so a right_id that shares a left
        # column's name (both 'event_id', say) cannot collide
        def fn(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            out = {"__bucket": _bucket_of(k, nb), "__key": t[key],
                   "__ts": t[ts_col].cast(pa.timestamp("us")),
                   "__side": pa.array(
                       np.full(len(t), side, dtype=np.int8))}
            for c in left_cols:
                out["__l_" + c] = (t[c].cast(pa.int64()) if side == 1
                                   else pa.nulls(len(t), pa.int64()))
            out["__r_id"] = (t[right_id].cast(pa.int64()) if side == 0
                             else pa.nulls(len(t), pa.int64()))
            return pa.table(out)
        return fn

    lcols = [c for c in left_cols]
    unioned = left.map_batches(tag(1, left_on),
                               batch_format="pyarrow").union(
        right.map_batches(tag(0, right_on), batch_format="pyarrow"))
    out_names = lcols + [left_on, prefix + "id", prefix + "ts", gap_col]

    def match(g: pd.DataFrame) -> pa.Table:
        lm = (g["__side"] == 1).to_numpy()
        lidx = np.flatnonzero(lm)
        ridx = np.flatnonzero(~lm)
        ts = g["__ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        rid_raw = g["__r_id"].to_numpy()
        if not len(lidx) or not len(ridx):
            data = {c: np.empty(0, np.int64) for c in lcols}
            data[left_on] = np.empty(0, "datetime64[us]")
            data[prefix + "id"] = np.empty(0, np.int64)
            data[prefix + "ts"] = np.empty(0, "datetime64[us]")
            data[gap_col] = np.empty(0, np.int64)
            return _arrow(pd.DataFrame(data))
        _, inv = np.unique(g["__key"].to_numpy(np.int64),
                           return_inverse=True)
        code = inv.astype(np.int64)
        off = ts - ts.min()
        span = np.int64(off.max()) + np.int64(2)
        rorder = ridx[np.lexsort((rid_raw[ridx].astype(np.int64),
                                  off[ridx], code[ridx]))]
        comp_r = code[rorder] * span + off[rorder]
        r_ts = ts[rorder]
        comp_l = code[lidx] * span + off[lidx]
        pos = np.searchsorted(comp_r, comp_l, side="left")
        n_r = len(rorder)
        prev_i = np.maximum(pos - 1, 0)
        next_i = np.minimum(pos, n_r - 1)
        prev_ok = (pos > 0) & (code[rorder[prev_i]] == code[lidx])
        next_ok = (pos < n_r) & (code[rorder[next_i]] == code[lidx])
        big = np.int64(2 ** 62)
        dt_prev = np.where(prev_ok, ts[lidx] - r_ts[prev_i], big)
        dt_next = np.where(next_ok, r_ts[next_i] - ts[lidx], big)
        use_prev = prev_ok & (~next_ok | (dt_prev <= dt_next))
        chosen = np.where(use_prev, prev_i, next_i)
        valid = prev_ok | next_ok
        # remap to the (code, ts) run head so duplicate-ts ties pick
        # the smallest id (runs are id-sorted)
        run_key = code[rorder[chosen]] * span + (r_ts[chosen] - ts.min())
        head = np.searchsorted(comp_r, run_key, side="left")
        gap = np.where(use_prev, dt_prev, dt_next)
        sel = np.flatnonzero(valid)
        data = {}
        for c in lcols:
            data[c] = g["__l_" + c].to_numpy()[lidx][sel] \
                .astype(np.int64)
        data[left_on] = g["__ts"].to_numpy()[lidx][sel]
        data[prefix + "id"] = rid_raw[rorder[head[sel]]] \
            .astype(np.int64)
        data[prefix + "ts"] = g["__ts"].to_numpy()[rorder[head[sel]]]
        data[gap_col] = gap[sel].astype(np.int64)
        return _arrow(pd.DataFrame(data)[out_names])

    return unioned.groupby("__bucket").map_groups(match,
                                                  batch_format="pandas")


def fuzzy_match_pairs(left, right, *, left_key: str, right_key: str,
                      max_edits: int = 1,
                      num_buckets: int | None = None):
    """Distributed edit-distance string join (the dirty-key lookup
    enrichment: misspelled names / codes matched to a clean roster):
    DISTINCT key pairs (lk, rk) with Levenshtein(lk, rk) ≤ d.

    Candidate generation is the SymSpell deletion-neighborhood rule
    shared with :mod:`vframe_ray.index.fuzzy`: two strings within
    distance d MUST share a delete-≤d variant, so pairing inside one
    hash(variant) bucket is a complete candidate generator, and the
    length-pruned banded DP (:func:`~vframe_ray.index.fuzzy.
    _levenshtein_within`) verifies — candidates only, never the cross
    product.  Physical plan: per-block DISTINCT keys per side → variant
    rows → ONE hash(variant) exchange pairing L×R per variant → ONE
    hash(pair) exchange for the global pair-dedup + verify.  Work is
    over DISTINCT keys (callers attach rows afterwards with
    :func:`hash_join` or a broadcast — same composition rule as
    ``jaccard_pairs``).

    Degenerate-key note: very short keys share tiny delete
    neighborhoods (the empty string is a delete of every 1-char key),
    so a roster of 1–2-char codes degrades toward all-pairs — inherent
    to distance-1 semantics on short strings, not to the plan.

    Unicode note: distance is over CODEPOINTS ('cafe' ~ 'café' = 1);
    DuckDB's ``levenshtein`` counts BYTES, so the SQL oracle is exact
    on ASCII keys and intentionally diverges on multibyte ones
    (pinned in tests/test_round5_quality.py).

    Returns a Dataset of (left_key, right_key) distinct verified pairs.
    """
    import pyarrow.compute as pc

    from ..index.fuzzy import _levenshtein_within, deletion_variants
    nb = num_buckets or _num_buckets()

    def variant_rows(key_col, side):
        def fn(t: pa.Table) -> pa.Table:
            keys = pc.drop_null(t[key_col])
            uniq = pc.unique(keys.combine_chunks() if isinstance(
                keys, pa.ChunkedArray) else keys).to_pylist()
            vs, ks = [], []
            for k in uniq:
                for v in deletion_variants(str(k), max_edits):
                    vs.append(v)
                    ks.append(str(k))
            return pa.table({
                "v": pa.array(vs, pa.string()),
                "k": pa.array(ks, pa.string()),
                "side": pa.array(np.full(len(vs), side, np.int8))})
        return fn

    lv = left.map_batches(variant_rows(left_key, 0),
                          batch_format="pyarrow", zero_copy_batch=True)
    rv = right.map_batches(variant_rows(right_key, 1),
                           batch_format="pyarrow", zero_copy_batch=True)

    def add_vbucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t["v"].to_pandas().to_numpy(dtype=object))
        return t.append_column("__vb",
                               pa.array((h % nb).astype(np.int32)))

    def pair_in_bucket(g: pd.DataFrame) -> pa.Table:
        # block-level duplicate (v, k, side) rows collapse first; then
        # per variant the L×R expansion (candidates, verified later)
        g = g.drop_duplicates(["v", "k", "side"])
        lft = g[g["side"] == 0]
        rgt = g[g["side"] == 1]
        m = lft.merge(rgt, on="v")[["k_x", "k_y"]] \
            .drop_duplicates()
        out = pd.DataFrame({"lk": m["k_x"].to_numpy(object),
                            "rk": m["k_y"].to_numpy(object)})
        t = _arrow(out)
        h = pd.util.hash_array(
            (out["lk"] + "\x00" + out["rk"]).to_numpy(dtype=object))
        return t.append_column("__pb",
                               pa.array((h % nb).astype(np.int32)))

    def verify(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["lk", "rk"])
        keep = [bool(_levenshtein_within(a, b, max_edits))
                for a, b in zip(g["lk"], g["rk"])]
        out = g.loc[keep, ["lk", "rk"]].rename(
            columns={"lk": left_key, "rk": right_key})
        return _arrow(out)

    return (lv.union(rv)
            .map_batches(add_vbucket, batch_format="pyarrow")
            .groupby("__vb").map_groups(pair_in_bucket,
                                        batch_format="pandas")
            .groupby("__pb").map_groups(verify, batch_format="pandas"))
