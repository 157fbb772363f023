"""Distributed connected components over candidate-pair edge lists, and
the dedup-clustering composition that turns MinHash-LSH candidate pairs
into actual keep/drop decisions.

Reference analog: the reference's dedup commands stop at *pair/flag*
granularity (`src/commands/dedup/sha256.py:36-134` drops exact dups,
`pipe skip-phash` / `skip-cnn` drop within one stream); it never links
near-dup evidence across streams into clusters.  At training-data scale
that linking step IS the dedup decision: MinHash bands say "these two
MIGHT match", and only the connected component over all such edges says
"keep one representative per cluster".

Algorithm: BSP min-label propagation (the classic Pregel/MapReduce CC):

    label(v) := v
    repeat:  label(v) := min(label(v), min over neighbours label(u))

Each round is two keyed shuffles over the EDGE list (never the corpus):
a co-partition of (labels ∪ edges) by node-hash BUCKET emits each
node's current label to its neighbours via one vectorized merge per
bucket, then a second bucketed pass folds the messages with a pandas
groupby-min.  Labels are monotonically non-increasing, so the fixpoint
test is "sum(labels) unchanged" — one cheap aggregate per round over
the materialized (tiny) label table.

Scale/partitioning assumptions, stated per the custom-operator rule:
- Edges are *candidate dup pairs*, orders of magnitude smaller than the
  corpus (LSH band collisions); both shuffles are keyed on node id and
  the label table is O(#nodes-in-any-pair), kept in the object store —
  the driver only ever sees one scalar per round.
- Convergence takes O(graph diameter) rounds.  Dup clusters are
  clique-ish (diameter 2-3 in practice); ``max_rounds`` guards the
  pathological chain graph and raises instead of silently truncating
  (the "no silent caps" rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..runtime import arrow_group as _arrow

_EMPTY_CC = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "cluster_id": pd.Series(dtype="int64")})


def _edges_both(t: pa.Table) -> pa.Table:
    """(id_a, id_b) pairs -> undirected (node, nbr) edge rows."""
    a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"node": np.concatenate([a, b]),
                     "nbr": np.concatenate([b, a])})


def _cc_local(edges) -> pd.DataFrame:
    """Vectorized min-label propagation with pointer jumping over an
    edge list that fits one task (numpy only, no per-edge Python)."""
    import ray
    from ..runtime import block_refs
    t = pa.concat_tables(
        [b for b in ray.get(block_refs(edges)) if b.num_rows])
    u = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = lbl.copy()
        m = np.minimum(lbl[ui], lbl[vi])
        np.minimum.at(lbl, ui, m)
        np.minimum.at(lbl, vi, m)
        lbl = lbl[lbl]                      # pointer jumping: O(log n) rounds
        if np.array_equal(lbl, before):
            break
    return pd.DataFrame({"doc_id": nodes,
                         "cluster_id": nodes[lbl]})


def connected_components(pairs, *, max_rounds: int = 64,
                         driver_threshold: int = 5_000_000):
    """Label every node of an (id_a, id_b) pair Dataset with the minimum
    node id reachable from it.

    Returns a pandas DataFrame (doc_id, cluster_id) sorted by doc_id —
    one row per node that appears in any pair.  The result is small by
    construction (dup-candidate nodes only); the per-round work is
    distributed.

    Edge lists up to ``driver_threshold`` rows (~160 MB at the default)
    take a vectorized single-task fast path: the BSP rounds each cost
    two keyed shuffles of fixed orchestration overhead, which dwarfs the
    useful work on small graphs.  This mirrors the `_driver_combine`
    rule (bounded-by-construction data may be reduced centrally); above
    the threshold the distributed BSP loop engages.
    """
    from ..runtime import int_bucket_of, num_hash_buckets
    nb = num_hash_buckets()

    edges = pairs.map_batches(_edges_both, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _EMPTY_CC.copy()
    if n_edges <= driver_threshold:
        return _cc_local(edges)

    # Every shuffle below is keyed on hash-BUCKET of node, with the
    # per-node work done vectorized inside the bucket kernel — per-node
    # map_groups / Ray aggregate() both pay per-group Python, unusable
    # at corpus-scale node counts.
    def _bucket(col):
        def fn(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False)
            return t.append_column("__b",
                                   pa.array(int_bucket_of(k, nb)))
        return fn

    def min_by_node(val_col):
        def fn(g: pd.DataFrame) -> pa.Table:
            out = (g.groupby("node", sort=False, as_index=False)[val_col]
                   .min().rename(columns={val_col: "lbl"}))
            return _arrow(out)
        return fn

    # Round 0 for free: label(v) = min(v, min nbr(v)).
    labels = (edges.map_batches(_bucket("node"), batch_format="pyarrow")
              .groupby("__b").map_groups(min_by_node("nbr"),
                                         batch_format="pandas")
              .map_batches(
                  lambda t: pa.table({
                      "node": t["node"],
                      "lbl": pa.compute.min_element_wise(t["node"],
                                                         t["lbl"])}),
                  batch_format="pyarrow").materialize())
    total = labels.sum("lbl")

    def propagate(g: pd.DataFrame) -> pa.Table:
        # one bucket of nodes: label rows (nbr null) + edge rows.  Merge
        # labels onto edges vectorized, send each node's label to every
        # neighbour, keep it for the node itself.
        lab = g.loc[g["nbr"].isna(), ["node", "lbl"]]
        edg = g.loc[g["nbr"].notna(), ["node", "nbr"]]
        m = edg.merge(lab, on="node", how="left")
        node = np.concatenate([m["nbr"].to_numpy(dtype=np.int64),
                               lab["node"].to_numpy(dtype=np.int64)])
        lbl = np.concatenate([m["lbl"].to_numpy(dtype=np.int64),
                              lab["lbl"].to_numpy(dtype=np.int64)])
        return pa.table({"node": node, "lbl": lbl})

    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "lbl": t["lbl"],
                                "nbr": pa.nulls(len(t), pa.int64())}),
            batch_format="pyarrow")
        edge_rows = edges.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "lbl": pa.nulls(len(t), pa.int64()),
                                "nbr": t["nbr"]}),
            batch_format="pyarrow")
        msgs = (lab_rows.union(edge_rows)
                .map_batches(_bucket("node"), batch_format="pyarrow")
                .groupby("__b").map_groups(propagate,
                                           batch_format="pandas"))
        labels = (msgs.map_batches(_bucket("node"), batch_format="pyarrow")
                  .groupby("__b").map_groups(min_by_node("lbl"),
                                             batch_format="pandas")
                  .materialize())
        new_total = labels.sum("lbl")
        if new_total == total:     # labels only decrease -> fixpoint
            break
        total = new_total
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(pathological chain graph?); raise max_rounds")

    df = labels.to_pandas().astype({"node": "int64", "lbl": "int64"})
    df = df.rename(columns={"node": "doc_id", "lbl": "cluster_id"})
    return df.sort_values("doc_id").reset_index(drop=True)


def minhash_dedup_clusters(ds, **minhash_kwargs) -> pd.DataFrame:
    """MinHash-LSH candidates -> connected components -> keep/drop.

    Output: (doc_id, cluster_id, keep) for every doc that appears in any
    candidate pair, keep = "this doc is the cluster representative"
    (minimum doc_id).  Docs in no pair are implicitly kept and not
    listed; at 100 TB that's the difference between an edge-sized result
    and a corpus-sized one.
    """
    from .dedup import minhash_candidates

    cc = connected_components(minhash_candidates(ds, **minhash_kwargs))
    cc["keep"] = cc["doc_id"] == cc["cluster_id"]
    return cc


# ---------------------------------------------------------------------------
# PageRank (integer-exact power iteration)
# ---------------------------------------------------------------------------

def _pr_local(edges, *, iterations: int, scale: int,
              damping_pct: int, seeds=None) -> pd.DataFrame:
    """Vectorized integer PageRank over an edge list that fits one task
    (numpy only; ``np.add.at`` folds contributions per node exactly).
    With ``seeds``, teleport mass goes ONLY to seed nodes (personalized
    PageRank): non-seeds start at 0 and receive no base term."""
    import ray
    from ..runtime import block_refs
    t = pa.concat_tables(
        [b for b in ray.get(block_refs(edges)) if b.num_rows])
    u = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    deg = np.bincount(ui, minlength=len(nodes)).astype(np.int64)
    base = (100 - damping_pct) * scale // 100
    if seeds is None:
        is_seed = np.ones(len(nodes), dtype=bool)
    else:
        is_seed = np.isin(nodes, seeds)
    r = np.where(is_seed, np.int64(scale), np.int64(0))
    base_v = np.where(is_seed, np.int64(base), np.int64(0))
    for _ in range(iterations):
        contrib = damping_pct * r[ui] // (100 * deg[ui])
        nxt = base_v.copy()
        np.add.at(nxt, vi, contrib)
        r = nxt
    return pd.DataFrame({"node": nodes, "rank_scaled": r})


def pagerank(pairs, *, iterations: int = 3, scale: int = 1_000_000_000,
             damping_pct: int = 85, driver_threshold: int = 5_000_000,
             seeds=None):
    """PageRank over an (id_a, id_b) undirected DISTINCT-pair Dataset —
    the link-analysis primitive behind web-corpus quality weighting
    (which pages/docs to keep or upsample in a training mix).

    EXACT INTEGER arithmetic so the result is order-independent and
    bit-reproducible in ANSI SQL (DuckDB ``//``): with ``d`` =
    ``damping_pct``/100 and every rank an int64 scaled by ``scale``,

        r0(v)    = scale
        r_t+1(v) = ((100-d%)·scale)//100
                   + Σ_{u∈N(v)} (d%·r_t(u)) // (100·deg(u))

    Floor division makes each contribution exact, so the per-node sum
    commutes — no float-association drift between the engine's bucketed
    partial sums and a SQL GROUP BY.  Overflow bound (documented, not
    silent): d%·r ≤ 85·(0.15+0.85·N)·scale must fit int64, which holds
    to N ≈ 10^8 nodes at the default scale=1e9; lower ``scale`` for
    larger graphs.

    Scale shape: same two-keyed-shuffles-per-round BSP as
    :func:`connected_components` — (labels ∪ edges) co-partitioned by
    node-hash bucket, one vectorized merge per bucket emits
    contributions along edges, a second bucketed pass folds them with a
    groupby-sum.  Per-round traffic is edge-sized; the driver never
    sees per-node state.  Edge lists under ``driver_threshold`` take
    the single-task numpy fast path (same rule as CC: BSP orchestration
    dwarfs useful work on small graphs); a pytest forces threshold=0
    and asserts both paths agree bit-exactly.

    With ``seeds`` (an int64 array of node ids), the teleport term goes
    ONLY to seed nodes — personalized PageRank, the "relevance to this
    anchor set" weighting (non-seeds start at 0 and get no base term;
    the contribution rule is unchanged, so exactness and the SQL-oracle
    unrolling carry over verbatim).  The seed set is a broadcast sorted
    array (``ray.put`` once, searchsorted membership inside kernels).

    Returns a Dataset (node int64, rank_scaled int64), one row per node
    that appears in any pair.
    """
    import ray
    from ..runtime import int_bucket_of, num_hash_buckets
    nb = num_hash_buckets()
    base = (100 - damping_pct) * scale // 100
    seeds_sorted = None if seeds is None \
        else np.sort(np.asarray(seeds, dtype=np.int64))

    edges = pairs.map_batches(_edges_both,
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "rank_scaled": pa.array([], pa.int64())}))
    if n_edges <= driver_threshold:
        import ray.data as rd
        return rd.from_pandas(_pr_local(edges, iterations=iterations,
                                        scale=scale,
                                        damping_pct=damping_pct,
                                        seeds=seeds_sorted))
    seeds_ref = ray.put(seeds_sorted)

    def _seed_mask(node_arr: np.ndarray) -> np.ndarray:
        ss = ray.get(seeds_ref)
        if ss is None:
            return np.ones(len(node_arr), dtype=bool)
        if len(ss) == 0:
            return np.zeros(len(node_arr), dtype=bool)
        pos = np.minimum(np.searchsorted(ss, node_arr), len(ss) - 1)
        return ss[pos] == node_arr

    def _bucket(col):
        def fn(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column("__b",
                                   pa.array(int_bucket_of(k, nb)))
        return fn

    def count_deg(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("node", sort=False, as_index=False)
               .size().rename(columns={"size": "deg"}))
        out["rank_scaled"] = np.where(
            _seed_mask(out["node"].to_numpy(np.int64)),
            np.int64(scale), np.int64(0))
        return _arrow(out)

    # labels: (node, deg, rank_scaled) — deg rides inside the label table
    labels = (edges.map_batches(_bucket("node"), batch_format="pyarrow")
              .groupby("__b").map_groups(count_deg, batch_format="pandas")
              .materialize())

    def send(g: pd.DataFrame) -> pa.Table:
        # one bucket of nodes: label rows (nbr null) + edge rows.  Each
        # node sends (d%·r)//(100·deg) to every neighbour and re-emits
        # its own deg so the reducer can rebuild the label table.
        lab = g.loc[g["nbr"].isna(), ["node", "deg", "rank_scaled"]]
        edg = g.loc[g["nbr"].notna(), ["node", "nbr"]]
        m = edg.merge(lab, on="node", how="left")
        c = (np.int64(damping_pct)
             * m["rank_scaled"].to_numpy(dtype=np.int64)
             // (np.int64(100) * m["deg"].to_numpy(dtype=np.int64)))
        node = np.concatenate([m["nbr"].to_numpy(dtype=np.int64),
                               lab["node"].to_numpy(dtype=np.int64)])
        contrib = np.concatenate([c, np.zeros(len(lab), dtype=np.int64)])
        dg = np.concatenate([np.full(len(m), -1, dtype=np.int64),
                             lab["deg"].to_numpy(dtype=np.int64)])
        return pa.table({"node": node, "c": contrib, "d": dg})

    def fold(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("node", sort=False, as_index=False)
               .agg(c=("c", "sum"), deg=("d", "max")))
        base_v = np.where(_seed_mask(out["node"].to_numpy(np.int64)),
                          np.int64(base), np.int64(0))
        out["rank_scaled"] = base_v + out["c"].to_numpy(np.int64)
        return _arrow(out[["node", "deg", "rank_scaled"]])

    for _ in range(iterations):
        lab_rows = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "deg": t["deg"],
                                "rank_scaled": t["rank_scaled"],
                                "nbr": pa.nulls(len(t), pa.int64())}),
            batch_format="pyarrow")
        edge_rows = edges.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "deg": pa.nulls(len(t), pa.int64()),
                                "rank_scaled": pa.nulls(len(t), pa.int64()),
                                "nbr": t["nbr"]}),
            batch_format="pyarrow")
        labels = (lab_rows.union(edge_rows)
                  .map_batches(_bucket("node"), batch_format="pyarrow")
                  .groupby("__b").map_groups(send, batch_format="pandas")
                  .map_batches(_bucket("node"), batch_format="pyarrow")
                  .groupby("__b").map_groups(fold, batch_format="pandas")
                  .materialize())

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "rank_scaled": t["rank_scaled"]}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered wedge join)
# ---------------------------------------------------------------------------

def _tri_local(edges) -> int:
    """Vectorized triangle count over an edge list that fits one task:
    degree-order the nodes, orient every edge low→high rank, generate
    each node's out-neighbour pairs, membership-test them against the
    oriented edge set (packed int64 searchsorted)."""
    import ray
    from ..runtime import block_refs
    t = pa.concat_tables(
        [b for b in ray.get(block_refs(edges)) if b.num_rows])
    u = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    deg = np.bincount(ui, minlength=len(nodes)).astype(np.int64)
    # rank = position in (deg, id) order — a permutation of 0..n-1
    rank = np.empty(len(nodes), dtype=np.int64)
    rank[np.lexsort((np.arange(len(nodes)), deg))] = \
        np.arange(len(nodes), dtype=np.int64)
    ru, rv = rank[ui], rank[vi]
    keep = ru < rv                       # each undirected edge once
    a, b = ru[keep], rv[keep]
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    packed = a << np.int64(32) | b       # ranks are dense -> < 2^31 each
    left, right = _run_pairs(a)
    if len(left) == 0:
        return 0
    x, y = b[left], b[right]             # y follows x in the run: x<y rank
    wedge_key = x << np.int64(32) | y
    pos = np.searchsorted(packed, wedge_key)
    pos = np.minimum(pos, len(packed) - 1)
    return int((packed[pos] == wedge_key).sum())


def _run_pairs(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All index pairs (i, j), i < j, within equal-valued runs of a
    SORTED key array — fully vectorized: the element at run-position p
    pairs with the (run_end - p - 1) elements after it.  The wedge
    generator shared by triangle counting, per-node clustering and
    common-neighbor link prediction."""
    run_change = np.empty(len(a), dtype=bool)
    if len(a):
        run_change[0] = True
        run_change[1:] = a[1:] != a[:-1]
    else:
        return (np.empty(0, np.int64),) * 2
    run_start = np.maximum.accumulate(
        np.where(run_change, np.arange(len(a)), 0))
    run_len = np.repeat(np.diff(np.append(np.flatnonzero(run_change),
                                          len(a))),
                        np.diff(np.append(np.flatnonzero(run_change),
                                          len(a))))
    pos = np.arange(len(a)) - run_start
    c = run_len - pos - 1                # pairs each element opens
    total_w = int(c.sum())
    if total_w == 0:
        return (np.empty(0, np.int64),) * 2
    left = np.repeat(np.arange(len(a)), c)
    off = np.cumsum(c) - c               # first output slot per element
    right = (np.arange(total_w) - np.repeat(off, c)
             + np.repeat(np.arange(len(a)) + 1, c))
    return left, right


def triangle_count(pairs, *, driver_threshold: int = 5_000_000) -> int:
    """Exact triangle count of the undirected graph given as an
    (id_a, id_b) DISTINCT-pair Dataset — the clustering-coefficient /
    community-density primitive.

    Scale shape (the standard degree-ordered wedge join): (1) per-node
    degrees via one bucketed count; (2) degrees attached to both edge
    endpoints with two co-partitioned merges (labels ∪ edges by
    node-hash bucket — the CC/PageRank exchange pattern); (3) each edge
    oriented low→high (deg, id) rank, which bounds every out-adjacency
    by O(√m) and kills the hot-vertex wedge explosion a plain id
    orientation suffers; (4) wedges (out-neighbour pairs) generated per
    center inside hash(center) buckets; (5) wedges ∪ oriented edges
    co-partitioned by pair-hash, counted with one vectorized merge per
    bucket; the driver sums ≤ bucket-count partials.  Every stage is
    edge- or wedge-sized — the corpus never reshuffles.

    Edge lists under ``driver_threshold`` take a single-task numpy fast
    path (same rule as :func:`connected_components`); a pytest forces
    threshold=0 and asserts both paths agree exactly.

    Returns the triangle count as a plain int.
    """
    from ..runtime import int_bucket_of, pair_bucket_of, num_hash_buckets
    nb = num_hash_buckets()

    edges = pairs.map_batches(_edges_both,
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return 0
    if n_edges <= driver_threshold:
        return _tri_local(edges)

    def _bucket(col):
        def fn(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column("__b",
                                   pa.array(int_bucket_of(k, nb)))
        return fn

    def count_deg(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("node", sort=False, as_index=False)
               .size().rename(columns={"size": "deg"}))
        return _arrow(out)

    deg = (edges.map_batches(_bucket("node"), batch_format="pyarrow")
           .groupby("__b").map_groups(count_deg, batch_format="pandas")
           .materialize())

    # attach deg(node) to each directed edge: (node, nbr, dnode)
    def attach(key_from, out_cols):
        def fn(g: pd.DataFrame) -> pa.Table:
            lab = g.loc[g["__lab"], ["__k", "deg"]]
            edg = g.loc[~g["__lab"]].drop(columns=["deg"])
            m = edg.merge(lab, on="__k", how="left")
            return _arrow(m[out_cols].astype("int64"))
        return fn

    deg_rows = deg.map_batches(
        lambda t: pa.table({"__k": t["node"], "deg": t["deg"],
                            "node": pa.nulls(len(t), pa.int64()),
                            "nbr": pa.nulls(len(t), pa.int64()),
                            "dnode": pa.nulls(len(t), pa.int64()),
                            "__lab": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    e_rows = edges.map_batches(
        lambda t: pa.table({"__k": t["node"],
                            "deg": pa.nulls(len(t), pa.int64()),
                            "node": t["node"], "nbr": t["nbr"],
                            "dnode": pa.nulls(len(t), pa.int64()),
                            "__lab": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def attach1(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["__lab"], ["__k", "deg"]]
        edg = g.loc[~g["__lab"], ["node", "nbr"]]
        m = edg.merge(lab.rename(columns={"__k": "node",
                                          "deg": "dnode"}),
                      on="node", how="left")
        return _arrow(m[["node", "nbr", "dnode"]].astype("int64"))

    e1 = (deg_rows.union(e_rows)
          .map_batches(_bucket("__k"), batch_format="pyarrow")
          .groupby("__b").map_groups(attach1, batch_format="pandas")
          .materialize())

    deg_rows2 = deg.map_batches(
        lambda t: pa.table({"__k": t["node"], "deg": t["deg"],
                            "node": pa.nulls(len(t), pa.int64()),
                            "nbr": pa.nulls(len(t), pa.int64()),
                            "dnode": pa.nulls(len(t), pa.int64()),
                            "__lab": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    e1_rows = e1.map_batches(
        lambda t: pa.table({"__k": t["nbr"],
                            "deg": pa.nulls(len(t), pa.int64()),
                            "node": t["node"], "nbr": t["nbr"],
                            "dnode": t["dnode"],
                            "__lab": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def attach2(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["__lab"], ["__k", "deg"]]
        edg = g.loc[~g["__lab"], ["node", "nbr", "dnode"]]
        m = edg.merge(lab.rename(columns={"__k": "nbr", "deg": "dnbr"}),
                      on="nbr", how="left")
        # orient low->high (deg, id) rank; each undirected edge survives
        # exactly once
        keep = ((m["dnode"] < m["dnbr"])
                | ((m["dnode"] == m["dnbr"]) & (m["node"] < m["nbr"])))
        m = m.loc[keep, ["node", "nbr", "dnode", "dnbr"]]
        return _arrow(m.rename(columns={
            "node": "u", "nbr": "v",
            "dnode": "du", "dnbr": "dv"}).astype("int64"))

    oriented = (deg_rows2.union(e1_rows)
                .map_batches(_bucket("__k"), batch_format="pyarrow")
                .groupby("__b").map_groups(attach2, batch_format="pandas")
                .materialize())

    def wedges(g: pd.DataFrame) -> pa.Table:
        # out-neighbour pairs per center, ordered by (deg, id) rank so
        # the wedge key matches the oriented edge's (u, v) layout
        m = g.merge(g, on="u", suffixes=("_1", "_2"))
        lt = ((m["dv_1"] < m["dv_2"])
              | ((m["dv_1"] == m["dv_2"]) & (m["v_1"] < m["v_2"])))
        m = m.loc[lt]
        return _arrow(pd.DataFrame({
            "x": m["v_1"].to_numpy(np.int64),
            "y": m["v_2"].to_numpy(np.int64)}))

    wedge_ds = (oriented.map_batches(_bucket("u"), batch_format="pyarrow")
                .groupby("__b").map_groups(wedges, batch_format="pandas"))

    def _pbucket(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b", pa.array(pair_bucket_of(x, y, nb)))

    w_rows = wedge_ds.map_batches(
        lambda t: pa.table({"x": t["x"], "y": t["y"],
                            "__w": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    oe_rows = oriented.map_batches(
        lambda t: pa.table({"x": t["u"], "y": t["v"],
                            "__w": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def close(g: pd.DataFrame) -> pa.Table:
        w = g.loc[g["__w"], ["x", "y"]]
        e = g.loc[~g["__w"], ["x", "y"]].drop_duplicates()
        n = len(w.merge(e, on=["x", "y"]))
        return pa.table({"n_p": pa.array([n], pa.int64())})

    parts = (w_rows.union(oe_rows)
             .map_batches(_pbucket, batch_format="pyarrow")
             .groupby("__b").map_groups(close, batch_format="pandas"))
    return int(parts.sum("n_p") or 0)


# ---------------------------------------------------------------------------
# Common-neighbor link prediction and per-node clustering coefficient
# ---------------------------------------------------------------------------

_EMPTY_CN = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64"),
                          "n_common": pd.Series(dtype="int64")})


def _gather_edges(edges) -> pa.Table:
    import ray
    from ..runtime import block_refs
    return pa.concat_tables(
        [b for b in ray.get(block_refs(edges)) if b.num_rows])


def _cn_local(edges, k: int) -> pd.DataFrame:
    """Vectorized common-neighbor top-k over an edge list that fits one
    task: sort the directed edge list by (center, nbr), generate each
    center's neighbour pairs with :func:`_run_pairs`, fold with one
    ``np.unique`` over packed (x, y) keys, anti-join the adjacency."""
    t = _gather_edges(edges)
    u = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    order = np.lexsort((vi, ui))
    c, w = ui[order], vi[order]
    left, right = _run_pairs(c)
    if len(left) == 0:
        return _EMPTY_CN.copy()
    key = w[left] << np.int64(32) | w[right]   # dense ids -> < 2^31
    uk, cnt = np.unique(key, return_counts=True)
    keep = ui < vi                             # each undirected edge once
    ekey = np.unique(ui[keep] << np.int64(32) | vi[keep])
    pos = np.minimum(np.searchsorted(ekey, uk), len(ekey) - 1)
    new = ekey[pos] != uk                      # non-adjacent pairs only
    uk, cnt = uk[new], cnt[new]
    # uk ascending == (x, y) ascending, so a stable sort on -cnt is the
    # (n_common desc, id_a, id_b) total order
    sel = np.argsort(-cnt, kind="stable")[:k]
    uk, cnt = uk[sel], cnt[sel]
    return pd.DataFrame({
        "id_a": nodes[uk >> np.int64(32)],
        "id_b": nodes[uk & np.int64(0x7FFFFFFF)],
        "n_common": cnt.astype(np.int64)})


def common_neighbors_topk(pairs, *, k: int = 50,
                          driver_threshold: int = 5_000_000,
                          wedge_threshold: int = 30_000_000):
    """Link prediction over an (id_a, id_b) DISTINCT-pair Dataset: the
    top-k NON-adjacent node pairs by common-neighbour count — the
    classic "customers who bought X also bought Y" recommender
    primitive, deterministically ordered (n_common desc, id_a, id_b).

    Scale shape: wedges (per-center neighbour pairs) are generated
    inside hash(center) buckets — every center's adjacency is whole in
    one bucket, so per-bucket counts are exact partials per (x, y).
    Wedge partials ∪ oriented edges then co-partition by PAIR hash:
    all partials of a pair land in one bucket, so the per-bucket
    sum + adjacency anti-join + local top-k is globally correct and the
    driver merges ≤ buckets × k rows.  Total wedge volume is
    Σ_c deg(c)² — inherent to exact common-neighbour counting (every
    candidate pair must be witnessed); hyper-hub centers should be
    excluded upstream if that sum explodes, which changes the SEMANTICS
    and is therefore not silently done here.

    Edge lists under ``driver_threshold`` take a single-task numpy fast
    path (same rule as :func:`connected_components`) — but ONLY if the
    wedge volume Σ C(deg, 2), computed from one cheap degree pass over
    the (already small) edge list, also stays under
    ``wedge_threshold``: unlike triangles, CN wedges are NOT
    degree-order-bounded, so a modest edge list can hide a multi-GB
    wedge materialization that the bucketed path spreads instead.  A
    pytest forces threshold=0 and asserts both paths agree exactly.
    """
    import ray
    from ..runtime import (block_refs, int_bucket_of, pair_bucket_of,
                           num_hash_buckets)
    nb = num_hash_buckets()

    edges = pairs.map_batches(_edges_both,
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _EMPTY_CN.copy()
    if n_edges <= driver_threshold:
        node = np.concatenate([
            b["node"].to_numpy(zero_copy_only=False)
            for b in ray.get(block_refs(edges)) if b.num_rows])
        _, deg = np.unique(node, return_counts=True)
        n_wedges = int((deg.astype(np.int64)
                        * (deg.astype(np.int64) - 1) // 2).sum())
        if n_wedges <= wedge_threshold:
            return _cn_local(edges, k)

    def _bucket(t: pa.Table) -> pa.Table:
        kk = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b", pa.array(int_bucket_of(kk, nb)))

    def wedge_partials(g: pd.DataFrame) -> pa.Table:
        c = g["node"].to_numpy(np.int64)
        w = g["nbr"].to_numpy(np.int64)
        order = np.lexsort((w, c))
        c, w = c[order], w[order]
        left, right = _run_pairs(c)
        x, y = w[left], w[right]
        if len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        if 0 <= int(w.min()) and int(w.max()) < 2 ** 31:
            # packed-key fold: one np.unique replaces the two-column
            # pandas groupby (the wedge stream is the hot volume here —
            # Σ deg(c)² rows per bucket)
            uk, cnt = np.unique(x << np.int64(32) | y,
                                return_counts=True)
            out = pd.DataFrame({"x": uk >> np.int64(32),
                                "y": uk & np.int64(0x7FFFFFFF),
                                "c": cnt.astype(np.int64)})
        else:
            out = (pd.DataFrame({"x": x, "y": y})
                   .groupby(["x", "y"], sort=False, as_index=False)
                   .size().rename(columns={"size": "c"}))
        return _arrow(out.astype("int64"))

    wedge_ds = (edges.map_batches(_bucket, batch_format="pyarrow")
                .groupby("__b").map_groups(wedge_partials,
                                           batch_format="pandas"))

    def _pbucket(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b", pa.array(pair_bucket_of(x, y, nb)))

    w_rows = wedge_ds.map_batches(
        lambda t: pa.table({"x": t["x"], "y": t["y"], "c": t["c"],
                            "__w": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    e_rows = edges.map_batches(
        lambda t: pa.table({"x": pa.compute.min_element_wise(
                                t["node"], t["nbr"]),
                            "y": pa.compute.max_element_wise(
                                t["node"], t["nbr"]),
                            "c": pa.nulls(len(t), pa.int64()),
                            "__w": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def combine_topk(g: pd.DataFrame) -> pa.Table:
        wm = g["__w"].to_numpy()
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        if len(x) and 0 <= int(x.min()) and int(x.max()) < 2 ** 31 \
                and 0 <= int(y.min()) and int(y.max()) < 2 ** 31:
            wkey = x[wm] << np.int64(32) | y[wm]
            cval = g["c"].to_numpy()[wm].astype(np.int64)
            uk, inv = np.unique(wkey, return_inverse=True)
            cnt = np.bincount(inv, weights=cval).astype(np.int64)
            ekey = np.unique(x[~wm] << np.int64(32) | y[~wm])
            if len(ekey):
                pos = np.minimum(np.searchsorted(ekey, uk),
                                 len(ekey) - 1)
                new = ekey[pos] != uk
                uk, cnt = uk[new], cnt[new]
            sel = np.argsort(-cnt, kind="stable")[:k]  # uk asc = (x,y) asc
            uk, cnt = uk[sel], cnt[sel]
            m = pd.DataFrame({"x": uk >> np.int64(32),
                              "y": uk & np.int64(0x7FFFFFFF),
                              "c": cnt})
        else:
            w = g.loc[g["__w"], ["x", "y", "c"]]
            cn = (w.groupby(["x", "y"], sort=False,
                            as_index=False)["c"].sum())
            e = g.loc[~g["__w"], ["x", "y"]].drop_duplicates()
            m = cn.merge(e, on=["x", "y"], how="left", indicator=True)
            m = m.loc[m["_merge"] == "left_only", ["x", "y", "c"]]
            m = m.sort_values(["c", "x", "y"],
                              ascending=[False, True, True]).head(k)
        return _arrow(m.astype("int64"))

    parts = (w_rows.union(e_rows)
             .map_batches(_pbucket, batch_format="pyarrow")
             .groupby("__b").map_groups(combine_topk,
                                        batch_format="pandas"))
    df = parts.to_pandas().astype("int64")
    df = df.sort_values(["c", "x", "y"],
                        ascending=[False, True, True]).head(k)
    return df.rename(columns={"x": "id_a", "y": "id_b",
                              "c": "n_common"}).reset_index(drop=True)


_EMPTY_DIST = pd.DataFrame({"node": pd.Series(dtype="int64"),
                            "dist": pd.Series(dtype="int64")})


def _bfs_local(edges, seeds: np.ndarray, max_hops: int) -> pd.DataFrame:
    """Vectorized multi-source BFS over an edge list that fits one
    task: one boolean frontier sweep per hop, no per-node Python."""
    t = _gather_edges(edges)
    u = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    dist = np.full(len(nodes), -1, dtype=np.int64)
    dist[np.isin(nodes, seeds)] = 0
    for h in range(1, max_hops + 1):
        hit = vi[dist[ui] == h - 1]
        fresh = hit[dist[hit] < 0]
        if len(fresh) == 0:
            break
        dist[fresh] = h
    keep = dist >= 0
    return pd.DataFrame({"node": nodes[keep], "dist": dist[keep]})


def seed_distance(pairs, seeds, *, max_hops: int = 4,
                  driver_threshold: int = 5_000_000) -> pd.DataFrame:
    """Multi-source BFS over an (id_a, id_b) DISTINCT-pair Dataset:
    each node's hop distance to the nearest SEED node, capped at
    ``max_hops`` — the graph-propagation primitive for spreading
    known-good/known-bad labels through a similarity or co-occurrence
    graph (nodes not reached within the cap are omitted, so the result
    is frontier-sized, never corpus-sized when the cap is tight).

    Scale shape: the :func:`connected_components` BSP exchange run for
    a FIXED ``max_hops`` rounds — (distance labels ∪ edges)
    co-partitioned by node-hash bucket, each node sends dist+1 to its
    neighbours, a bucketed min folds the messages; per-round traffic
    is edge-sized.  Fixed rounds keep the plan deterministic and
    mirror the SQL oracle's capped recursive CTE exactly.  Edge lists
    under ``driver_threshold`` take a single-task numpy frontier sweep;
    a pytest forces threshold=0 and asserts both paths agree.

    Returns pandas (node, dist) sorted by node, dist ∈ [0, max_hops];
    seeds absent from every pair are NOT rows (they have no edges).
    """
    from ..runtime import int_bucket_of, num_hash_buckets
    nb = num_hash_buckets()
    seeds = np.asarray(seeds, dtype=np.int64)

    edges = pairs.map_batches(_edges_both,
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _EMPTY_DIST.copy()
    if n_edges <= driver_threshold:
        return _bfs_local(edges, seeds, max_hops)

    import ray
    seeds_ref = ray.put(np.sort(seeds))
    INF = np.int64(1 << 60)

    def _bucket(t: pa.Table) -> pa.Table:
        kk = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b", pa.array(int_bucket_of(kk, nb)))

    def init_dist(g: pd.DataFrame) -> pa.Table:
        ss = ray.get(seeds_ref)
        node = g["node"].drop_duplicates().to_numpy(np.int64)
        if len(ss):
            pos = np.minimum(np.searchsorted(ss, node), len(ss) - 1)
            is_seed = ss[pos] == node
        else:
            is_seed = np.zeros(len(node), dtype=bool)
        return pa.table({"node": node,
                         "dist": np.where(is_seed, np.int64(0), INF)})

    labels = (edges.map_batches(_bucket, batch_format="pyarrow")
              .groupby("__b").map_groups(init_dist,
                                         batch_format="pandas")
              .materialize())

    def send(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["nbr"].isna(), ["node", "dist"]]
        edg = g.loc[g["nbr"].notna(), ["node", "nbr"]]
        m = edg.merge(lab, on="node", how="left")
        node = np.concatenate([m["nbr"].to_numpy(dtype=np.int64),
                               lab["node"].to_numpy(dtype=np.int64)])
        d = np.concatenate([
            np.minimum(m["dist"].to_numpy(dtype=np.int64), INF - 1) + 1,
            lab["dist"].to_numpy(dtype=np.int64)])
        return pa.table({"node": node, "dist": d})

    def fold_min(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("node", sort=False, as_index=False)["dist"]
               .min())
        return _arrow(out)

    for _ in range(max_hops):
        lab_rows = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "dist": t["dist"],
                                "nbr": pa.nulls(len(t), pa.int64())}),
            batch_format="pyarrow")
        edge_rows = edges.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "dist": pa.nulls(len(t), pa.int64()),
                                "nbr": t["nbr"]}),
            batch_format="pyarrow")
        labels = (lab_rows.union(edge_rows)
                  .map_batches(_bucket, batch_format="pyarrow")
                  .groupby("__b").map_groups(send,
                                             batch_format="pandas")
                  .map_batches(_bucket, batch_format="pyarrow")
                  .groupby("__b").map_groups(fold_min,
                                             batch_format="pandas")
                  .materialize())

    df = labels.to_pandas().astype({"node": "int64", "dist": "int64"})
    df = df[df["dist"] <= max_hops]
    return df.sort_values("node").reset_index(drop=True)


def _nodeclust_local(edges) -> pd.DataFrame:
    """Per-node degree + triangle counts over an edge list that fits
    one task: the :func:`_tri_local` degree-ordered wedge join, with the
    matched wedges' three corners folded per node via ``np.bincount``."""
    t = _gather_edges(edges)
    u = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    deg = np.bincount(ui, minlength=len(nodes)).astype(np.int64)
    rank = np.empty(len(nodes), dtype=np.int64)
    rank[np.lexsort((np.arange(len(nodes)), deg))] = \
        np.arange(len(nodes), dtype=np.int64)
    ru, rv = rank[ui], rank[vi]
    keep = ru < rv
    a, b = ru[keep], rv[keep]
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    packed = a << np.int64(32) | b
    left, right = _run_pairs(a)
    tri_rank = np.zeros(len(nodes), dtype=np.int64)
    if len(left):
        x, y = b[left], b[right]
        wedge_key = x << np.int64(32) | y
        pos = np.minimum(np.searchsorted(packed, wedge_key),
                         len(packed) - 1)
        m = packed[pos] == wedge_key
        corners = np.concatenate([a[left][m], x[m], y[m]])
        tri_rank += np.bincount(corners, minlength=len(nodes))
    return pd.DataFrame({"node": nodes, "deg": deg,
                         "n_tri": tri_rank[rank]})


def node_clustering(pairs, *, driver_threshold: int = 5_000_000):
    """Per-node degree and triangle count of the undirected graph given
    as an (id_a, id_b) DISTINCT-pair Dataset — the inputs of the local
    clustering coefficient cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
    integer-exact so the engine and a SQL oracle agree bit-for-bit.

    Scale shape: identical to :func:`triangle_count` (degrees, two
    co-partitioned degree attaches, low→high (deg, id) orientation,
    per-center wedge generation, wedges ∪ oriented edges co-partitioned
    by pair hash) — except the wedge rows CARRY their center, the
    pair-bucket close emits the three corners of each matched wedge as
    per-node partial counts, and one final node-hash bucketed sum joins
    them with the degree table.  Every stage stays edge- or wedge-sized.

    Returns pandas (node, deg, n_tri) sorted by node, one row per node
    appearing in any pair.  Edge lists under ``driver_threshold`` take
    a single-task numpy fast path; a pytest forces threshold=0 and
    asserts both paths agree exactly.
    """
    from ..runtime import int_bucket_of, pair_bucket_of, num_hash_buckets
    nb = num_hash_buckets()

    edges = pairs.map_batches(_edges_both,
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "deg": pd.Series(dtype="int64"),
                             "n_tri": pd.Series(dtype="int64")})
    if n_edges <= driver_threshold:
        return _nodeclust_local(edges)

    def _bucket(col):
        def fn(t: pa.Table) -> pa.Table:
            kk = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column("__b",
                                   pa.array(int_bucket_of(kk, nb)))
        return fn

    def count_deg(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("node", sort=False, as_index=False)
               .size().rename(columns={"size": "deg"}))
        return _arrow(out)

    deg = (edges.map_batches(_bucket("node"), batch_format="pyarrow")
           .groupby("__b").map_groups(count_deg, batch_format="pandas")
           .materialize())

    # attach deg to both endpoints, orient low->high (deg, id) rank —
    # the exact triangle_count exchange, inlined with the same kernels
    deg_rows = deg.map_batches(
        lambda t: pa.table({"__k": t["node"], "deg": t["deg"],
                            "node": pa.nulls(len(t), pa.int64()),
                            "nbr": pa.nulls(len(t), pa.int64()),
                            "__lab": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    e_rows = edges.map_batches(
        lambda t: pa.table({"__k": t["node"],
                            "deg": pa.nulls(len(t), pa.int64()),
                            "node": t["node"], "nbr": t["nbr"],
                            "__lab": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def attach1(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["__lab"], ["__k", "deg"]]
        edg = g.loc[~g["__lab"], ["node", "nbr"]]
        m = edg.merge(lab.rename(columns={"__k": "node",
                                          "deg": "dnode"}),
                      on="node", how="left")
        return _arrow(m[["node", "nbr", "dnode"]].astype("int64"))

    e1 = (deg_rows.union(e_rows)
          .map_batches(_bucket("__k"), batch_format="pyarrow")
          .groupby("__b").map_groups(attach1, batch_format="pandas")
          .materialize())

    deg_rows2 = deg.map_batches(
        lambda t: pa.table({"__k": t["node"], "deg": t["deg"],
                            "node": pa.nulls(len(t), pa.int64()),
                            "nbr": pa.nulls(len(t), pa.int64()),
                            "dnode": pa.nulls(len(t), pa.int64()),
                            "__lab": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    e1_rows = e1.map_batches(
        lambda t: pa.table({"__k": t["nbr"],
                            "deg": pa.nulls(len(t), pa.int64()),
                            "node": t["node"], "nbr": t["nbr"],
                            "dnode": t["dnode"],
                            "__lab": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def attach2(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["__lab"], ["__k", "deg"]]
        edg = g.loc[~g["__lab"], ["node", "nbr", "dnode"]]
        m = edg.merge(lab.rename(columns={"__k": "nbr", "deg": "dnbr"}),
                      on="nbr", how="left")
        keep = ((m["dnode"] < m["dnbr"])
                | ((m["dnode"] == m["dnbr"]) & (m["node"] < m["nbr"])))
        m = m.loc[keep, ["node", "nbr", "dnode", "dnbr"]]
        return _arrow(m.rename(columns={
            "node": "u", "nbr": "v",
            "dnode": "du", "dnbr": "dv"}).astype("int64"))

    oriented = (deg_rows2.union(e1_rows)
                .map_batches(_bucket("__k"), batch_format="pyarrow")
                .groupby("__b").map_groups(attach2, batch_format="pandas")
                .materialize())

    def wedges(g: pd.DataFrame) -> pa.Table:
        m = g.merge(g, on="u", suffixes=("_1", "_2"))
        lt = ((m["dv_1"] < m["dv_2"])
              | ((m["dv_1"] == m["dv_2"]) & (m["v_1"] < m["v_2"])))
        m = m.loc[lt]
        return _arrow(pd.DataFrame({
            "ctr": m["u"].to_numpy(np.int64),
            "x": m["v_1"].to_numpy(np.int64),
            "y": m["v_2"].to_numpy(np.int64)}))

    wedge_ds = (oriented.map_batches(_bucket("u"), batch_format="pyarrow")
                .groupby("__b").map_groups(wedges, batch_format="pandas"))

    def _pbucket(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__b", pa.array(pair_bucket_of(x, y, nb)))

    w_rows = wedge_ds.map_batches(
        lambda t: pa.table({"ctr": t["ctr"], "x": t["x"], "y": t["y"],
                            "__w": pa.array([True] * len(t))}),
        batch_format="pyarrow")
    oe_rows = oriented.map_batches(
        lambda t: pa.table({"ctr": pa.nulls(len(t), pa.int64()),
                            "x": t["u"], "y": t["v"],
                            "__w": pa.array([False] * len(t))}),
        batch_format="pyarrow")

    def close_corners(g: pd.DataFrame) -> pa.Table:
        w = g.loc[g["__w"], ["ctr", "x", "y"]]
        e = g.loc[~g["__w"], ["x", "y"]].drop_duplicates()
        m = w.merge(e, on=["x", "y"])
        corners = np.concatenate([m["ctr"].to_numpy(np.int64),
                                  m["x"].to_numpy(np.int64),
                                  m["y"].to_numpy(np.int64)])
        out = (pd.DataFrame({"node": corners})
               .groupby("node", sort=False, as_index=False)
               .size().rename(columns={"size": "t"}))
        return _arrow(out.astype("int64"))

    tri_parts = (w_rows.union(oe_rows)
                 .map_batches(_pbucket, batch_format="pyarrow")
                 .groupby("__b").map_groups(close_corners,
                                            batch_format="pandas"))

    # final node-hash bucketed sum of triangle partials, joined with deg
    t_rows = tri_parts.map_batches(
        lambda t: pa.table({"node": t["node"], "t": t["t"],
                            "deg": pa.nulls(len(t), pa.int64())}),
        batch_format="pyarrow")
    d_rows = deg.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "t": pa.nulls(len(t), pa.int64()),
                            "deg": t["deg"]}),
        batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("node", sort=False, as_index=False)
               .agg(n_tri=("t", "sum"), deg=("deg", "max")))
        return _arrow(out[["node", "deg", "n_tri"]].astype("int64"))

    res = (t_rows.union(d_rows)
           .map_batches(_bucket("node"), batch_format="pyarrow")
           .groupby("__b").map_groups(fold, batch_format="pandas"))
    df = res.to_pandas().astype("int64")
    return df.sort_values("node").reset_index(drop=True)
