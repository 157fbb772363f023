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
