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
a co-group of (labels ∪ edges) by node emits each node's current label
to its neighbours, then a ``groupby(node).aggregate(Min)`` folds the
messages.  Labels are monotonically non-increasing, so the fixpoint test
is "sum(labels) unchanged" — one cheap aggregate per round over the
materialized (tiny) label table.

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


def connected_components(pairs, *, max_rounds: int = 64):
    """Label every node of an (id_a, id_b) pair Dataset with the minimum
    node id reachable from it.

    Returns a pandas DataFrame (doc_id, cluster_id) sorted by doc_id —
    one row per node that appears in any pair.  The result is small by
    construction (dup-candidate nodes only); the per-round work is
    distributed.
    """
    from ray.data.aggregate import Min

    edges = pairs.map_batches(_edges_both, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return _EMPTY_CC.copy()

    # Round 0 for free: label(v) = min(v, min nbr(v)).
    labels = edges.groupby("node").aggregate(Min("nbr", alias_name="lbl"))
    labels = labels.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "lbl": pa.compute.min_element_wise(t["node"], t["lbl"])}),
        batch_format="pyarrow").materialize()
    total = labels.sum("lbl")

    def propagate(g: pd.DataFrame) -> pa.Table:
        # Co-grouped rows for one node: exactly one label row (nbr null)
        # plus this node's outgoing edges.  Send lbl to every neighbour
        # and keep it for the node itself.
        lbl = int(g["lbl"].min())
        nbrs = g["nbr"].dropna().to_numpy(dtype=np.int64)
        node = np.concatenate([nbrs, [int(g["node"].iloc[0])]])
        return pa.table({"node": node,
                         "lbl": np.full(len(node), lbl, dtype=np.int64)})

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
        msgs = lab_rows.union(edge_rows).groupby("node") \
            .map_groups(propagate, batch_format="pandas")
        labels = msgs.groupby("node") \
            .aggregate(Min("lbl", alias_name="lbl")).materialize()
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
