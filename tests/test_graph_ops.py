"""Graph analytics wave: integer-exact PageRank and degree-ordered
triangle counting over the co-purchase graph — each against brute force
on a hostile synthetic corpus (a hub part in every order, an isolated
single-line order contributing no edges, duplicate pairs across orders
that must collapse to one edge, and a degree TIE so the (deg, id)
orientation tiebreak is exercised), plus the forced distributed BSP
paths (driver_threshold=0) asserted bit-identical to the single-task
numpy fast paths."""

import itertools

import numpy as np
import pandas as pd
import pytest

duckdb = pytest.importorskip("duckdb")


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("graph_sf")
    rng = np.random.default_rng(77)
    rows_ok, rows_pk = [], []
    # hub part 0 appears in orders 0..19 (hot vertex)
    for ok in range(20):
        members = {0} | set(rng.choice(np.arange(1, 30), size=4,
                                       replace=False).tolist())
        for pk in members:
            rows_ok.append(ok)
            rows_pk.append(pk)
    # duplicate pair across orders: (40, 41) co-occur three times
    for ok in (100, 101, 102):
        rows_ok += [ok, ok]
        rows_pk += [40, 41]
    # isolated part: order 200 has ONE line -> no edge, node absent
    rows_ok.append(200)
    rows_pk.append(99)
    # duplicate lineitem rows for the same (order, part) must not
    # create a self-pair or change degrees
    rows_ok += [0, 0]
    rows_pk += [0, 0]
    li = pd.DataFrame({
        "l_orderkey": np.array(rows_ok, dtype=np.int64),
        "l_partkey": np.array(rows_pk, dtype=np.int64),
        "l_suppkey": np.ones(len(rows_ok), dtype=np.int64),
        "l_quantity": np.ones(len(rows_ok)),
        "l_extendedprice": np.ones(len(rows_ok)),
        "l_discount": np.zeros(len(rows_ok)),
        "l_shipdate": pd.Timestamp("1995-01-01")})
    li.to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def _brute_edges(sf_dir):
    li = pd.read_parquet(sf_dir + "/lineitem.parquet")
    e = set()
    for _, g in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(set(g["l_partkey"])), 2):
            e.add((a, b))
    return sorted(e)


def _brute_pagerank(edges, iterations=3, scale=10**9, dp=85,
                    seeds=None):
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    base = (100 - dp) * scale // 100

    def b0(v, full):
        return full if seeds is None or v in seeds else 0

    r = {v: b0(v, scale) for v in nbrs}
    for _ in range(iterations):
        nxt = {v: b0(v, base) for v in nbrs}
        for u, ns in nbrs.items():
            c = dp * r[u] // (100 * len(ns))
            for v in ns:
                nxt[v] += c
        r = nxt
    return r


def _brute_triangles(edges):
    es = set(edges)
    nodes = sorted({x for e in edges for x in e})
    n = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            n += 1
    return n


def test_pagerank_vs_brute_and_distributed(sf_dir):
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import pagerank

    edges = _copurchase_edges(sf_dir).materialize()
    brute = _brute_pagerank(_brute_edges(sf_dir))
    got = pagerank(edges).to_pandas().set_index("node")["rank_scaled"]
    assert len(got) == len(brute)
    for v, r in brute.items():
        assert got[v] == r, v
    # forced BSP path, bit-identical
    dist = pagerank(edges, driver_threshold=0).to_pandas() \
        .astype({"node": "int64", "rank_scaled": "int64"}) \
        .set_index("node")["rank_scaled"]
    assert dist.sort_index().equals(got.sort_index())


def test_personalized_pagerank_vs_brute_and_distributed(sf_dir):
    """Seeded teleport: the hub (0) and an ordinary node (7) as seeds —
    non-seeds must start at 0 and get no base term; the forced BSP path
    must match the numpy fast path bit-for-bit."""
    import numpy as np
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import pagerank

    seeds = np.array([0, 7], dtype=np.int64)
    edges = _copurchase_edges(sf_dir).materialize()
    brute = _brute_pagerank(_brute_edges(sf_dir), seeds={0, 7})
    got = pagerank(edges, seeds=seeds).to_pandas() \
        .set_index("node")["rank_scaled"]
    assert len(got) == len(brute)
    for v, r in brute.items():
        assert got[v] == r, v
    # a node far from both seeds still gets SOME flow through the hub,
    # but strictly less than a seed
    assert got[0] > got[got.index.difference([0, 7])].max()
    dist = pagerank(edges, seeds=seeds, driver_threshold=0).to_pandas() \
        .astype({"node": "int64", "rank_scaled": "int64"}) \
        .set_index("node")["rank_scaled"]
    assert dist.sort_index().equals(got.sort_index())


def test_pagerank_mass_conservation(sf_dir):
    # Σ r_t stays within Σ floor losses of N·scale: a sanity invariant
    # independent of the brute oracle
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import pagerank

    got = pagerank(_copurchase_edges(sf_dir)).to_pandas()
    n, scale = len(got), 10**9
    total = int(got["rank_scaled"].sum())
    assert total <= n * scale
    # each node floors at most deg contributions of 1 each per round;
    # bound loosely by edges*2*iterations
    assert total > n * scale - 2 * 3 * 10_000 - n * 3


def test_triangles_vs_brute_and_distributed(sf_dir):
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import triangle_count

    edges = _copurchase_edges(sf_dir).materialize()
    brute = _brute_triangles(_brute_edges(sf_dir))
    assert brute > 0
    assert triangle_count(edges) == brute
    assert triangle_count(edges, driver_threshold=0) == brute


def test_pipelines_vs_duckdb(sf_dir):
    from vframe_ray.pipelines.relational import (pagerank_parts,
                                                 triangle_count_parts)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    want_pr = con.sql("""
WITH dp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
e AS (SELECT DISTINCT a.pk u, b.pk v FROM dp a JOIN dp b
      ON a.ok=b.ok AND a.pk<>b.pk),
deg AS (SELECT u, count(*)::BIGINT d FROM e GROUP BY u),
r0 AS (SELECT u, 1000000000::BIGINT r FROM deg),
r1 AS (SELECT e.v u, 150000000::BIGINT
       + sum((85::BIGINT*r0.r)//(100::BIGINT*deg.d)) r
       FROM e JOIN r0 ON r0.u=e.u JOIN deg ON deg.u=e.u GROUP BY e.v),
r2 AS (SELECT e.v u, 150000000::BIGINT
       + sum((85::BIGINT*r1.r)//(100::BIGINT*deg.d)) r
       FROM e JOIN r1 ON r1.u=e.u JOIN deg ON deg.u=e.u GROUP BY e.v),
r3 AS (SELECT e.v u, 150000000::BIGINT
       + sum((85::BIGINT*r2.r)//(100::BIGINT*deg.d)) r
       FROM e JOIN r2 ON r2.u=e.u JOIN deg ON deg.u=e.u GROUP BY e.v)
SELECT u part_id, r::BIGINT rank_scaled FROM r3
ORDER BY r DESC, u LIMIT 25""").df()
    got_pr = pagerank_parts(sf_dir)
    pd.testing.assert_frame_equal(got_pr, want_pr)

    want_tri = con.sql("""
WITH dp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
e AS (SELECT DISTINCT a.pk u, b.pk v FROM dp a JOIN dp b
      ON a.ok=b.ok AND a.pk<b.pk)
SELECT (SELECT count(*) FROM e ab
        JOIN e ac ON ac.u=ab.u AND ac.v>ab.v
        JOIN e bc ON bc.u=ab.v AND bc.v=ac.v)::BIGINT n_triangles,
       (SELECT count(*) FROM e)::BIGINT n_edges""").df()
    got_tri = triangle_count_parts(sf_dir)
    pd.testing.assert_frame_equal(got_tri, want_tri)


def _brute_common_neighbors(edges, k=50):
    nbrs = {}
    es = set(edges)
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = []
    for x, y in itertools.combinations(sorted(nbrs), 2):
        if (x, y) in es:
            continue
        c = len(nbrs[x] & nbrs[y])
        if c:
            rows.append((x, y, c))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return pd.DataFrame(rows[:k], columns=["id_a", "id_b", "n_common"]) \
        .astype("int64")


def _brute_node_clustering(edges):
    nbrs = {}
    es = set(edges)
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = []
    for v in sorted(nbrs):
        t = sum(1 for x, y in itertools.combinations(sorted(nbrs[v]), 2)
                if (x, y) in es)
        rows.append((v, len(nbrs[v]), t))
    return pd.DataFrame(rows, columns=["node", "deg", "n_tri"]) \
        .astype("int64")


def test_common_neighbors_vs_brute_and_distributed(sf_dir):
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import common_neighbors_topk

    edges = _copurchase_edges(sf_dir).materialize()
    brute = _brute_common_neighbors(_brute_edges(sf_dir))
    assert len(brute) > 0
    got = common_neighbors_topk(edges).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), brute)
    dist = common_neighbors_topk(edges, driver_threshold=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(dist.astype("int64"), brute)


def test_node_clustering_vs_brute_and_distributed(sf_dir):
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import node_clustering

    edges = _copurchase_edges(sf_dir).materialize()
    brute = _brute_node_clustering(_brute_edges(sf_dir))
    assert brute["n_tri"].sum() > 0
    got = node_clustering(edges).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), brute)
    dist = node_clustering(edges, driver_threshold=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(dist.astype("int64"), brute)
    # triangle-handshake invariant: Σ n_tri == 3 × total triangles
    assert got["n_tri"].sum() == 3 * _brute_triangles(_brute_edges(sf_dir))


def _brute_bfs(edges, seeds, max_hops):
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    dist = {v: 0 for v in nbrs if v in seeds}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = {w for v in frontier for w in nbrs[v] if w not in dist}
        for w in nxt:
            dist[w] = h
        frontier = nxt
    return dist


def test_seed_distance_vs_brute_and_distributed(sf_dir):
    """Multi-source BFS: the disconnected (40, 41) component must be
    OMITTED (not rows at -1/INF), the hop cap must truncate, and the
    forced BSP path must equal the frontier-sweep fast path."""
    import numpy as np
    from vframe_ray.pipelines.relational import _copurchase_edges
    from vframe_ray.stages.graph import seed_distance

    edges = _copurchase_edges(sf_dir).materialize()
    for hops in (1, 2):
        brute = _brute_bfs(_brute_edges(sf_dir), {0}, hops)
        got = seed_distance(edges, np.array([0]), max_hops=hops)
        assert dict(zip(got["node"], got["dist"])) == brute
        assert not {40, 41, 99} & set(got["node"])
        dist = seed_distance(edges, np.array([0]), max_hops=hops,
                             driver_threshold=0)
        pd.testing.assert_frame_equal(
            dist.reset_index(drop=True), got.reset_index(drop=True))
    # a seed with no edges contributes nothing; unknown seed id is a
    # no-op, not an error
    got = seed_distance(edges, np.array([99, 123456]), max_hops=2)
    assert len(got) == 0


def test_graph_pipelines_vs_duckdb_round5(sf_dir):
    from vframe_ray.pipelines.relational import (common_neighbors_parts,
                                                 clustering_parts)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    want_cn = con.sql("""
WITH dp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
eo AS (SELECT DISTINCT a.pk u, b.pk v FROM dp a JOIN dp b
       ON a.ok=b.ok AND a.pk<b.pk),
e AS (SELECT u, v FROM eo UNION ALL SELECT v AS u, u AS v FROM eo),
cn AS (SELECT e1.v x, e2.v y, count(*)::BIGINT n_common
       FROM e e1 JOIN e e2 ON e1.u=e2.u AND e1.v<e2.v
       GROUP BY x, y)
SELECT cn.x id_a, cn.y id_b, cn.n_common
FROM cn WHERE NOT EXISTS (SELECT 1 FROM eo
                          WHERE eo.u=cn.x AND eo.v=cn.y)
ORDER BY n_common DESC, id_a, id_b LIMIT 50""").df().astype("int64")
    got_cn = common_neighbors_parts(sf_dir).astype("int64")
    pd.testing.assert_frame_equal(got_cn, want_cn)

    want_cc = con.sql("""
WITH dp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
eo AS (SELECT DISTINCT a.pk u, b.pk v FROM dp a JOIN dp b
       ON a.ok=b.ok AND a.pk<b.pk),
e AS (SELECT u, v FROM eo UNION ALL SELECT v AS u, u AS v FROM eo),
deg AS (SELECT u node, count(*)::BIGINT deg FROM e GROUP BY u),
tri AS (SELECT ab.u a, ab.v b, ac.v c FROM eo ab
        JOIN eo ac ON ac.u=ab.u AND ac.v>ab.v
        JOIN eo bc ON bc.u=ab.v AND bc.v=ac.v),
pt AS (SELECT node, count(*)::BIGINT n_tri FROM
       (SELECT a node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY node)
SELECT deg.node part_id, deg.deg,
       coalesce(pt.n_tri, 0)::BIGINT n_tri,
       CASE WHEN deg.deg >= 2
            THEN (2.0 * coalesce(pt.n_tri, 0)) / (deg.deg * (deg.deg - 1))
            ELSE 0.0 END AS clustering
FROM deg LEFT JOIN pt ON pt.node=deg.node
ORDER BY part_id""").df()
    want_cc["part_id"] = want_cc["part_id"].astype("int64")
    got_cc = clustering_parts(sf_dir)
    pd.testing.assert_frame_equal(got_cc, want_cc)


def test_empty_graph():
    import ray.data as rd
    import pyarrow as pa
    from vframe_ray.stages.graph import (pagerank, triangle_count,
                                         common_neighbors_topk,
                                         node_clustering)

    empty = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                    "id_b": pa.array([], pa.int64())}))
    assert triangle_count(empty) == 0
    assert pagerank(empty).count() == 0
    assert len(common_neighbors_topk(empty)) == 0
    assert len(node_clustering(empty)) == 0
