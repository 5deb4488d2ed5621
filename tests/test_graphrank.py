"""Graph-analytics pack (engine/graphrank.py): integer PageRank vs a numpy
reference on a handcrafted graph, personalized seeding, triangle counts vs
brute force, and the degree-oriented orientation invariants."""

import sys
from itertools import combinations
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from engine.graphrank import (  # noqa: E402
    D_DEN,
    D_NUM,
    SCALE,
    TELEPORT,
    pagerank_integer,
    project_tools,
    triangles,
)

# A small asymmetric graph: path + star + isolated pair.
EDGES = [
    ("a", "b"),
    ("b", "c"),
    ("c", "d"),
    ("hub", "a"),
    ("hub", "b"),
    ("hub", "c"),
    ("hub", "d"),
    ("x", "y"),
]


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _numpy_pagerank(pairs, n_iter, seeds=None):
    """Literal integer recurrence on the driver: the spec the Spark plan and
    the DuckDB oracle must both reproduce bit-for-bit."""
    sym = pairs + [(b, a) for a, b in pairs]
    nodes = sorted({u for e in sym for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes), dtype=np.int64)
    for u, _ in sym:
        deg[idx[u]] += 1
    seed_mask = (
        np.ones(len(nodes), dtype=bool)
        if seeds is None
        else np.array([n in seeds for n in nodes])
    )
    tele = np.where(seed_mask, TELEPORT, 0).astype(np.int64)
    rank = np.where(seed_mask, SCALE, 0).astype(np.int64)
    for _ in range(n_iter):
        new = tele.copy()
        for u, v in sym:
            iu = idx[u]
            new[idx[v]] += (rank[iu] * D_NUM) // (D_DEN * deg[iu])
        rank = new
    return dict(zip(nodes, rank.tolist()))


def test_pagerank_matches_numpy_reference(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(_sym(spark, EDGES), n_iter=4).collect()
    }
    assert got == _numpy_pagerank(EDGES, 4)


def test_pagerank_more_iterations_still_exact(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            _sym(spark, EDGES), n_iter=9, checkpoint_every=4
        ).collect()
    }
    assert got == _numpy_pagerank(EDGES, 9)


def test_pagerank_hub_ranks_highest(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(_sym(spark, EDGES), n_iter=4).collect()
    }
    assert max(got, key=got.get) == "hub"
    # the isolated pair only ever exchanges its own mass
    assert got["x"] == got["y"]


def test_personalized_pagerank_seeded(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            _sym(spark, EDGES), n_iter=4, seed_pred=F.col("node") == "hub"
        ).collect()
    }
    assert got == _numpy_pagerank(EDGES, 4, seeds={"hub"})
    # nodes unreachable from the seed hold zero rank
    assert got["x"] == 0 and got["y"] == 0
    assert got["hub"] > got["a"] > 0


def test_pagerank_partitioning_invariance(spark):
    """Integer math ⇒ bit-identical under a different shuffle layout."""
    base = pagerank_integer(_sym(spark, EDGES), n_iter=4).collect()
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        alt = pagerank_integer(_sym(spark, EDGES), n_iter=4).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert sorted(map(tuple, base)) == sorted(map(tuple, alt))


# ---------------------------------------------------------------------------
# projection + triangles
# ---------------------------------------------------------------------------

BIP = [
    ("c1", "t1"),
    ("c1", "t2"),
    ("c1", "t3"),
    ("c2", "t1"),
    ("c2", "t2"),
    ("c2", "t3"),
    ("c2", "t4"),
    ("c3", "t3"),
    ("c3", "t4"),
    ("c4", "t1"),
    ("c4", "t4"),
]


def test_projection_counts(spark):
    eb = spark.createDataFrame(BIP, ["conv", "tool"])
    got = {
        (r["tool_a"], r["tool_b"]): r["shared_convs"]
        for r in project_tools(eb).collect()
    }
    convs_of = {}
    for c, t in BIP:
        convs_of.setdefault(t, set()).add(c)
    want = {}
    for a, b in combinations(sorted(convs_of), 2):
        n = len(convs_of[a] & convs_of[b])
        if n:
            want[(a, b)] = n
    assert got == want


def test_triangles_vs_bruteforce(spark):
    eb = spark.createDataFrame(BIP, ["conv", "tool"])
    proj = project_tools(eb)
    got = {r["node"]: (r["deg"], r["triangles"]) for r in triangles(proj).collect()}
    edges = {(r["tool_a"], r["tool_b"]) for r in proj.collect()}
    nodes = sorted({u for e in edges for u in e})
    tri_count = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(nodes, 3):
        if (
            (a, b) in edges
            and (a, c) in edges
            and (b, c) in edges
        ):
            for n in (a, b, c):
                tri_count[n] += 1
    deg = dict.fromkeys(nodes, 0)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    assert got == {n: (deg[n], tri_count[n]) for n in nodes}


def test_triangles_on_triangle_free_graph(spark):
    eb = spark.createDataFrame(
        [("c1", "t1"), ("c1", "t2"), ("c2", "t2"), ("c2", "t3")], ["conv", "tool"]
    )
    t = triangles(project_tools(eb))
    assert all(r["triangles"] == 0 for r in t.collect())


def test_weighted_pagerank_matches_numpy(spark):
    wpairs = [("a", "b", 3), ("b", "c", 1), ("c", "d", 2), ("hub", "a", 5),
              ("hub", "c", 1), ("x", "y", 7)]
    df = spark.createDataFrame(wpairs, ["src", "dst", "w"])
    sym = df.unionAll(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(sym, n_iter=4, weight_col="w").collect()
    }
    # literal weighted recurrence on the driver
    edges = wpairs + [(b, a, w) for a, b, w in wpairs]
    nodes = sorted({u for u, v, _ in edges} | {v for _, v, _ in edges})
    W = {n: 0 for n in nodes}
    for u, _, w in edges:
        W[u] += w
    rank = {n: SCALE for n in nodes}
    for _ in range(4):
        new = {n: TELEPORT for n in nodes}
        for u, v, w in edges:
            new[v] += (rank[u] * D_NUM * w) // (D_DEN * W[u])
        rank = new
    assert got == rank


def test_weighted_unit_equals_unweighted(spark):
    sym = _sym(spark, EDGES)
    unw = sorted(map(tuple, pagerank_integer(sym, n_iter=4).collect()))
    wtd = sorted(
        map(
            tuple,
            pagerank_integer(
                sym.withColumn("w", F.lit(1)), n_iter=4, weight_col="w"
            ).collect(),
        )
    )
    assert unw == wtd


def test_assortativity_matches_numpy(spark):
    from engine.graphrank import degree_assortativity

    sym = _sym(spark, EDGES)
    row = degree_assortativity(sym).first()
    pairs = EDGES + [(b, a) for a, b in EDGES]
    deg = {}
    for u, _ in pairs:
        deg[u] = deg.get(u, 0) + 1
    x = np.array([deg[u] for u, _ in pairs], dtype=np.float64)
    y = np.array([deg[v] for _, v in pairs], dtype=np.float64)
    want = np.corrcoef(x, y)[0, 1]
    assert row["m_edges"] == len(pairs)
    assert abs(row["assortativity"] - want) < 1e-12


def test_kcore_vs_bruteforce_peel(spark):
    from engine.graphrank import kcore_membership

    sym = _sym(spark, EDGES)
    got = {r["node"]: r["deg"] for r in kcore_membership(sym, 2, 8).collect()}
    # brute-force peel to fixpoint
    edges = set(EDGES) | {(b, a) for a, b in EDGES}
    while True:
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        drop = {u for u, d in deg.items() if d < 2}
        if not drop:
            break
        edges = {(u, v) for u, v in edges if u not in drop and v not in drop}
    want = {}
    for u, _ in edges:
        want[u] = want.get(u, 0) + 1
    assert got == want


def test_kcore_fixture_converged(spark):
    """The registered 8-round unrolling must be a fixpoint on the driver
    fixture — one more round changes nothing (otherwise the fixed unroll
    would be reporting a non-converged intermediate)."""
    from engine.graphrank import (
        _KCORE_K,
        _KCORE_ROUNDS,
        bipartite_edges,
        kcore_membership,
    )
    from engine.graphrank import _symmetrize as symz

    eb = bipartite_edges(spark, "/root/testdata/sf0.01")
    a = sorted(
        map(
            tuple,
            kcore_membership(symz(eb), _KCORE_K, _KCORE_ROUNDS).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            kcore_membership(symz(eb), _KCORE_K, _KCORE_ROUNDS + 1).collect(),
        )
    )
    assert a == b and len(a) > 0
