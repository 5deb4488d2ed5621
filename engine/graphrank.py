"""Graph analytics over the conv↔tool bipartite graph (SURVEY.md §2 M91–M94):
integer-scaled PageRank, personalized PageRank, bipartite projection, and
degree-oriented triangle counting — all full-hash checkable.

Fixed-point discipline (the M23/CUSUM lesson applied to iterative graph
algorithms): float PageRank is aggregation-order-dependent, so the rank is
kept in **integer 2^-30 units** and every redistribution is exact integer
arithmetic — `contrib(u→v) = (rank_u * 17) div (20 * deg_u)` (damping 0.85
as the exact rational 17/20, floor division identical in Spark `div` and
DuckDB `//` for nonnegative operands). Integer sums are associative under
any partitioning, so the result is bit-identical across engines, shuffle
partitionings, and executor counts — which is what lets the driver hash it.

Scale notes (100 TB):
- Each PageRank iteration is one edge⨝rank hash join + one groupBy(dst)
  partial/final sum — the same per-round cost model GraphX pays, without
  the dependency. Ranks are one row per node; edges dominate and are
  scanned once per round with the same (src) partitioning reused.
- The bipartite projection is quadratic in per-conversation tool degree;
  hot conversations are the classic blow-up, bounded here the standard way
  (cap / threshold documented on the function). Candidate pairs never
  leave (conv) partitioning until the final pair-count aggregate.
- Triangle counting uses degree-ordered edge orientation, which bounds the
  wedge fan-out per node by O(sqrt(edges)) (arboricity argument) instead of
  the max raw degree — the difference between a tractable and an
  intractable join on a skewed graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register

SCALE = 1 << 30  # rank fixed point: 1.0 == 2^30
D_NUM, D_DEN = 17, 20  # damping 0.85 as an exact rational
TELEPORT = (D_DEN - D_NUM) * SCALE // D_DEN  # (1-d) in 2^-30 units
N_ITER = 4

# ---------------------------------------------------------------------------
# Edge construction: conv ↔ tool from the events fixture
# ---------------------------------------------------------------------------

# conv nodes are prefixed 'u' (no event_type starts with 'u', so node_type
# is decidable from the name alone); tool nodes are event_type + '-' + k.
_EB_SQL = """
SELECT DISTINCT
  'u' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv,
  event_type || '-' || lpad(json_extract_string(props, '$.k'), 2, '0') AS tool
FROM events
"""


def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct conv↔tool edges from the events fixture."""
    from .queries import _t

    e = _t(spark, sf_dir, "events")
    conv = F.concat(F.lit("u"), F.lpad(F.col("user_id").cast("string"), 4, "0"))
    k = F.get_json_object("props", "$.k")
    tool = F.concat(F.col("event_type"), F.lit("-"), F.lpad(k, 2, "0"))
    return e.select(conv.alias("conv"), tool.alias("tool")).distinct()


def _symmetrize(eb: DataFrame) -> DataFrame:
    return eb.select(F.col("conv").alias("src"), F.col("tool").alias("dst")).unionAll(
        eb.select(F.col("tool").alias("src"), F.col("conv").alias("dst"))
    )


# ---------------------------------------------------------------------------
# Integer-scaled PageRank (generic API)
# ---------------------------------------------------------------------------


def pagerank_integer(
    edges_sym: DataFrame,
    n_iter: int = N_ITER,
    seed_pred: F.Column | None = None,
    checkpoint_every: int | None = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministic integer PageRank over a symmetric (src, dst) edge set.

    rank_{t+1}(v) = tele(v) + Σ_{u→v} (rank_t(u) * 17 * w_uv) div
    (20 * W(u)), all in 2^-30 integer units, where w_uv is the integer
    edge weight (1 without ``weight_col``) and W(u) the node's total
    out-weight — unweighted behaviour is the w=1 special case, exactly.
    With ``seed_pred`` (a boolean Column over ``node``) the teleport/init
    mass is restricted to seed nodes — personalized PageRank. Returns
    (node, rank) with rank BIGINT.

    Every iteration's state is one row per node; lineage is cut with
    localCheckpoint every ``checkpoint_every`` rounds so long runs don't
    accrete a 2·n_iter-join plan.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    edges_sym = edges_sym.select("src", "dst", w.cast("long").alias("_w"))
    deg = edges_sym.groupBy("src").agg(F.sum("_w").alias("deg"))
    es = edges_sym.join(deg, "src")
    if seed_pred is None:
        tele = F.lit(TELEPORT)
        init = F.lit(SCALE)
    else:
        tele = F.when(seed_pred, F.lit(TELEPORT)).otherwise(F.lit(0))
        init = F.when(seed_pred, F.lit(SCALE)).otherwise(F.lit(0))
    base = (
        edges_sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", tele.cast("long").alias("tele"))
    )
    r = base.select("node", init.cast("long").alias("rank"))
    for i in range(n_iter):
        contrib = (
            es.join(r.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.expr(f"(rank * {D_NUM} * _w) div ({D_DEN} * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        r = (
            base.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.col("tele") + F.coalesce(F.col("c"), F.lit(0))).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            r = r.localCheckpoint(eager=True)
    return r


# ---------------------------------------------------------------------------
# Bipartite projection + degree-oriented triangles (generic API)
# ---------------------------------------------------------------------------


def project_tools(eb: DataFrame, min_shared: int = 1) -> DataFrame:
    """Tool–tool projection: (tool_a < tool_b, shared_convs) for tool pairs
    co-occurring in a conversation. Quadratic in per-conversation tool
    degree — at scale, cap hot conversations (filter convs whose distinct
    tool count exceeds a bound) before calling; the candidate join never
    leaves (conv) partitioning until the final pair-count aggregate."""
    a = eb.select("conv", F.col("tool").alias("tool_a"))
    b = eb.select("conv", F.col("tool").alias("tool_b"))
    p = (
        a.join(b, "conv")
        .filter(F.col("tool_a") < F.col("tool_b"))
        .groupBy("tool_a", "tool_b")
        .agg(F.count("*").alias("shared_convs"))
    )
    if min_shared > 1:
        p = p.filter(F.col("shared_convs") >= min_shared)
    return p


def triangles(proj: DataFrame) -> DataFrame:
    """Per-node triangle counts on an undirected (tool_a < tool_b) edge set,
    via degree-ordered orientation: every edge points from the endpoint with
    smaller (deg, node) to the larger, so each triangle is found exactly once
    as an oriented wedge (a→b, a→c with b before c) closed by (b→c). The
    wedge fan-out per node is bounded by the number of HIGHER-degree
    neighbours, i.e. O(sqrt(E)) — the orientation is what keeps this join
    tractable on skewed graphs. Returns (node, deg, triangles)."""
    sym = proj.select(
        F.col("tool_a").alias("u"), F.col("tool_b").alias("v")
    ).unionAll(proj.select(F.col("tool_b").alias("u"), F.col("tool_a").alias("v")))
    pdeg = sym.groupBy("u").agg(F.count("*").alias("deg")).withColumnRenamed("u", "node")
    e = (
        sym.join(pdeg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(pdeg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            F.col("dv").alias("degb"),
        )
    )
    e1 = e.select(F.col("a"), F.col("b").alias("b1"), F.col("degb").alias("d1"))
    e2 = e.select(F.col("a"), F.col("b").alias("b2"), F.col("degb").alias("d2"))
    wedges = e1.join(e2, "a").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("b1") < F.col("b2")))
    )
    closing = e.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tri = wedges.join(closing, ["b1", "b2"])
    percorner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b1").alias("node")))
        .unionAll(tri.select(F.col("b2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return pdeg.join(percorner, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )


# ---------------------------------------------------------------------------
# Driver-registered queries + DuckDB oracles
# ---------------------------------------------------------------------------


#: default (bipartite, unit-weight) edge CTEs for _pr_cte
_PR_EDGES = (
    f"eb AS ({_EB_SQL}),\n"
    "e AS (SELECT conv AS src, tool AS dst, CAST(1 AS BIGINT) AS w FROM eb"
    " UNION ALL SELECT tool AS src, conv AS dst, CAST(1 AS BIGINT) AS w FROM eb)"
)


def _pr_cte(
    tele_expr: str,
    init_expr: str,
    n_iter: int = N_ITER,
    edges_cte: str = _PR_EDGES,
) -> str:
    """Unrolled integer-PageRank CTE chain ending in r{n_iter}(node, rk).
    `edges_cte` must define e(src, dst, w); contributions are the weighted
    recurrence (rk·17·w) // (20·W(u)) — DuckDB's `//` and Spark's `div`
    agree (floor) for nonnegative operands, and unit weights reduce to the
    unweighted rule exactly."""
    parts = [
        edges_cte,
        "deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS deg"
        " FROM e GROUP BY 1)",
        f"n AS (SELECT node, CAST({tele_expr} AS BIGINT) AS tele FROM deg)",
        f"r0 AS (SELECT node, CAST({init_expr} AS BIGINT) AS rk FROM n)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM((r.rk * {D_NUM} * e.w) // ({D_DEN} * d.deg))"
            f" AS BIGINT) AS c"
            f" FROM e JOIN r{i - 1} r ON e.src = r.node"
            f" JOIN deg d ON e.src = d.node GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, CAST(n.tele + COALESCE(c.c, 0) AS BIGINT)"
            f" AS rk FROM n LEFT JOIN c{i} c USING (node))"
        )
    return "WITH " + ",\n".join(parts)


_PR_SQL = (
    _pr_cte(str(TELEPORT), str(SCALE))
    + f"""
SELECT node,
       CASE WHEN node LIKE 'u%' THEN 'conv' ELSE 'tool' END AS node_type,
       rk AS rank_scaled
FROM r{N_ITER} ORDER BY rank_scaled DESC, node LIMIT 25
"""
)

_PPR_SQL = (
    _pr_cte(
        f"CASE WHEN node LIKE 'error-%' THEN {TELEPORT} ELSE 0 END",
        f"CASE WHEN node LIKE 'error-%' THEN {SCALE} ELSE 0 END",
    )
    + f"""
SELECT node, rk AS rank_scaled
FROM r{N_ITER} WHERE node LIKE 'u%'
ORDER BY rank_scaled DESC, node LIMIT 25
"""
)


@register("pagerank_conv_tool", _PR_SQL)
def pagerank_conv_tool(spark, sf_dir):
    """M91: integer-scaled PageRank (4 iterations, damping 17/20) over the
    symmetric conv↔tool bipartite graph; top-25 nodes. Bit-exact across
    engines/partitionings because every redistribution is floor-div integer
    math — the oracle unrolls the same recurrence as chained CTEs."""
    eb = bipartite_edges(spark, sf_dir)
    r = pagerank_integer(_symmetrize(eb), checkpoint_every=None)
    return (
        r.select(
            "node",
            F.when(F.col("node").startswith("u"), F.lit("conv"))
            .otherwise(F.lit("tool"))
            .alias("node_type"),
            F.col("rank").alias("rank_scaled"),
        )
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(25)
    )


@register("ppr_error_tools", _PPR_SQL)
def ppr_error_tools(spark, sf_dir):
    """M92: personalized PageRank seeded at the error-* tool nodes — which
    conversations are most associated with error tooling. Same integer
    recurrence with teleport/init mass restricted to the seed set."""
    eb = bipartite_edges(spark, sf_dir)
    r = pagerank_integer(
        _symmetrize(eb),
        seed_pred=F.col("node").startswith("error-"),
        checkpoint_every=None,
    )
    return (
        r.filter(F.col("node").startswith("u"))
        .select("node", F.col("rank").alias("rank_scaled"))
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(25)
    )


_PROJ_SQL = f"""
WITH eb AS ({_EB_SQL}),
tdeg AS (SELECT tool, COUNT(*) AS deg FROM eb GROUP BY 1),
p AS (SELECT a.tool AS tool_a, b.tool AS tool_b, COUNT(*) AS shared_convs
      FROM eb a JOIN eb b ON a.conv = b.conv AND a.tool < b.tool GROUP BY 1, 2)
SELECT p.tool_a, p.tool_b, p.shared_convs,
       da.deg AS deg_a, db.deg AS deg_b,
       CAST((p.shared_convs * 1000000)
            // (da.deg + db.deg - p.shared_convs) AS BIGINT) AS jaccard_ppm
FROM p JOIN tdeg da ON p.tool_a = da.tool JOIN tdeg db ON p.tool_b = db.tool
ORDER BY p.shared_convs DESC, p.tool_a, p.tool_b LIMIT 30
"""


@register("bipartite_tool_projection", _PROJ_SQL)
def bipartite_tool_projection(spark, sf_dir):
    """M93: bipartite tool–tool projection with integer-ppm Jaccard
    (shared / (deg_a + deg_b - shared)); top-30 co-occurring tool pairs."""
    eb = bipartite_edges(spark, sf_dir)
    tdeg = eb.groupBy("tool").agg(F.count("*").alias("deg"))
    p = project_tools(eb)
    return (
        p.join(
            tdeg.withColumnRenamed("tool", "tool_a").withColumnRenamed("deg", "deg_a"),
            "tool_a",
        )
        .join(
            tdeg.withColumnRenamed("tool", "tool_b").withColumnRenamed("deg", "deg_b"),
            "tool_b",
        )
        .select(
            "tool_a",
            "tool_b",
            "shared_convs",
            "deg_a",
            "deg_b",
            F.expr(
                "(shared_convs * 1000000) div (deg_a + deg_b - shared_convs)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("shared_convs"), "tool_a", "tool_b")
        .limit(30)
    )


_TRI_MIN_SHARED = 6

_TRI_SQL = f"""
WITH eb AS ({_EB_SQL}),
p AS (SELECT a.tool AS tool_a, b.tool AS tool_b, COUNT(*) AS shared_convs
      FROM eb a JOIN eb b ON a.conv = b.conv AND a.tool < b.tool
      GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SHARED}),
sym AS (SELECT tool_a AS u, tool_b AS v FROM p
        UNION ALL SELECT tool_b AS u, tool_a AS v FROM p),
pdeg AS (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
oe AS (SELECT s.u AS a, s.v AS b, dv.deg AS degb
       FROM sym s JOIN pdeg du ON s.u = du.node JOIN pdeg dv ON s.v = dv.node
       WHERE du.deg < dv.deg OR (du.deg = dv.deg AND s.u < s.v)),
w AS (SELECT e1.a AS a, e1.b AS b1, e2.b AS b2
      FROM oe e1 JOIN oe e2 ON e1.a = e2.a
      WHERE e1.degb < e2.degb OR (e1.degb = e2.degb AND e1.b < e2.b)),
tri AS (SELECT w.a, w.b1, w.b2 FROM w JOIN oe e3 ON w.b1 = e3.a AND w.b2 = e3.b),
corners AS (SELECT a AS node FROM tri UNION ALL SELECT b1 FROM tri
            UNION ALL SELECT b2 FROM tri),
tc AS (SELECT node, COUNT(*) AS triangles FROM corners GROUP BY 1)
SELECT d.node, d.deg, COALESCE(tc.triangles, 0) AS triangles,
       CAST((2 * COALESCE(tc.triangles, 0) * 1000000)
            // (d.deg * (d.deg - 1)) AS BIGINT) AS clustering_ppm
FROM pdeg d LEFT JOIN tc USING (node)
WHERE d.deg >= 2
ORDER BY triangles DESC, node LIMIT 20
"""


@register("tool_triangle_count", _TRI_SQL)
def tool_triangle_count(spark, sf_dir):
    """M94: per-node triangle counts + integer-ppm clustering coefficient on
    the thresholded tool projection (shared_convs >= 6 sparsifies the
    near-complete co-occurrence graph), via degree-ordered orientation."""
    eb = bipartite_edges(spark, sf_dir)
    proj = project_tools(eb, min_shared=_TRI_MIN_SHARED)
    t = triangles(proj)
    return (
        t.filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            "triangles",
            F.expr("(2 * triangles * 1000000) div (deg * (deg - 1))").alias(
                "clustering_ppm"
            ),
        )
        .orderBy(F.desc("triangles"), "node")
        .limit(20)
    )


_WPR_MIN_SHARED = 2

_WPR_EDGES = f"""eb AS ({_EB_SQL}),
p AS (SELECT a.tool AS tool_a, b.tool AS tool_b,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM eb a JOIN eb b ON a.conv = b.conv AND a.tool < b.tool
      GROUP BY 1, 2 HAVING COUNT(*) >= {_WPR_MIN_SHARED}),
e AS (SELECT tool_a AS src, tool_b AS dst, w FROM p
      UNION ALL SELECT tool_b AS src, tool_a AS dst, w FROM p)"""

_WPR_SQL = (
    _pr_cte(str(TELEPORT), str(SCALE), edges_cte=_WPR_EDGES)
    + f"""
SELECT node, rk AS rank_scaled
FROM r{N_ITER} ORDER BY rank_scaled DESC, node LIMIT 25
"""
)


@register("pagerank_tool_weighted", _WPR_SQL)
def pagerank_tool_weighted(spark, sf_dir):
    """M91 weighted variant: integer PageRank over the tool–tool projection
    with edge weight = shared conversations (threshold ≥ 2) — each node's
    mass splits proportionally to integer edge weights, still floor-div
    exact: contribution = (rank·17·w) div (20·W(u)). Centrality on the
    co-usage graph rather than the raw bipartite one."""
    eb = bipartite_edges(spark, sf_dir)
    p = project_tools(eb, min_shared=_WPR_MIN_SHARED)
    sym = p.select(
        F.col("tool_a").alias("src"),
        F.col("tool_b").alias("dst"),
        F.col("shared_convs").alias("w"),
    ).unionAll(
        p.select(
            F.col("tool_b").alias("src"),
            F.col("tool_a").alias("dst"),
            F.col("shared_convs").alias("w"),
        )
    )
    r = pagerank_integer(sym, checkpoint_every=None, weight_col="w")
    return (
        r.select("node", F.col("rank").alias("rank_scaled"))
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# M98: degree assortativity + M99: fixed-k core membership
# ---------------------------------------------------------------------------


def degree_assortativity(sym: DataFrame) -> DataFrame:
    """Newman degree assortativity of an undirected graph given as a
    SYMMETRIC (src, dst) edge set: the Pearson correlation of (deg(src),
    deg(dst)) over directed edge instances. Every sufficient statistic
    (n, Σx, Σy, Σxy, Σx², Σy²) is an exact integer partial+final SUM, and
    r is ONE closed-form IEEE expression over them — bit-identical across
    engines and partitionings, same discipline as M90's rolling
    correlation. Returns one row (m_edges, r)."""
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    dd = (
        sym.join(deg.withColumnRenamed("src", "s2").withColumnRenamed("deg", "dx"),
                 sym.src == F.col("s2"))
        .join(deg.withColumnRenamed("src", "d2").withColumnRenamed("deg", "dy"),
              sym.dst == F.col("d2"))
        .select("dx", "dy")
    )
    s = dd.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    return s.select(
        n.alias("m_edges"),
        (
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        ).alias("assortativity"),
    )


_KCORE_K = 3
_KCORE_ROUNDS = 8


def kcore_membership(sym: DataFrame, k: int, rounds: int) -> DataFrame:
    """Fixed-k core membership by `rounds` peeling iterations: repeatedly
    drop nodes with degree < k (and their edges). Peeling converges in a
    data-dependent number of rounds, so the FIXED unrolling is the
    portability contract — any two engines running the same `rounds` agree
    exactly, and convergence on a given dataset is asserted separately
    (pytest: one more round is a no-op). Each round is one degree agg +
    two semi-joins; the edge set is localCheckpoint'd EVERY round — the
    degree agg and the join both consume it, so an uncheckpointed loop
    recomputes the whole prior lineage twice per round (2^rounds blow-up,
    the engine/graph.py lesson re-learned). Returns the surviving
    (node, deg) rows — deg is the within-core degree."""
    e = sym.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        e = (
            e.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
        ).localCheckpoint(eager=True)
    return (
        e.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )


_ASSORT_SQL = f"""
WITH eb AS ({_EB_SQL}),
e AS (SELECT conv AS src, tool AS dst FROM eb
      UNION ALL SELECT tool AS src, conv AS dst FROM eb),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
dd AS (SELECT dx.deg AS x, dy.deg AS y
       FROM e JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node),
s AS (SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM dd)
SELECT n AS m_edges,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         AS assortativity
FROM s
"""


@register("graph_assortativity", _ASSORT_SQL)
def graph_assortativity(spark, sf_dir):
    """M98: degree assortativity of the conv↔tool bipartite graph — one
    closed-form IEEE expression over six exact-integer edge sums (bipartite
    graphs are typically disassortative; the sign is the sanity signal)."""
    eb = bipartite_edges(spark, sf_dir)
    return degree_assortativity(_symmetrize(eb))


def _kcore_sql(k: int, rounds: int) -> str:
    parts = [
        f"eb AS ({_EB_SQL})",
        # MATERIALIZED: every e{i}/k{i} is referenced twice downstream —
        # default CTE inlining duplicates the subtree per reference, which
        # doubles the plan every round (2^rounds; measured as a hang at 8)
        "e0 AS MATERIALIZED (SELECT conv AS src, tool AS dst FROM eb"
        " UNION ALL SELECT tool AS src, conv AS dst FROM eb)",
    ]
    for i in range(rounds):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT src FROM e{i} GROUP BY src"
            f" HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i} e"
            f" JOIN k{i} a ON e.src = a.src"
            f" JOIN k{i} b ON e.dst = b.src)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT src AS node, COUNT(*) AS deg FROM e{rounds}"
        " GROUP BY 1 ORDER BY node"
    )


@register("graph_kcore_members", _kcore_sql(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore_members(spark, sf_dir):
    """M99: 3-core membership of the conv↔tool graph by 8 unrolled peeling
    rounds (fixed unrolling IS the cross-engine contract; convergence on
    this fixture is pytest-asserted by a 9th-round no-op check). Surviving
    nodes with their within-core degrees."""
    eb = bipartite_edges(spark, sf_dir)
    return kcore_membership(
        _symmetrize(eb), _KCORE_K, _KCORE_ROUNDS
    ).orderBy("node")
