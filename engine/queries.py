"""Driver-verified query registry (SURVEY.md §2 + §5.7).

Every SQL-expressible operator gets a (PySpark callable, DuckDB oracle SQL)
pair keyed by the same name; the driver compares row-count + schema +
order-insensitive value hash at sf0.01.

PORTABILITY RULES (how these pairs stay hash-identical across engines):
  1. Money/value doubles are converted to integer cents (BIGINT) before any
     aggregation — integer sums are exact under any aggregation order or
     partitioning; final ratios are a single IEEE division, bit-identical in
     both engines. No rounded-float-sum ever reaches the hash.
  2. Ratios/means are written as the same division expression in both
     engines (sum/count), never via engine `avg` (whose internal summation
     order is unspecified).
  3. Window frames are explicit ROWS frames with unique ORDER BY keys.
  4. Timestamps stay in UTC (session TZ pinned per query).
  5. Float32 embedding math is cast to double up front; outputs of genuinely
     float-accumulating ops (cosine) are rounded to 6 dp where accumulated
     error is ~1e-15 — twelve orders of magnitude below the round boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import io as eio

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = f"q_{name}"
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE_SQL[name] = sql
        return wrapped

    return deco


def _t(spark, sf_dir, name) -> DataFrame:
    return eio.read_table(spark, sf_dir, name)


def cents(c) -> F.Column:
    """Exact integer representation of a 2-decimal money double."""
    return F.round(c * 100).cast("long")


# ---------------------------------------------------------------------------
# A/B/D: scans, filters, core aggregation
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND(100 - l_discount * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
           COUNT(*) AS count_order,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """D1: TPC-H Q1-style hash aggregate with partial/final combine;
    exact-integer money math (see module docstring rule 1)."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = cents(F.col("l_quantity"))
    price_c = cents(F.col("l_extendedprice"))
    disc_pct = F.round(100 - F.col("l_discount") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / 100.0).alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(price_c * disc_pct) / 10000.0).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            (F.sum(qty_c) / 100.0 / F.count("*")).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag <> 'A'
    """,
)
def filter_project(spark, sf_dir):
    """B1/B2: predicate + column pruning; both push to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") != "A")).select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )


@register(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(100 - l.l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderkey, c.c_name
    ORDER BY revenue_c4 DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark, sf_dir):
    """D1 + H3 with aggregate-before-join: revenue is a function of
    lineitem alone and o_orderkey is the grouping key, so the top-10 is
    decided by one partial-agg shuffle of lineitem + TakeOrderedAndProject
    — BEFORE any join. The 10 surviving rows then broadcast into the
    orders/customer lookups, so the fact⨝fact shuffle join of the naive
    plan (join-then-aggregate) never happens at any scale. Tie-break
    (revenue, orderkey) is the final ORDER BY, so pre-join and post-join
    top-10 sets are identical. PRECONDITION: lineitem.l_orderkey ⊆
    orders.o_orderkey and orders.o_custkey ⊆ customer.c_custkey (TPC-H
    referential integrity) — a dangling fact key would be ranked into the
    pre-join top-10 and then dropped by the inner lookups, where the
    join-then-aggregate formulation would instead surface the 11th."""
    li, o, c = (_t(spark, sf_dir, n) for n in ("lineitem", "orders", "customer"))
    price_c = cents(F.col("l_extendedprice"))
    disc_pct = F.round(100 - F.col("l_discount") * 100).cast("long")
    top = (
        li.groupBy("l_orderkey")
        .agg(F.sum(price_c * disc_pct).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), "l_orderkey")
        .limit(10)
    )
    with_cust = o.join(F.broadcast(top), top.l_orderkey == o.o_orderkey)
    return (
        c.join(F.broadcast(with_cust), with_cust.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "revenue_c4")
        .orderBy(F.desc("revenue_c4"), "o_orderkey")
    )


@register(
    "region_nation_rollup",
    """
    SELECT r.r_name, n.n_name, COUNT(c.c_custkey) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def region_nation_rollup(spark, sf_dir):
    """F1: explicit broadcast of small dims (region/nation) — no shuffle of
    the customer side beyond the aggregate."""
    r, n, c = (_t(spark, sf_dir, x) for x in ("region", "nation", "customer"))
    return (
        F.broadcast(r)
        .join(F.broadcast(n), n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_customers(spark, sf_dir):
    """F5 left-semi: the resume idiom's 'already has work' probe."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers(spark, sf_dir):
    """F5 left-anti: the resume idiom — process only keys absent from the
    manifest (here: customers with no orders)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# E/H: window functions, top-k
# ---------------------------------------------------------------------------


@register(
    "window_topk_orders",
    """
    SELECT o_custkey, o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
    """,
)
def window_topk_orders(spark, sf_dir):
    """E2/H4: per-group top-k via row_number with a deterministic tiebreak."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey", "o_orderkey",
            cents(F.col("o_totalprice")).alias("total_cents"), "rn",
        )
    )


@register(
    "running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM orders
    """,
)
def running_revenue(spark, sf_dir):
    """E4/E6: running aggregate over an explicit ROWS frame (integer cents →
    exact under the frame's deterministic order)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("running_cents"),
    )


@register(
    "event_gaps_lag",
    """
    SELECT user_id, event_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us
    FROM events
    """,
)
def event_gaps_lag(spark, sf_dir):
    """E1: lag() — the delta step feeding delta-of-delta encoding (K2)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return e.select(
        "user_id", "event_id", (us - F.lag(us).over(w)).cast("long").alias("gap_us")
    )


@register(
    "exact_percentiles",
    """
    SELECT event_type,
           ROUND(CAST(quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS DOUBLE) / 100.0, 6) AS p50,
           ROUND(CAST(quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.95) AS DOUBLE) / 100.0, 6) AS p95
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def exact_percentiles(spark, sf_dir):
    """D6: exact percentiles (linear interpolation) over integer cents."""
    e = _t(spark, sf_dir, "events")
    v = cents(F.col("value"))
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.percentile(v, F.lit(0.5)) / 100.0, 6).alias("p50"),
            F.round(F.percentile(v, F.lit(0.95)) / 100.0, 6).alias("p95"),
        )
        .orderBy("event_type")
    )


@register("approx_percentiles")  # rows-only: sketch internals differ per engine
def approx_percentiles(spark, sf_dir):
    """D6 scale path: percentile_approx (KLL-style mergeable sketch —
    partial+final agg, no per-group full sort). The exact variant above is
    the small-SF oracle; at 100 TB this is the one you run. Rows-only check:
    DuckDB's approx_quantile uses a different sketch, so values are not
    reproducible cross-engine — parity vs the exact variant is asserted in
    pytest within sketch tolerance."""
    e = _t(spark, sf_dir, "events")
    v = cents(F.col("value"))
    return (
        e.groupBy("event_type")
        .agg(
            (F.percentile_approx(v, F.lit(0.5), F.lit(10000)) / 100.0).alias("p50"),
            (F.percentile_approx(v, F.lit(0.95), F.lit(10000)) / 100.0).alias("p95"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# D5/D7/D3: pivot, rollup, distinct
# ---------------------------------------------------------------------------


@register(
    "pivot_event_types",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) FILTER (event_type = 'click') AS n_click,
           COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (event_type = 'error') AS n_error
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def pivot_event_types(spark, sf_dir):
    """D7: pivot with an explicit value list (no extra pass to discover
    pivot keys — required at scale)."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "purchase", "signup", "error"])
        .count()
        .orderBy("day")
    )
    for t in ["click", "purchase", "signup", "error"]:
        out = out.withColumnRenamed(t, f"n_{t}")
    return out.select(
        "day",
        *[F.coalesce(F.col(f"n_{t}"), F.lit(0)).alias(f"n_{t}") for t in
          ["click", "purchase", "signup", "error"]],
    )


@register(
    "rollup_region_nation",
    """
    SELECT r.r_name, n.n_name,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT) AS gid,
           COUNT(*) AS n_rows
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def rollup_region_nation(spark, sf_dir):
    """D5: ROLLUP grouping sets + grouping_id."""
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.grouping_id().cast("long").alias("gid"), F.count("*").alias("n_rows"))
        .select("r_name", "n_name", "gid", "n_rows")
        .orderBy("gid", F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@register(
    "distinct_users_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def distinct_users_daily(spark, sf_dir):
    """D3: exact distinct aggregation (expands + dedups before final agg)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


@register("approx_distinct_users")  # no oracle: approximate by design (D4)
def approx_distinct_users(spark, sf_dir):
    """D4: HLL-based approx distinct — the scalable monthly-tier variant;
    driver records a rows-only check (approximate ≠ SQL-reproducible)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# G: set operations
# ---------------------------------------------------------------------------


@register(
    "set_except_intersect",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT 'only_rich' AS tag, k FROM (SELECT k FROM rich EXCEPT SELECT k FROM buyers)
    UNION ALL
    SELECT 'both' AS tag, k FROM (SELECT k FROM rich INTERSECT SELECT k FROM buyers)
    """,
)
def set_except_intersect(spark, sf_dir):
    """G1/G2/G3: union all + except + intersect."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    only_rich = rich.exceptAll(buyers.intersect(rich)).select(
        F.lit("only_rich").alias("tag"), "k"
    )
    both = rich.intersect(buyers).select(F.lit("both").alias("tag"), "k")
    return only_rich.unionByName(both)


# ---------------------------------------------------------------------------
# I: scalar functions — json, date, string, array
# ---------------------------------------------------------------------------


@register(
    "json_props_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) * 1.0 / COUNT(*) AS k_mean
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_props_stats(spark, sf_dir):
    """I6: JSON extraction from the props payload (integer-exact mean)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).alias("k_sum"),
            F.count("*").alias("n"),
            (F.sum(k) * 1.0 / F.count("*")).alias("k_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "monthly_order_volume",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def monthly_order_volume(spark, sf_dir):
    """I2/C2: calendar-month bucketing (UTC date_trunc) + exact money sum."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
        )
        .orderBy("order_month")
    )


@register(
    "string_funcs_parts",
    """
    SELECT upper(substr(p_type, 1, 5)) AS type5,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           COUNT(*) AS n, CAST(MIN(p_size) AS BIGINT) AS min_size,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def string_funcs_parts(spark, sf_dir):
    """I1: upper/substring/regexp_extract composition."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.upper(F.substring("p_type", 1, 5)).alias("type5"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("p_size").cast("long").alias("min_size"),
            F.max("p_size").cast("long").alias("max_size"),
        )
        .orderBy("type5", "last_word")
    )


@register(
    "embedding_array_stats",
    """
    SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val
    FROM embeddings WHERE vec_id < 100
    """,
)
def embedding_array_stats(spark, sf_dir):
    """I4: array-typed column ops (size, element_at, array_max)."""
    em = _t(spark, sf_dir, "embeddings")
    return em.filter(F.col("vec_id") < 100).select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# F3: as-of / range-to-equi joins
# ---------------------------------------------------------------------------


@register(
    "asof_last_click_before_purchase",
    """
    SELECT event_id, user_id, last_click_ts
    FROM (
      SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events)
    WHERE event_type = 'purchase'
    """,
)
def asof_last_click_before_purchase(spark, sf_dir):
    """F3 as-of join via union+LOCF: for each purchase, the most recent
    strictly-prior click in the same series — no O(n²) range join."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        e.withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_click_ts")
    )


@register(
    "hour_bucket_enrich",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS hour_n
      FROM events GROUP BY 1, 2)
    SELECT e.event_id, h.hour_n
    FROM events e JOIN hourly h
      ON e.user_id = h.user_id AND date_trunc('hour', e.ts) = h.h
    """,
)
def hour_bucket_enrich(spark, sf_dir):
    """F3 range→equi rewrite: containment in a tumbling bucket is an equi
    join on the truncated bucket key (never a theta join)."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("hour_n"))
    return (
        e.withColumn("h", F.date_trunc("hour", "ts"))
        .join(hourly, ["user_id", "h"])
        .select("event_id", "hour_n")
    )
