"""Co-occurrence / association mining (SURVEY.md §2 M82).

Market-basket association over (basket, item) memberships: which items
appear together more often than chance? For transcripts the natural
basket is a conversation and the items are the tools / event types /
categories it touched — "users who hit `error` also hit `retry`" with
support / confidence / lift, the Apriori-1 pair pass.

Spark-first shape: presence = one DISTINCT over (basket, item) — the
heavy input collapses to at most |baskets|·|item-vocab| rows before
anything pairwise happens. Pair counting is a self-equi-join ON THE
BASKET KEY (both sides carry the distinct's hash partitioning, so the
join adds no exchange beyond it) restricted to item_a < item_b — per
basket that is C(items-in-basket, 2), bounded by the per-basket item
vocabulary, never by turn count. Item marginals broadcast (item-vocab
rows); the basket grand total attaches as a one-row broadcast
(the repo's GLOBAL_AGG / one-row-crossJoin pattern).

Exactness: every count is an integer; support, confidence and lift are
each ONE float division of integer products (lift = n_ab·N / (n_a·n_b)),
so the scores hash-match a DuckDB oracle bit-for-bit. Overflow needs
n_ab·N < 2^63 — both are basket counts, safe till ~3·10^9 baskets; at
that scale shift to the per-million scaled integers the drift pack uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .queries import _t, register


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair: int = 1,
) -> DataFrame:
    """M82: per unordered item pair (item_a < item_b): basket counts
    (n_a, n_b, n_ab, n_baskets) and support / confidence both ways /
    lift. `min_pair` prunes pairs below a co-occurrence floor BEFORE the
    marginal joins (anti-skew: the long tail of 1-basket pairs never
    reaches the join)."""
    if min_pair < 1:
        raise ValueError(f"min_pair must be >= 1, got {min_pair}")
    items = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    marg = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    total = items.groupBy().agg(
        F.countDistinct("basket").alias("n_baskets")
    )
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= F.lit(min_pair))
    )
    ma = marg.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    mb = marg.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(total))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        "n_baskets",
        (F.col("n_ab") / F.col("n_baskets")).alias("support"),
        (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
        (F.col("n_ab") / F.col("n_b")).alias("conf_b_to_a"),
        (
            (F.col("n_ab") * F.col("n_baskets"))
            / (F.col("n_a") * F.col("n_b"))
        ).alias("lift"),
    ).orderBy("item_a", "item_b")


@register(
    "basket_lift_event_types",
    """
    WITH items AS (
      SELECT DISTINCT user_id AS basket, event_type AS item
      FROM events WHERE event_type IS NOT NULL),
    marg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
             FROM items GROUP BY 1),
    total AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
              FROM items),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2)
    SELECT item_a, item_b,
           ma.n_item AS n_a, mb.n_item AS n_b, n_ab, t.n_baskets,
           n_ab / t.n_baskets AS support,
           n_ab / ma.n_item AS conf_a_to_b,
           n_ab / mb.n_item AS conf_b_to_a,
           (n_ab * t.n_baskets) / (ma.n_item * mb.n_item) AS lift
    FROM pairs
    JOIN marg ma ON ma.item = item_a
    JOIN marg mb ON mb.item = item_b
    CROSS JOIN total t
    ORDER BY item_a, item_b
    """,
)
def basket_lift_event_types(spark, sf_dir):
    """M82 association mining over the events fixture: baskets are users,
    items are the event types they ever emitted; each unordered pair
    carries exact basket counts and one-division support / confidence /
    lift, all under the full-hash gate."""
    e = _t(spark, sf_dir, "events")
    return cooccurrence_lift(e, "user_id", "event_type")
