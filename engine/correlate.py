"""Correlated-series search (SURVEY.md §2 M76): which conversations move
together?

The monitoring workflow behind "what else changed when this metric
changed?" (Datadog's correlation search, Prometheus's `group_left`
eyeballing) is a top-k search over PAIRS of series. Naively that is
quadratic in the number of series; at 10^12 turns it must be bounded
before anything pairwise happens. The scale shape here:

1. **Candidate selection** — rank series by total volume inside the query
   range (a partial+final agg over tier state, O(tier) rows) and keep the
   top `top_series`. This is a TakeOrdered (k·partitions rows cross the
   wire, no single-reducer funnel) and the surviving id set is broadcast.
2. **Bounded pairwise** — self-join the selected series' tier rows on the
   bucket timestamp (equi-join; pairs only materialize for buckets where
   both series are observed) under `conv_a < conv_b`, so the pair space is
   at most C(top_series, 2) and the join input is O(top_series · buckets),
   never O(corpus).
3. **Exact sufficient statistics** — per pair, Pearson's r needs only
   (n, Σx, Σy, Σxy, Σx², Σy²), all exact BIGINT folds of the tier state's
   integer counters (partition-order-proof). The correlation itself is a
   single closed-form float expression over those longs —
   `(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̂) · √(n·Σy² − Σy²̂))` — where ÷, ×, −
   and √ are all correctly-rounded IEEE ops, so the r VALUES (not just the
   counters) sit under the driver's full-hash DuckDB gate.
4. **Top-k** — `ORDER BY abs(r) DESC, conv_a, conv_b LIMIT k` compiles to
   TakeOrderedAndProject (distributed selection, deterministic tiebreak).

Semantics: r is computed over the buckets where BOTH series are observed
(inner-join alignment — the PromQL vector-matching convention), with a
`min_overlap` floor so two series that only co-exist for a couple of
buckets can't post a spurious ±1.0. Zero-variance series are excluded
(the denominator would be 0; a constant series correlates with nothing).

Overflow bound: the longs need n·Σx² < 2^63. Tier-state counters are
per-bucket sums, so with B buckets in range and per-bucket values ≤ V the
bound is B²·V² < 2^63 — e.g. ten years of hourly buckets (B ≈ 9·10⁴)
leaves V ≈ 10⁶ per bucket; beyond that, pre-scale the value column by a
documented constant (correlation is scale-invariant).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import observed_state


def corr_pairs_topk(
    state: DataFrame,
    lo: datetime,
    hi: datetime,
    value_col: str = "token_sum",
    top_series: int = 60,
    min_overlap: int = 10,
    k: int = 25,
) -> DataFrame:
    """Top-k most-correlated conversation pairs over [lo, hi), served from
    tier state (hourly or daily — any grain whose `bucket_start` aligns the
    two series). Returns (conv_a, conv_b, n_common, corr) ordered by
    |corr| descending with a deterministic (conv_a, conv_b) tiebreak."""
    obs = (
        observed_state(state)
        .filter(
            (F.col("bucket_start") >= F.lit(lo)) & (F.col("bucket_start") < F.lit(hi))
        )
        .select("conv_id", "bucket_start", F.col(value_col).cast("long").alias("v"))
    )
    # 1. candidate selection: top series by in-range volume (TakeOrdered),
    # deterministic tiebreak on conv_id; the id set broadcasts.
    sel = (
        obs.groupBy("conv_id")
        .agg(F.sum("v").alias("vol"))
        .orderBy(F.desc("vol"), "conv_id")
        .limit(top_series)
        .select("conv_id")
    )
    obs_sel = obs.join(F.broadcast(sel), "conv_id")
    # 2. bounded pairwise alignment on the bucket timestamp.
    a = obs_sel.select(
        F.col("conv_id").alias("conv_a"),
        F.col("bucket_start").alias("b"),
        F.col("v").alias("va"),
    )
    bb = obs_sel.select(
        F.col("conv_id").alias("conv_b"),
        F.col("bucket_start").alias("b"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(bb, on=[a.b == bb.b, a.conv_a < bb.conv_b]).select(
        "conv_a", "conv_b", "va", "vb"
    )
    # 3. exact integer sufficient statistics per pair.
    st = pairs.groupBy("conv_a", "conv_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum("va").alias("sx"),
        F.sum("vb").alias("sy"),
        F.sum(F.col("va") * F.col("vb")).alias("sxy"),
        F.sum(F.col("va") * F.col("va")).alias("sxx"),
        F.sum(F.col("vb") * F.col("vb")).alias("syy"),
    )
    n = F.col("n_common")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    scored = (
        st.filter(n >= F.lit(min_overlap))
        .withColumn("_dx", dx)
        .withColumn("_dy", dy)
        .filter((F.col("_dx") > 0) & (F.col("_dy") > 0))
        .select(
            "conv_a",
            "conv_b",
            "n_common",
            (
                num.cast("double")
                / (F.sqrt(F.col("_dx").cast("double")) * F.sqrt(F.col("_dy").cast("double")))
            ).alias("corr"),
        )
    )
    # 4. distributed top-k with a deterministic tiebreak.
    return scored.orderBy(F.abs(F.col("corr")).desc(), "conv_a", "conv_b").limit(k)


# --- driver-verified query ------------------------------------------------

from .queries import _t, register  # noqa: E402


@register(
    "corr_pairs_topk_daily",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             date_trunc('day', ts) AS b,
             CAST(length(props) AS BIGINT) AS tok
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND ts < TIMESTAMP '2024-02-01 00:00:00'),
    daily AS (
      SELECT conv_id, b, CAST(SUM(tok) AS BIGINT) AS v
      FROM t0 GROUP BY 1, 2),
    sel AS (
      SELECT conv_id FROM (
        SELECT conv_id, SUM(v) AS vol FROM daily GROUP BY 1)
      ORDER BY vol DESC, conv_id LIMIT 60),
    ds AS (SELECT d.* FROM daily d JOIN sel USING (conv_id)),
    pairs AS (
      SELECT a.conv_id AS conv_a, b2.conv_id AS conv_b, a.v AS va, b2.v AS vb
      FROM ds a JOIN ds b2 ON a.b = b2.b AND a.conv_id < b2.conv_id),
    st AS (
      SELECT conv_a, conv_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(va) AS BIGINT) AS sx, CAST(SUM(vb) AS BIGINT) AS sy,
             CAST(SUM(va * vb) AS BIGINT) AS sxy,
             CAST(SUM(va * va) AS BIGINT) AS sxx,
             CAST(SUM(vb * vb) AS BIGINT) AS syy
      FROM pairs GROUP BY 1, 2)
    SELECT conv_a, conv_b, n_common,
           CAST(n_common * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n_common * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n_common * syy - sy * sy AS DOUBLE))) AS corr
    FROM st
    WHERE n_common >= 10
      AND n_common * sxx - sx * sx > 0
      AND n_common * syy - sy * sy > 0
    ORDER BY abs(corr) DESC, conv_a, conv_b
    LIMIT 25
    """,
)
def corr_pairs_topk_daily(spark, sf_dir):
    """M76 correlated-series search: the 25 most-correlated conversation
    pairs over January, served from daily tier state (candidate selection →
    broadcast id set → bucket-aligned bounded pairwise → exact BIGINT
    sufficient statistics → one closed-form float per pair), while the
    oracle recomputes from raw events. Pearson's r itself is hash-gated:
    both engines evaluate the identical (÷ × − √) expression tree over
    identical longs. At 10^12 turns the pairwise stage touches
    O(top_series · buckets) tier rows, never raw."""
    from . import io as eio
    from . import rollup as erollup

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return corr_pairs_topk(
        tiers["daily"],
        datetime(2024, 1, 1),
        datetime(2024, 2, 1),
        value_col="token_sum",
        top_series=60,
        min_overlap=10,
        k=25,
    )
