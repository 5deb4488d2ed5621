"""Driver-verified alerting & reliability queries (SURVEY.md §2 M73–M75).

Each query serves a monitoring primitive from hourly tier state built over
the events fixture, with exact integer arithmetic (the only floats are
single final divisions), so the alert/burn/gap answers themselves — not
just the counts feeding them — sit under the driver's full-hash DuckDB
gate. The oracle rebuilds the hourly tier from raw events and replays the
identical window algebra in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import io as eio
from . import rollup as erollup
from .queries import _t, register

#: hourly tier rebuilt from raw events, with the per-bucket error counter
#: the burn-rate query reads from freq tier state on the Spark side
_ALERT_CTE = """
WITH t0 AS (
  SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
         ts, CAST(length(props) AS BIGINT) AS token_count,
         CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT)
           AS is_err
  FROM events),
hourly AS (
  SELECT conv_id, date_trunc('hour', ts) AS bucket_start,
         COUNT(*) AS n_turns,
         CAST(SUM(token_count) AS BIGINT) AS token_sum,
         CAST(SUM(is_err) AS BIGINT) AS err_sum
  FROM t0 GROUP BY 1, 2)
"""


@register(
    "alert_hysteresis_episodes",
    _ALERT_CTE
    + """
    , pts AS (
      SELECT conv_id, bucket_start,
             epoch_us(bucket_start) // 3600000000 AS hidx,
             token_sum AS v
      FROM hourly),
    st AS (
      SELECT *,
             COALESCE(LAST_VALUE(
               CASE WHEN v >= 18 THEN 1 WHEN v <= 10 THEN 0 END
               IGNORE NULLS) OVER (
                 PARTITION BY conv_id ORDER BY hidx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS state,
             ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY hidx) AS rn
      FROM pts),
    g AS (
      SELECT *, rn - SUM(state) OVER (
               PARTITION BY conv_id ORDER BY hidx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM st)
    SELECT conv_id,
           CAST(MIN(bucket_start) AS TIMESTAMP) AS alert_start,
           CAST(MAX(bucket_start) AS TIMESTAMP) AS alert_end,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(v) AS BIGINT) AS peak
    FROM g WHERE state = 1
    GROUP BY conv_id, grp
    HAVING COUNT(*) >= 1
    """,
)
def alert_hysteresis_episodes(spark, sf_dir):
    """M73 hysteresis threshold episodes (engine/alerting.py
    hysteresis_alerts): the Grafana/Prometheus alert state machine —
    enter at token_sum ≥ 18, exit at ≤ 10, HOLD inside the band — over
    per-conversation hourly tier state. The sequential recurrence is
    expressible because state only changes at crossings: LOCF over
    crossing marks (last ignore nulls), then gaps-and-islands for the
    episodes. Missing hours hold the state (a rule engine only
    re-evaluates when a sample arrives). One exchange over O(tier) rows;
    the episode groupBy reuses the window's conv_id partitioning."""
    from .alerting import hysteresis_alerts

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return hysteresis_alerts(
        tiers["hourly"], hi=18, lo=10, value_col="token_sum", min_len=1
    )


@register(
    "slo_burn_rate_convs",
    _ALERT_CTE
    + """
    , pts AS (
      SELECT conv_id, bucket_start,
             epoch_us(bucket_start) // 3600000000 AS hidx,
             err_sum AS bad, n_turns AS tot
      FROM hourly),
    wsum AS (
      SELECT conv_id, CAST(bucket_start AS TIMESTAMP) AS bucket_start,
             CAST(SUM(bad) OVER ws AS BIGINT) AS bad_s,
             CAST(SUM(tot) OVER ws AS BIGINT) AS tot_s,
             CAST(SUM(bad) OVER wl AS BIGINT) AS bad_l,
             CAST(SUM(tot) OVER wl AS BIGINT) AS tot_l
      FROM pts
      WINDOW ws AS (PARTITION BY conv_id ORDER BY hidx
                    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
             wl AS (PARTITION BY conv_id ORDER BY hidx
                    RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT *,
           CAST(bad_s * 1000000 AS DOUBLE)
             / CAST(tot_s * 200000 AS DOUBLE) AS burn_short,
           CAST(bad_l * 1000000 AS DOUBLE)
             / CAST(tot_l * 200000 AS DOUBLE) AS burn_long,
           (bad_s * 1000000 > tot_s * 400000
            AND bad_l * 1000000 > tot_l * 400000) AS fired
    FROM wsum
    """,
)
def slo_burn_rate_convs(spark, sf_dir):
    """M74 multi-window SLO burn rate (engine/alerting.py
    burn_rate_alerts): error-role turns vs a 20% error budget
    (slo_ppm=200000) per conversation, trailing 6h AND 24h RANGE-frame
    windows, paging at 2× budget burn on BOTH (the Google SRE
    multi-window multi-burn alert). The bad counter is served from
    categorical freq tier state (role→count maps); the fired predicate is
    exact integer cross-multiplication and each burn rate is one float
    division over exact longs — the alert decision itself hash-matches
    the oracle's raw recount. One exchange over O(tier) rows."""
    from .alerting import burn_rate_alerts

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    hourly = tiers["hourly"].withColumn(
        "err_sum",
        F.coalesce(F.element_at("role_freq", F.lit("error")), F.lit(0)).cast(
            "long"
        ),
    )
    return burn_rate_alerts(
        hourly,
        short_hours=6,
        long_hours=24,
        slo_ppm=200_000,
        mult=2,
        bad_col="err_sum",
        total_col="n_turns",
    )


@register(
    "tier_data_gaps_24h",
    _ALERT_CTE
    + """
    , pts AS (
      SELECT conv_id, bucket_start,
             epoch_us(bucket_start) // 3600000000 AS hidx
      FROM hourly),
    nx AS (
      SELECT *, LEAD(hidx) OVER w AS nh, LEAD(bucket_start) OVER w AS nb
      FROM pts WINDOW w AS (PARTITION BY conv_id ORDER BY hidx))
    SELECT conv_id,
           CAST(bucket_start + INTERVAL 1 HOUR AS TIMESTAMP) AS gap_start,
           CAST(nb - INTERVAL 1 HOUR AS TIMESTAMP) AS gap_end,
           CAST(nh - hidx - 1 AS BIGINT) AS gap_hours
    FROM nx WHERE nh - hidx - 1 >= 24
    """,
)
def tier_data_gaps_24h(spark, sf_dir):
    """M75 data-gap episodes (engine/alerting.py data_gaps): per-
    conversation runs of ≥24 missing hourly buckets strictly inside the
    observed span — the heartbeat-loss / show-gaps monitor, one lead()
    over the observed hour index of the hourly tier. Leading/trailing
    absence is not a gap. Exact integers throughout; gap boundaries are
    timestamp arithmetic on the bucket spine."""
    from .alerting import data_gaps

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0)
    return data_gaps(tiers["hourly"], min_gap_hours=24)


@register(
    "wilson_error_rate_topk",
    """
    WITH t0 AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0')) AS conv_id,
             ts, event_type AS role
      FROM events),
    per AS (
      SELECT conv_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN role = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS x
      FROM t0
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      GROUP BY 1)
    SELECT conv_id, n, x,
           CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
           (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
              + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))
              - CAST(1.96 AS DOUBLE) * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                               * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                             + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)))
                            / CAST(n AS DOUBLE)))
             / (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / CAST(n AS DOUBLE)) AS wilson_low
    FROM per
    ORDER BY wilson_low DESC, conv_id
    LIMIT 20
    """,
)
def wilson_error_rate_topk(spark, sf_dir):
    """M87 Wilson-lower-bound error-rate ranking
    (engine/alerting.py wilson_rate_rank): the 20 conversations with the
    worst statistically-defensible error rate over January, served from
    daily freq tier state — exact integer (x, n) folds, then ONE
    closed-form IEEE expression whose identical tree the oracle replays,
    so the ranking float itself hash-matches. The uncertainty-aware
    alternative to raw-ratio ranking (a 1-of-1 conversation cannot
    outrank 90-of-1000)."""
    from datetime import datetime

    from .alerting import wilson_rate_rank

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return wilson_rate_rank(
        tiers["daily"], "role", "error",
        datetime(2024, 1, 1), datetime(2024, 2, 1),
    )
