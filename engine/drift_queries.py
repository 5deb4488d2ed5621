"""Driver-verified distribution-drift queries (SURVEY.md §2 M66–M70).

Every query serves a distributional comparison from mergeable tier state
(freq maps / histogram bin arrays) or exact integer aggregates, with floats
only as final single IEEE-exact expressions (÷ × − abs sqrt) — so even the
KS statistic and the experiment z-score sit under the driver's full-hash
DuckDB gate. The log-based drift scores (PSI/JSD/entropy) are deliberately
NOT here: `ln` differs between engines at the last ulp (measured 395/5000),
so they are pytest-verified in tests/test_drift.py instead.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from . import io as eio
from . import rollup as erollup
from .queries import _t, register

_A = (datetime(2024, 1, 1), datetime(2024, 1, 8))
_B = (datetime(2024, 1, 15), datetime(2024, 1, 22))

_RANGES_SQL = {
    "a0": "TIMESTAMP '2024-01-01 00:00:00'",
    "a1": "TIMESTAMP '2024-01-08 00:00:00'",
    "b0": "TIMESTAMP '2024-01-15 00:00:00'",
    "b1": "TIMESTAMP '2024-01-22 00:00:00'",
}


@register(
    "tier_drift_roles",
    """
    WITH ca AS (
      SELECT event_type AS value, CAST(COUNT(*) AS BIGINT) AS n_a
      FROM events WHERE ts >= {a0} AND ts < {a1} GROUP BY 1),
    cb AS (
      SELECT event_type AS value, CAST(COUNT(*) AS BIGINT) AS n_b
      FROM events WHERE ts >= {b0} AND ts < {b1} GROUP BY 1),
    j AS (
      SELECT COALESCE(ca.value, cb.value) AS value,
             CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
             CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
      FROM ca FULL OUTER JOIN cb ON ca.value = cb.value),
    t AS (
      SELECT *, CAST(SUM(n_a) OVER () AS BIGINT) AS na_tot,
             CAST(SUM(n_b) OVER () AS BIGINT) AS nb_tot
      FROM j),
    x AS (
      SELECT *, CAST(ABS(n_a * nb_tot - n_b * na_tot) AS BIGINT) AS tv_num
      FROM t)
    SELECT value, n_a, n_b,
           CAST(n_a AS DOUBLE) / CAST(na_tot AS DOUBLE) AS p_a,
           CAST(n_b AS DOUBLE) / CAST(nb_tot AS DOUBLE) AS p_b,
           tv_num,
           CAST(CAST(SUM(tv_num) OVER () AS BIGINT) AS DOUBLE)
             / CAST(2 * na_tot * nb_tot AS BIGINT) AS tv
    FROM x
    """.format(**_RANGES_SQL),
)
def tier_drift_roles(spark, sf_dir):
    """M66 categorical drift from freq tier state (engine/drift.py
    freq_drift): total-variation distance between the role distributions
    of two January weeks, served from span-matched frequency maps (key-
    union integer addition across the greedy calendar spans) while the
    oracle counts raw rows of both ranges. TV's numerator is an exact
    integer fold (|n_a·N_b − n_b·N_a| per value) so the distance itself —
    not just the counts — survives the full-hash gate. At 10^12 turns a
    quarter-vs-quarter drift check touches O(tier) rows, never raw."""
    from .drift import freq_drift

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return freq_drift(tiers, _A, _B, "role")


@register(
    "tier_drift_hist_ks",
    """
    WITH bins_a AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0'))
               AS conv_id,
             CAST(LEAST(FLOOR(length(props) / 16), 11) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts >= {a0} AND ts < {a1} GROUP BY 1, 2),
    bins_b AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0'))
               AS conv_id,
             CAST(LEAST(FLOOR(length(props) / 16), 11) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts >= {b0} AND ts < {b1} GROUP BY 1, 2),
    convs AS (
      SELECT DISTINCT a.conv_id
      FROM (SELECT DISTINCT conv_id FROM bins_a) a
      JOIN (SELECT DISTINCT conv_id FROM bins_b) b USING (conv_id)),
    spine AS (
      SELECT conv_id, CAST(gs.g AS BIGINT) AS bin
      FROM convs, generate_series(0, 11) gs(g)),
    e AS (
      SELECT s.conv_id, s.bin,
             CAST(COALESCE(a.c, 0) AS BIGINT) AS a,
             CAST(COALESCE(b.c, 0) AS BIGINT) AS b
      FROM spine s
      LEFT JOIN bins_a a ON a.conv_id = s.conv_id AND a.bin = s.bin
      LEFT JOIN bins_b b ON b.conv_id = s.conv_id AND b.bin = s.bin),
    c AS (
      SELECT conv_id, bin,
             CAST(SUM(a) OVER (PARTITION BY conv_id ORDER BY bin) AS BIGINT)
               AS cum_a,
             CAST(SUM(b) OVER (PARTITION BY conv_id ORDER BY bin) AS BIGINT)
               AS cum_b,
             CAST(SUM(a) OVER (PARTITION BY conv_id) AS BIGINT) AS n_a,
             CAST(SUM(b) OVER (PARTITION BY conv_id) AS BIGINT) AS n_b
      FROM e)
    SELECT conv_id, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
           CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS ks_num,
           CAST(CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT)
                  AS DOUBLE)
             / CAST(MAX(n_a) * MAX(n_b) AS DOUBLE) AS ks
    FROM c GROUP BY conv_id
    """.format(**_RANGES_SQL),
)
def tier_drift_hist_ks(spark, sf_dir):
    """M67 per-conversation Kolmogorov–Smirnov drift from histogram tier
    state (engine/drift.py hist_drift_ks): for every conversation active
    in both January weeks, KS = max |cdf_a − cdf_b| over the 12-bin
    token-count histograms, computed as an integer max of cross-products
    over the fixed bin spine with ONE final division — a two-sample
    distribution test under the full-hash gate, at bin resolution, from
    O(tier) rows. The oracle rebuilds the binned CDFs from raw."""
    from .drift import hist_drift_ks

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(
        t0, hist_cols={"token_count": (0.0, 16.0, 12)}
    )
    return hist_drift_ks(tiers, _A, _B, "token_count")


@register(
    "drift_timeline_roles_daily",
    """
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_type AS value, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    t AS (SELECT day, CAST(SUM(n) AS BIGINT) AS n_tot FROM c GROUP BY 1),
    cur AS (SELECT day, value, n AS n_cur FROM c),
    prev AS (
      SELECT day + INTERVAL 1 DAY AS day, value, n AS n_prev FROM c),
    p AS (
      SELECT COALESCE(cur.day, prev.day) AS day,
             COALESCE(cur.value, prev.value) AS value,
             CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur,
             CAST(COALESCE(n_prev, 0) AS BIGINT) AS n_prev
      FROM cur FULL OUTER JOIN prev
        ON cur.day = prev.day AND cur.value = prev.value),
    w AS (
      SELECT p.day, n_cur, n_prev, tc.n_tot AS nc_tot, tp.n_tot AS np_tot,
             CAST(ABS(n_cur * tp.n_tot - n_prev * tc.n_tot) AS BIGINT)
               AS num
      FROM p
      JOIN t tc ON tc.day = p.day
      JOIN t tp ON tp.day = p.day - INTERVAL 1 DAY)
    SELECT day, MAX(np_tot) AS n_prev, MAX(nc_tot) AS n_cur,
           CAST(SUM(num) AS BIGINT) AS tv_num,
           CAST(CAST(SUM(num) AS BIGINT) AS DOUBLE)
             / CAST(2 * MAX(np_tot) * MAX(nc_tot) AS BIGINT) AS tv
    FROM w GROUP BY day
    """,
)
def drift_timeline_roles_daily(spark, sf_dir):
    """M68 drift timeline (engine/drift.py freq_drift_timeline): WHEN did
    the role distribution shift — day-over-day total variation from the
    DAILY tier's freq maps (corpus-level fold per day, consecutive days
    aligned by a value-level full-outer join so appearing/vanishing
    categories still count, integer numerator, one division). A threshold
    on `tv` localizes a mix-shift to the day without a raw scan; the
    oracle replays the same pairing over raw counts."""
    from .drift import freq_drift_timeline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return freq_drift_timeline(tiers, "role")


@register(
    "drift_baseline_roles_daily",
    """
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_type AS value, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    t AS (SELECT day, CAST(SUM(n) AS BIGINT) AS n_tot FROM c GROUP BY 1),
    bc AS (
      SELECT c.day + gs.k * INTERVAL 1 DAY AS day, c.value,
             CAST(SUM(c.n) AS BIGINT) AS n_base
      FROM c, generate_series(1, 7) gs(k) GROUP BY 1, 2),
    bt AS (
      SELECT t.day + gs.k * INTERVAL 1 DAY AS day,
             CAST(SUM(t.n_tot) AS BIGINT) AS nb_tot,
             CAST(COUNT(*) AS INT) AS baseline_width
      FROM t, generate_series(1, 7) gs(k) GROUP BY 1),
    p AS (
      SELECT COALESCE(c.day, bc.day) AS day,
             COALESCE(c.value, bc.value) AS value,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cur,
             CAST(COALESCE(bc.n_base, 0) AS BIGINT) AS n_base
      FROM c FULL OUTER JOIN bc
        ON c.day = bc.day AND c.value = bc.value),
    w AS (
      SELECT p.day, n_cur, n_base, tc.n_tot AS nc_tot, bt.nb_tot,
             bt.baseline_width,
             CAST(ABS(n_cur * bt.nb_tot - n_base * tc.n_tot) AS BIGINT)
               AS num
      FROM p
      JOIN t tc ON tc.day = p.day
      JOIN bt ON bt.day = p.day)
    SELECT day, MAX(nb_tot) AS n_base, MAX(nc_tot) AS n_cur,
           MAX(baseline_width) AS baseline_width,
           CAST(SUM(num) AS BIGINT) AS tv_num,
           CAST(CAST(SUM(num) AS BIGINT) AS DOUBLE)
             / CAST(2 * MAX(nb_tot) * MAX(nc_tot) AS BIGINT) AS tv
    FROM w GROUP BY day
    """,
)
def drift_baseline_roles_daily(spark, sf_dir):
    """M71 trailing-baseline drift alarm (engine/drift.py
    freq_drift_baseline): each day's role distribution vs the union of
    its previous 7 observed days, from DAILY freq tier state — the
    production monitor shape (a one-day blip fires once against a weekly
    baseline; day-over-day TV would fire again on the healthy morning
    after). Baseline counts fold over an exploded day-offset spine
    (≤7× the tier-sized counts table, never raw); integer TV numerator,
    one division — the alarm value itself is hash-gated."""
    from .drift import freq_drift_baseline

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return freq_drift_baseline(tiers, "role", baseline_days=7)


@register(
    "tier_role_gini_monthly",
    """
    WITH c AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0'))
               AS conv_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
             event_type AS role, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3)
    SELECT conv_id, bucket_start,
           CAST(COUNT(*) AS INT) AS n_cats,
           CAST(SUM(n) AS BIGINT) AS n,
           1.0 - CAST(CAST(SUM(n * n) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(SUM(n) AS BIGINT)
                          * CAST(SUM(n) AS BIGINT) AS DOUBLE) AS gini
    FROM c GROUP BY 1, 2
    """,
)
def tier_role_gini_monthly(spark, sf_dir):
    """M69 per-bucket concentration from freq tier state (engine/drift.py
    freq_concentration): Gini impurity 1 − Σn²/N² of each conversation-
    month's role mix, with Σn² and N exact integer HOF folds over the
    STORED map (never raw) and one final division. 0 = monoculture,
    (k−1)/k = uniform — the per-bucket diversity signal whose float twin
    (Shannon entropy) is pytest-gated because ln isn't bit-portable."""
    from .drift import freq_concentration

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return freq_concentration(tiers["monthly"], "role")


@register(
    "drift_attribution_convs",
    """
    WITH ca AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0'))
               AS conv_id,
             event_type AS value, CAST(COUNT(*) AS BIGINT) AS n_a
      FROM events WHERE ts >= {a0} AND ts < {a1} GROUP BY 1, 2),
    cb AS (
      SELECT concat('conv-', lpad(CAST(user_id AS VARCHAR), 8, '0'))
               AS conv_id,
             event_type AS value, CAST(COUNT(*) AS BIGINT) AS n_b
      FROM events WHERE ts >= {b0} AND ts < {b1} GROUP BY 1, 2),
    j AS (
      SELECT COALESCE(ca.conv_id, cb.conv_id) AS conv_id,
             COALESCE(ca.value, cb.value) AS value,
             CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
             CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
      FROM ca FULL OUTER JOIN cb
        ON ca.conv_id = cb.conv_id AND ca.value = cb.value),
    t AS (
      SELECT *, CAST(SUM(n_a) OVER (PARTITION BY conv_id) AS BIGINT)
                  AS na_tot,
             CAST(SUM(n_b) OVER (PARTITION BY conv_id) AS BIGINT) AS nb_tot
      FROM j),
    pc AS (
      SELECT conv_id, MAX(na_tot) AS n_a, MAX(nb_tot) AS n_b,
             CAST(SUM(ABS(n_a * nb_tot - n_b * na_tot)) AS BIGINT) AS tv_num
      FROM t WHERE na_tot > 0 AND nb_tot > 0 GROUP BY 1),
    s AS (
      SELECT conv_id, n_a, n_b, tv_num,
             CAST(tv_num AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE) AS tv,
             (CAST(tv_num AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE))
               * CAST(LEAST(n_a, n_b) AS DOUBLE) AS weight
      FROM pc)
    SELECT * FROM s ORDER BY weight DESC, conv_id LIMIT 10
    """.format(**_RANGES_SQL),
)
def drift_attribution_convs(spark, sf_dir):
    """M72 drift attribution (engine/drift.py freq_drift_by_conv): WHICH
    conversations drove the shift — per-conv TV between the two weeks'
    own role distributions (every total and cross-product conv-local, so
    the windows shuffle on conv_id and the 2^63 bound never tightens),
    ranked by tv · min(n_a, n_b) with a deterministic tiebreak, top-10
    via TakeOrderedAndProject (the decision distributes; no single-reducer
    exchange). The oracle replays the identical ranking over raw."""
    from .drift import freq_drift_by_conv

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    return freq_drift_by_conv(tiers, _A, _B, "role", k=10)


@register(
    "ab_conversion_ztest",
    """
    WITH pu AS (
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1),
    pv AS (
      SELECT user_id % 2 AS variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS c
      FROM pu GROUP BY 1),
    one AS (
      SELECT CAST(MAX(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n1,
             CAST(MAX(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c1,
             CAST(MAX(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n2,
             CAST(MAX(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c2
      FROM pv)
    SELECT n1, c1, n2, c2,
           CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
           CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
           (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                    * (1.0 - CAST(c1 + c2 AS DOUBLE)
                               / CAST(n1 + n2 AS DOUBLE))
                    * (CAST(n1 + n2 AS DOUBLE)
                         / CAST(n1 * n2 AS DOUBLE))) AS z
    FROM one
    """,
)
def ab_conversion_ztest(spark, sf_dir):
    """M70 two-proportion z-test (engine/drift.py ab_conversion_ztest):
    the experiment read-out — per-user conversion (≥14 purchases; the
    fixture's every user has ≥1, which would make the pooled rate exactly
    1 and z a 0/0) under a deterministic user_id%2 split,
    exposure/conversion counts as exact
    integers, and p1/p2/z each a single IEEE-exact float expression
    (÷ × − sqrt are all correctly rounded), so the test STATISTIC itself
    is under the full-hash gate. One row; at scale the per-user agg is
    the only shuffle and the variant fold is metadata-sized."""
    from .drift import ab_conversion_ztest as ztest

    return ztest(_t(spark, sf_dir, "events"), min_events=14)


@register(
    "new_value_alerts",
    """
    WITH vals AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_type || '-' || json_extract_string(props, '$.k') AS value,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    firsts AS (
      SELECT value, MIN(day) AS first_seen
      FROM vals GROUP BY 1)
    SELECT f.value, f.first_seen, v.n AS first_day_n
    FROM firsts f JOIN vals v
      ON v.value = f.value AND v.day = f.first_seen
    WHERE f.first_seen >= TIMESTAMP '2024-01-08'
    ORDER BY f.first_seen, f.value
    """,
)
def new_value_alerts(spark, sf_dir):
    """M77 first-seen category detection (engine/drift.py freq_first_seen):
    compound (event_type, payload-k) categories first observed after a
    one-week baseline, served from daily freq-map tier state — explode,
    integer fold, one lexicographic struct-min per value — while the
    oracle recomputes first days from raw events. The alert rows (value,
    first day, first-day count) sit under the full-hash gate."""
    from .drift import freq_first_seen

    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    t0 = t0.withColumn(
        "role",
        F.concat(F.col("role"), F.lit("-"), F.get_json_object("text", "$.k")),
    )
    tiers = erollup.build_tiers(t0, freq_cols=["role"])
    out = freq_first_seen(tiers["daily"], "role", datetime(2024, 1, 8))
    # DATE columns land as python objects in pandas while the oracle's
    # arrive as datetime64 — serve the canonical TIMESTAMP on both sides
    # so the driver's value hash sees one dtype (the AQP-dtype lesson).
    return out.withColumn("first_seen", F.col("first_seen").cast("timestamp"))
