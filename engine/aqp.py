"""Approximate query processing: sampled aggregates with error bars.

The BlinkDB idea, engine-grade: at 100 TB an interactive dashboard does
not need the exact answer — it needs a 100×-cheaper estimate WITH a
quantified error. Two deliberate design choices make the estimates
engine-grade rather than `TABLESAMPLE` folklore:

1. **Deterministic hash samples, not random().** A unit row is included
   iff `md5(unit_key | salt)`'s 60-bit prefix mod 10000 < bp (a basis-
   point fraction). The sample is a pure row-local function of the stable
   unit key: reproducible across runs, partitionings and engines
   (SQL-replayable → the driver's full-hash oracle gate applies to an
   APPROXIMATE query), append-stable (yesterday's sampled units stay
   sampled as the table grows — the property that makes a persisted
   sample table maintainable), and re-salting gives fresh independent
   replicates for variance checks.

2. **Integer state, one float finalize.** Group aggregation carries exact
   integer partials (n, Σx, Σx², cents-scaled); estimate/stderr/CI come
   from ONE closed-form float expression over those integers — the same
   discipline as the tier variance state, so results are bit-reproducible
   under any shuffle order (float partial sums would not be).

Estimators are Horvitz–Thompson under per-unit inclusion probability
f = bp/10000 (hash inclusion is i.i.d. Bernoulli in the md5 model):

    count_est = n_s·w,  sum_est = Σ_s x·w          with w = 1/f
    Var̂(sum_est) = Σ_s x²·w·(w−1)                  (per-unit HT variance,
                                                    (1−f)/f² = w(w−1))
    CI95 = est ± 1.96·sqrt(Var̂)

The stratified variant samples strata at different rates (rare strata
oversampled) and carries per-(group, stratum) integer state; its
estimator is the same formula with the stratum's own w — the classic
variance win when group values concentrate in rare strata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpusops import _hash60_sql, portable_hash60

Z95 = 1.96
BASIS = 10_000


def hash_include(unit_col, bp: int, salt: int = 0) -> F.Column:
    """Deterministic Bernoulli(bp/10000) inclusion flag for a unit key."""
    if not (0 < bp <= BASIS):
        raise ValueError(f"bp must be in (0, {BASIS}]")
    tagged = F.concat(unit_col.cast("string"), F.lit(f"|{salt}"))
    return (portable_hash60(tagged) % BASIS) < bp


def hash_include_sql(expr: str, bp: int, salt: int = 0) -> str:
    tagged = f"{expr} || '|{salt}'"
    return f"({_hash60_sql(tagged)} % {BASIS}) < {bp}"


def sampled_agg(
    df: DataFrame,
    unit_col: str,
    keys: list[str],
    value_col,
    bp: int,
    salt: int = 0,
    z: float = Z95,
) -> DataFrame:
    """Per-`keys` estimates of count and Σ value from a bp/10000 hash
    sample. `value_col` must be (castable to) an integer column — cents,
    tokens, counts — so the carried state is exact. Returns the sample
    state (n_sample, sum_sample, sumsq_sample) plus count_est, sum_est,
    stderr_sum and the z-CI, all derived in one float expression."""
    s = df.filter(hash_include(F.col(unit_col), bp, salt))
    state = s.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.sum(F.col(value_col).cast("long")).alias("sum_sample"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias(
            "sumsq_sample"
        ),
    )
    w = F.lit(float(BASIS)) / F.lit(float(bp))
    stderr = F.sqrt(F.col("sumsq_sample") * w * (w - F.lit(1.0)))
    return state.select(
        *keys,
        "n_sample",
        "sum_sample",
        "sumsq_sample",
        (F.col("n_sample") * w).alias("count_est"),
        (F.col("sum_sample") * w).alias("sum_est"),
        stderr.alias("stderr_sum"),
        (F.col("sum_sample") * w - F.lit(z) * stderr).alias("ci_lo"),
        (F.col("sum_sample") * w + F.lit(z) * stderr).alias("ci_hi"),
    )


def stratified_sampled_agg(
    df: DataFrame,
    unit_col: str,
    keys: list[str],
    stratum_col: str,
    value_col,
    bp_map: dict[str, int],
    default_bp: int,
    salt: int = 0,
) -> DataFrame:
    """Per-(keys, stratum) integer sample state with the stratum's own
    rate: rare-but-heavy strata sample at higher bp, shrinking the
    group-level variance at equal budget. Rows carry bp and the per-
    stratum est/variance term; group-level totals are the SUM of the
    per-stratum est columns (exact composition — do it in a follow-up
    select or SQL, ordering-stable because each term is finalized from
    integer state)."""
    bp_col = F.lit(default_bp)
    for k, v in sorted(bp_map.items()):
        if not (0 < v <= BASIS):
            raise ValueError(f"bp must be in (0, {BASIS}]: {k}={v}")
        bp_col = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(bp_col)
    tagged = F.concat(F.col(unit_col).cast("string"), F.lit(f"|{salt}"))
    s = df.withColumn("_bp", bp_col).filter(
        (portable_hash60(tagged) % BASIS) < F.col("_bp")
    )
    state = s.groupBy(*keys, F.col(stratum_col), F.col("_bp").alias("bp")).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.sum(F.col(value_col).cast("long")).alias("sum_sample"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias(
            "sumsq_sample"
        ),
    )
    w = F.lit(float(BASIS)) / F.col("bp").cast("double")
    return state.select(
        *keys,
        stratum_col,
        "bp",
        "n_sample",
        "sum_sample",
        "sumsq_sample",
        (F.col("sum_sample") * w).alias("sum_est"),
        (F.col("sumsq_sample") * w * (w - F.lit(1.0))).alias("var_term"),
    )


# -- driver-registered queries ------------------------------------------------

from .queries import cents, register  # noqa: E402

_AQP_SQL = f"""
WITH s AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
    FROM events
    WHERE {hash_include_sql('event_id', 1000)}
), st AS (
    SELECT event_type,
           COUNT(*) AS n_sample,
           CAST(SUM(v) AS BIGINT) AS sum_sample,
           CAST(SUM(v * v) AS BIGINT) AS sumsq_sample
    FROM s GROUP BY event_type
)
SELECT event_type, n_sample, sum_sample, sumsq_sample,
       n_sample * (10000.0 / 1000.0) AS count_est,
       sum_sample * (10000.0 / 1000.0) AS sum_est,
       sqrt(sumsq_sample * (10000.0 / 1000.0) * ((10000.0 / 1000.0) - 1.0))
           AS stderr_sum,
       sum_sample * (10000.0 / 1000.0)
           - 1.96 * sqrt(sumsq_sample * (10000.0 / 1000.0)
                         * ((10000.0 / 1000.0) - 1.0)) AS ci_lo,
       sum_sample * (10000.0 / 1000.0)
           + 1.96 * sqrt(sumsq_sample * (10000.0 / 1000.0)
                         * ((10000.0 / 1000.0) - 1.0)) AS ci_hi
FROM st
"""


@register("aqp_sampled_event_value", _AQP_SQL)
def aqp_sampled_event_value(spark, sf_dir):
    """AQP over events: 10% deterministic hash sample of event_ids →
    per-type count/sum estimates with HT stderr and CI95. Full-hash
    checkable BECAUSE the sample is a pure function of the unit key and
    the float math runs once over exact integer state (module docstring).
    Cites the hash-sampling idiom of corpus_split_assign (M27)."""
    import os as _os

    e = spark.read.parquet(_os.path.join(sf_dir, "events.parquet"))
    e = e.withColumn("v", cents(F.col("value")))
    return sampled_agg(e, "event_id", ["event_type"], "v", bp=1000)
