"""AQP (engine/aqp.py): deterministic hash-sampled estimates with
Horvitz–Thompson error bars. Properties under test: the sample is a pure
function of the unit key (partition-invariant, append-stable), the CI95
covers the true total at ~the nominal rate across independent salts, the
estimator is unbiased in the mean, and stratified oversampling of a rare
heavy stratum beats uniform sampling at equal budget."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.aqp import (  # noqa: E402
    hash_include,
    sampled_agg,
    stratified_sampled_agg,
)


@pytest.fixture(scope="module")
def pop(spark):
    """100k units in one group, long-tailed integer values with a known
    exact total."""
    df = (
        spark.range(0, 100_000)
        .select(
            F.col("id").alias("uid"),
            F.lit("g").alias("g"),
            (F.pmod(F.xxhash64("id"), F.lit(100)) + 1).alias("v"),
        )
        .cache()
    )
    df.count()
    return df


def test_sample_is_partition_invariant_and_append_stable(spark, pop):
    ids_a = {
        r[0]
        for r in pop.repartition(3).filter(hash_include(F.col("uid"), 500)).select("uid").collect()
    }
    ids_b = {
        r[0]
        for r in pop.repartition(17, "v").filter(hash_include(F.col("uid"), 500)).select("uid").collect()
    }
    assert ids_a == ids_b and ids_a
    # append stability: the sample of a prefix is a subset of the sample
    # of the grown table (inclusion is row-local)
    prefix = {
        r[0]
        for r in pop.filter(F.col("uid") < 50_000)
        .filter(hash_include(F.col("uid"), 500))
        .select("uid")
        .collect()
    }
    assert prefix == {i for i in ids_a if i < 50_000}


def test_ci95_coverage_and_unbiasedness(spark, pop):
    truth = pop.agg(F.sum("v")).first()[0]
    covered = 0
    ests = []
    n_salts = 60
    for salt in range(n_salts):
        r = sampled_agg(pop, "uid", ["g"], "v", bp=200, salt=salt).first()
        ests.append(r["sum_est"])
        if r["ci_lo"] <= truth <= r["ci_hi"]:
            covered += 1
    rate = covered / n_salts
    assert rate >= 0.85, f"CI95 coverage {rate}"
    mean_est = sum(ests) / len(ests)
    assert abs(mean_est - truth) / truth < 0.02, (mean_est, truth)


def test_sampling_rate_and_count_estimate(spark, pop):
    r = sampled_agg(pop, "uid", ["g"], "v", bp=1000).first()
    # 10% of 100k units, md5-uniform: within 5σ of 10_000
    assert abs(r["n_sample"] - 10_000) < 5 * (100_000 * 0.1 * 0.9) ** 0.5
    assert r["count_est"] == r["n_sample"] * 10.0


def test_stratified_oversampling_beats_uniform(spark):
    """1% of units are 100× heavier: oversampling that stratum at equal
    total budget cuts the sum-estimator variance."""
    df = (
        spark.range(0, 100_000)
        .select(
            F.col("id").alias("uid"),
            F.lit("g").alias("g"),
            F.when(F.col("id") % 100 == 0, "heavy").otherwise("light").alias("s"),
            F.when(F.col("id") % 100 == 0, F.lit(1000)).otherwise(F.lit(10)).alias("v"),
        )
        .cache()
    )
    truth = df.agg(F.sum("v")).first()[0]

    def strat_var(salt):
        rows = stratified_sampled_agg(
            df, "uid", ["g"], "s", "v",
            bp_map={"heavy": 5000, "light": 455},  # ≈ same expected budget
            default_bp=455, salt=salt,
        ).collect()
        return sum(r["sum_est"] for r in rows), sum(r["var_term"] for r in rows)

    def unif_var(salt):
        r = sampled_agg(df, "uid", ["g"], "v", bp=500, salt=salt).first()
        return r["sum_est"], r["stderr_sum"] ** 2

    s_est, s_var = zip(*[strat_var(s) for s in range(12)])
    u_est, u_var = zip(*[unif_var(s) for s in range(12)])
    # both unbiased...
    assert abs(sum(s_est) / 12 - truth) / truth < 0.05
    assert abs(sum(u_est) / 12 - truth) / truth < 0.05
    # ...but the stratified estimator is tighter (median variance)
    assert sorted(s_var)[6] < 0.5 * sorted(u_var)[6]
    # and the empirical spread agrees with the variance claim
    import statistics

    assert statistics.pstdev(s_est) < statistics.pstdev(u_est)


def test_bad_bp_rejected(spark, pop):
    with pytest.raises(ValueError):
        sampled_agg(pop, "uid", ["g"], "v", bp=0)
    with pytest.raises(ValueError):
        stratified_sampled_agg(
            df=pop, unit_col="uid", keys=["g"], stratum_col="g",
            value_col="v", bp_map={"g": 20_000}, default_bp=100,
        )
