"""Guards bench.py's measurement honesty: the primary-metric stage must
re-execute the full leaf rollup, not read it back from the hourly cache
(Spark's CacheManager substitutes a cached DataFrame into any
plan-identical subtree — the bug this pins down was exactly that)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


def test_rollup_stage_not_cache_substituted(spark):
    t0 = synth_transcripts(spark, n_convs=100, hot_turns=500, partitions=4)
    t0 = t0.cache()
    t0.count()
    stages = bench.pipeline_queries(spark, t0)
    prepare, factory = stages["pipeline_rollup_monthly"]
    assert prepare is None  # must run BEFORE any hourly cache exists
    df = factory()
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly the t0 cache may appear; the hourly aggregate must not be
    # served from an InMemoryRelation (leaf agg really executes)
    assert "HashAggregate" in plan
    mem_scans = plan.count("InMemoryTableScan")
    # t0 is cached and scanned once per window (initial+final AQE print can
    # double-count the same node id, so compare against the gap-fill stage
    # which LEGITIMATELY reads the cached hourly after prepare())
    gf_prepare, gf_factory = stages["gapfill_locf"]
    gf_prepare()
    gdf = gf_factory()
    gdf.write.format("noop").mode("overwrite").save()
    gplan = gdf._jdf.queryExecution().executedPlan().toString()
    assert gplan.count("InMemoryTableScan") > 0  # reads the hourly cache
    # after the hourly cache exists, a rebuilt rollup plan WOULD be
    # substituted — proving the ordering is what protects the metric
    df2 = factory()
    df2.write.format("noop").mode("overwrite").save()
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("InMemoryTableScan") > mem_scans


def test_sf1_queries_are_registered():
    """Every sf1-subset name must exist in the driver registry (the sf1
    mode reuses the same callables on the upsampled tables)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in bench.SF1_QUERIES:
        assert name in qs, name
