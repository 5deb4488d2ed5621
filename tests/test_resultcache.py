"""Snapshot-keyed result cache (engine/resultcache.py): hit/miss semantics,
structural invalidation on snapshot-pointer flips, eviction, and the
pipeline integration (a run / retention change = automatic miss)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.pipeline import TierPipeline  # noqa: E402
from engine.resultcache import ResultCache  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


def _sorted(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def test_hit_serves_identical_bytes_without_rebuild(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return spark.range(100).withColumn("v", F.col("id") * 3)

    deps = {"t": "snap-0001"}
    r1, hit1 = cache.serve("q1", deps, build)
    r2, hit2 = cache.serve("q1", deps, build)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1  # second serve never ran the thunk
    import pandas as pd

    pd.testing.assert_frame_equal(_sorted(r1), _sorted(r2))


def test_dep_change_misses_and_key_isolation(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path))

    def build_n(n):
        return lambda: spark.range(n).selectExpr("id", "id * id AS sq")

    r1, hit = cache.serve("q", {"t": "s1"}, build_n(10))
    assert not hit and r1.count() == 10
    r2, hit = cache.serve("q", {"t": "s2"}, build_n(20))  # pointer flipped
    assert not hit and r2.count() == 20
    r3, hit = cache.serve("q", {"t": "s1"}, build_n(999))
    assert hit and r3.count() == 10  # old snapshot's entry still valid
    r4, hit = cache.serve("other", {"t": "s1"}, build_n(5))
    assert not hit and r4.count() == 5  # different key, same deps


def test_evict_keeps_newest_per_key(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path))
    for i, snap in enumerate(["s1", "s2", "s3"]):
        cache.serve("q", {"t": snap}, lambda n=i: spark.range(n + 1))
    cache.serve("other", {"t": "s1"}, lambda: spark.range(7))
    removed = cache.evict(keep_last_n=1)
    assert len(removed) == 2
    left = cache.entries()
    assert sorted(m["key"] for m in left) == ["other", "q"]
    # the survivor for q is the newest (s3) and still serves as a hit
    r, hit = cache.serve("q", {"t": "s3"}, lambda: spark.range(999))
    assert hit and r.count() == 3


def test_pipeline_snapshot_pointers_drive_invalidation(spark, tmp_path):
    """End-to-end: cache a monthly-tier query keyed on the pipeline's
    snapshot pointers; a new run with more data flips the pointer and the
    cache recomputes, serving the updated result."""
    root = str(tmp_path / "tiers")
    t0 = synth_transcripts(spark, n_convs=6, hot_turns=60)
    early = t0.filter(F.dayofmonth("ts") <= 10)
    pipe = TierPipeline(spark, root, snapshots=True)
    cache = ResultCache(spark, root)

    def deps():
        return ResultCache.deps_of(
            {n: pipe._store(pipe.table_path(n)) for n in pipe.TABLE_NAMES}
        )

    def build():
        return (
            pipe.read_tier("monthly")
            .groupBy("conv_id")
            .agg(F.sum("n_turns").alias("turns"))
        )

    pipe.run(early, run_id="r1")
    r1, hit = cache.serve("monthly_turns", deps(), build)
    assert not hit
    r1b, hit = cache.serve("monthly_turns", deps(), build)
    assert hit
    total_early = sum(r["turns"] for r in r1b.collect())

    pipe.run(t0, run_id="r2")  # pointer flip -> structural miss
    r2, hit = cache.serve("monthly_turns", deps(), build)
    assert not hit
    total_full = sum(r["turns"] for r in r2.collect())
    assert total_full == t0.count() > total_early

    # unchanged re-run: fingerprints make it a no-op, pointers stay, cache hits
    pipe.run(t0, run_id="r3")
    _, hit = cache.serve("monthly_turns", deps(), build)
    assert hit
