"""Retention tests (SURVEY.md §5.6): post-drop, monthly tier still queryable
(EP3) and raw partitions gone; drop refuses when rollup not committed."""

import os
import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.pipeline import TierPipeline  # noqa: E402
from engine.retention import (  # noqa: E402
    RetentionError,
    drop_hourly_partitions,
    droppable_hourly_days,
    retention_status,
)
from engine.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=40, hot_turns=300)
    df.cache().count()
    return df


def test_refuses_drop_without_downstream(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "r1"))
    pipe.run(t0, stages=("hourly",))  # no daily/monthly committed
    days = [
        r["partition_key"].split("=", 1)[1]
        for r in pipe.manifest.committed_keys("hourly").collect()
    ]
    assert droppable_hourly_days(pipe, "9999-12-31") == []
    with pytest.raises(RetentionError):
        drop_hourly_partitions(pipe, days[:1], run_id="t")


def test_drop_after_full_lineage(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "r2"))
    pipe.run(t0)
    monthly_before = pipe.read_tier("monthly").count()
    days = droppable_hourly_days(pipe, older_than="9999-12-31")
    assert days  # full lineage committed -> everything droppable
    dropped = drop_hourly_partitions(pipe, days[:2], run_id="t2")
    assert dropped == days[:2]
    for d in dropped:
        assert not os.path.exists(
            os.path.join(pipe.tier_path("hourly"), f"bucket_date={d}")
        )
    # EP3: continuous aggregates remain queryable after the raw drop
    pipe.register_views()
    got = pipe.spark.sql(
        "SELECT COUNT(*) AS n, SUM(token_count_sum) AS s FROM tiers_monthly"
    ).collect()[0]
    assert got["n"] == monthly_before and got["s"] > 0
    # retention recorded in the manifest
    assert retention_status(pipe).get("retention") == 2


def test_retention_policy_cutoff(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "r3"))
    pipe.run(t0)
    all_days = sorted(droppable_hourly_days(pipe, "9999-12-31"))
    cutoff = all_days[len(all_days) // 2]
    older = droppable_hourly_days(pipe, older_than=cutoff)
    assert older and all(d < cutoff for d in older)


def test_compact_partition_file_counts_and_content(spark, tmp_path):
    from engine.pipeline import TierPipeline
    from engine.retention import compact_partition
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=30, hot_turns=150)
    pipe = TierPipeline(spark, str(tmp_path / "c"))
    pipe.run(t0, stages=("hourly",))
    path = pipe.tier_path("hourly")
    before = (
        pipe.read_tier("hourly")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], ignore_index=True)
    )

    def files_per_part():
        out = {}
        for d in os.listdir(path):
            if d.startswith("bucket_date="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
                )
        return out

    compact_partition(pipe, "hourly", n_files=1)
    counts = files_per_part()
    assert counts and all(n == 1 for n in counts.values()), counts
    assert not os.path.exists(path + "__old"), "promote must clean up"
    after = (
        pipe.read_tier("hourly")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(before[after.columns], after, check_dtype=False)


def test_compaction_crash_recovery(spark, tmp_path):
    """A compaction killed between its two promotion renames leaves the tier
    absent at its path with the data stranded at path+'__old' — the next
    pipeline read must self-heal (ADVICE r2)."""
    import shutil

    from engine.retention import recover_compaction
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=10, hot_turns=50)
    pipe = TierPipeline(spark, str(tmp_path / "cr"))
    pipe.run(t0, stages=("hourly",))
    path = pipe.tier_path("hourly")
    before = (
        pipe.read_tier("hourly")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], ignore_index=True)
    )
    # simulate the crash window: old renamed aside, new never promoted
    os.rename(path, path + "__old")
    assert not os.path.exists(path)
    after = (
        pipe.read_tier("hourly")  # read path heals via recover_compaction
        .toPandas()
        .sort_values(["conv_id", "bucket_start"], ignore_index=True)
    )
    assert os.path.exists(path) and not os.path.exists(path + "__old")
    pd.testing.assert_frame_equal(before, after)
    # idempotent when nothing to heal; never clobbers a live tier
    assert recover_compaction(path) is False
    shutil.rmtree(path + "__x", ignore_errors=True)
