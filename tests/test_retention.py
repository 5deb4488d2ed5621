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


def _table_pdf(spark, path, keys):
    return (
        spark.read.parquet(path)
        .toPandas()
        .sort_values(keys, ignore_index=True)
    )


def test_hourly_drop_then_rerun_is_stable(spark, t0, tmp_path):
    """The retention / resume interaction: after an L1 hourly drop, a rerun
    over the SAME raw input must be a full no-op — the dropped days must
    not be re-created, read as deleted input (stale cascade), or read as
    late data (spurious series re-roll truncating archived gapfill/chunks).
    Pins the recommitted fingerprints + protect-set machinery."""
    import pandas as pd

    from engine.pipeline import TierPipeline

    pipe = TierPipeline(spark, str(tmp_path / "rr"))
    pipe.run(t0)
    days = droppable_hourly_days(pipe, older_than="9999-12-31")
    dropped = drop_hourly_partitions(pipe, days[:2], run_id="rr")
    assert dropped == days[:2]
    before = {
        "daily": _table_pdf(spark, pipe.tier_path("daily"),
                            ["conv_id", "bucket_start"]),
        "monthly": _table_pdf(spark, pipe.tier_path("monthly"),
                              ["conv_id", "bucket_start"]),
        "gapfill": _table_pdf(spark, pipe.gapfill_path,
                              ["conv_id", "metric", "bucket_start"]),
        "chunks": _table_pdf(spark, pipe.chunks_path,
                             ["conv_id", "metric", "chunk_start"]),
    }
    res = pipe.run(t0)
    assert all(n == 0 for n in res["stages"].values()), res
    for d in dropped:
        assert not os.path.exists(
            os.path.join(pipe.tier_path("hourly"), f"bucket_date={d}")
        ), "rerun must not resurrect retention-dropped hourly days"
    for name, b in before.items():
        path = (
            pipe.tier_path(name)
            if name in ("daily", "monthly")
            else (pipe.gapfill_path if name == "gapfill" else pipe.chunks_path)
        )
        keys = [c for c in b.columns if not b[c].map(type).eq(bytes).any()]
        after = _table_pdf(spark, path, keys)
        pd.testing.assert_frame_equal(
            after[b.columns],
            b.sort_values(keys, ignore_index=True)[b.columns],
        ), name


def test_daily_retention_freezes_month(spark, t0, tmp_path):
    """VERDICT r2 item 9: daily days drop once their month is committed;
    the month is then FROZEN — late raw data is refused (frozen_skipped),
    never aggregated from a partial month — and the monthly tier stays
    queryable byte-for-byte."""
    import pandas as pd

    from engine.pipeline import TierPipeline
    from engine.retention import (
        drop_daily_partitions,
        droppable_daily_days,
        frozen_months,
    )
    from pyspark.sql import functions as F

    pipe = TierPipeline(spark, str(tmp_path / "dr"))
    pipe.run(t0, stages=("hourly", "daily"))
    with pytest.raises(RetentionError):
        drop_daily_partitions(pipe, ["1970-01-01"], run_id="d0")
    assert droppable_daily_days(pipe, "9999-12-31") == []  # monthly missing
    pipe.run(t0)  # complete the lineage
    days = droppable_daily_days(pipe, older_than="9999-12-31")
    assert days
    victim_month = days[0][:7]
    month_days = [d for d in days if d.startswith(victim_month)]
    monthly_before = _table_pdf(
        spark, pipe.tier_path("monthly"), ["conv_id", "bucket_start"]
    )
    dropped = drop_daily_partitions(pipe, month_days, run_id="d1")
    assert dropped == month_days
    assert frozen_months(pipe.manifest) == {victim_month}
    for d in dropped:
        assert not os.path.exists(
            os.path.join(pipe.tier_path("daily"), f"bucket_date={d}")
        )
    # late raw data lands in the frozen month -> refused, tiers unchanged
    late = t0.limit(50).withColumn(
        "ts", F.to_timestamp(F.lit(f"{victim_month}-15 12:00:00"))
    )
    res = pipe.run(t0.unionByName(late))
    assert "frozen_skipped" in res["stages"], res
    assert res["stages"]["frozen_skipped"] == [victim_month]
    monthly_after = _table_pdf(
        spark, pipe.tier_path("monthly"), ["conv_id", "bucket_start"]
    )
    frozen_rows_b = monthly_before[
        monthly_before["bucket_month"] == victim_month
    ].reset_index(drop=True)
    frozen_rows_a = monthly_after[
        monthly_after["bucket_month"] == victim_month
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(frozen_rows_a, frozen_rows_b)


def test_conv_bucket_retention_gapfill_chunks(spark, t0, tmp_path):
    """VERDICT r2 item 8: gapfill/chunks conv_bucket partitions expire with
    the same refusal/drop/still-queryable triple as hourly days, and a
    rerun over unchanged input keeps them dropped (fingerprint match)."""
    from pyspark.sql import functions as F

    from engine.pipeline import TierPipeline
    from engine.retention import (
        drop_conv_bucket_partitions,
        droppable_conv_buckets,
    )

    pipe = TierPipeline(spark, str(tmp_path / "cb"))
    pipe.run(t0, stages=("hourly", "daily", "monthly"))  # gapfill not run
    assert droppable_conv_buckets(pipe, "gapfill") == []
    with pytest.raises(RetentionError):
        drop_conv_bucket_partitions(pipe, "gapfill", [0], run_id="c0")
    pipe.run(t0)  # commit gapfill + compress
    for stage, path in (("gapfill", pipe.gapfill_path),
                        ("compress", pipe.chunks_path)):
        safe = droppable_conv_buckets(pipe, stage)
        assert safe
        victims = safe[:2]
        total_before = spark.read.parquet(path).count()
        n_victim = (
            spark.read.parquet(path)
            .filter(F.col("conv_bucket").isin(victims))
            .count()
        )
        dropped = drop_conv_bucket_partitions(pipe, stage, victims, run_id="c1")
        assert dropped == victims
        remaining = spark.read.parquet(path)
        assert remaining.count() == total_before - n_victim
        assert remaining.filter(F.col("conv_bucket").isin(victims)).count() == 0
    res = pipe.run(t0)  # unchanged input: buckets stay dropped
    assert all(n == 0 for n in res["stages"].values()), res
    for path in (pipe.gapfill_path, pipe.chunks_path):
        assert (
            spark.read.parquet(path)
            .filter(F.col("conv_bucket").isin(victims))
            .count()
            == 0
        )


def test_compact_series_tables(spark, t0, tmp_path):
    """L2 extended to the conv_bucket-keyed series tables: gapfill and
    chunk partitions compact to ~1 file each, content byte-identical."""
    from engine.retention import compact_partition

    pipe = TierPipeline(spark, str(tmp_path / "cs"))
    pipe.run(t0)
    for tier, path, keys in (
        ("gapfill", pipe.gapfill_path, ["conv_id", "metric", "bucket_start"]),
        ("compress", pipe.chunks_path, ["conv_id", "metric", "chunk_start"]),
    ):
        before = _table_pdf(spark, path, keys)
        compact_partition(pipe, tier, n_files=1)
        counts = {
            d: len([f for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")])
            for d in os.listdir(path) if d.startswith("conv_bucket=")
        }
        assert counts and all(n == 1 for n in counts.values()), (tier, counts)
        after = _table_pdf(spark, path, keys)
        pd.testing.assert_frame_equal(after, before), tier


def test_compact_with_sort_order_enables_rowgroup_skipping(spark, t0, tmp_path):
    """Iceberg rewrite-with-sort-order: after a sorted compaction, each
    file's row groups carry disjoint, ordered conv_id min/max stats — a
    point lookup can skip every non-matching row group from the footer
    alone — and the data is byte-identical to before."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from engine.retention import compact_partition

    dense = synth_transcripts(spark, n_convs=400, hot_turns=4000)
    pipe = TierPipeline(spark, str(tmp_path / "srt"))
    pipe.run(dense, stages=("hourly",))
    path = pipe.tier_path("hourly")
    keys = ["conv_id", "bucket_start", "filled"]
    before = _table_pdf(spark, path, keys)
    compact_partition(
        pipe, "hourly", n_files=1,
        sort_by=("conv_id", "bucket_start"), rowgroup_bytes=4 * 1024,
    )
    pd.testing.assert_frame_equal(_table_pdf(spark, path, keys), before)

    multi_rg_files = 0
    for d in os.listdir(path):
        if not d.startswith("bucket_date="):
            continue
        for fn in os.listdir(os.path.join(path, d)):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, d, fn)).metadata
            idx = md.schema.names.index("conv_id")
            spans = [
                (
                    md.row_group(i).column(idx).statistics.min,
                    md.row_group(i).column(idx).statistics.max,
                )
                for i in range(md.num_row_groups)
            ]
            assert all(lo <= hi for lo, hi in spans)
            # ordered and non-overlapping beyond the shared boundary key:
            # a conv spanning two row groups may repeat at the seam
            for (plo, phi), (lo, hi) in zip(spans, spans[1:]):
                assert lo >= phi, (fn, spans)
            if md.num_row_groups >= 2:
                multi_rg_files += 1
    assert multi_rg_files > 0  # small block size actually split groups
    # the skipping-shaped query still answers correctly
    one = before["conv_id"].iloc[0]
    got = (
        spark.read.parquet(path)
        .filter(F.col("conv_id") == one)
        .count()
    )
    assert got == int((before["conv_id"] == one).sum())
