"""Retention + compaction (SURVEY.md L1/L2).

BASELINE.json:6: "Retention policies drop raw tiers after downsampling while
continuous aggregates remain queryable via Spark SQL."

Safety rule (SURVEY.md §7.3): a partition may be dropped only when its
*entire* downstream lineage is manifest-committed — e.g. an hourly
bucket_date partition needs its 'daily' day commit AND the 'monthly' commit
of its month AND the gapfill/compress commits of every conv_bucket. On plain
parquet the drop is a partition-directory delete (the emulation of Iceberg
``DELETE FROM ... WHERE`` + ``expire_snapshots``); the manifest records the
drop so resume never re-creates it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .checkpoint import Manifest
from .pipeline import TierPipeline


class RetentionError(RuntimeError):
    pass


def _committed(manifest: Manifest, stage: str) -> set[str]:
    return {
        r["partition_key"].split("=", 1)[1]
        for r in manifest.committed_keys(stage).collect()
    }


def droppable_hourly_days(pipe: TierPipeline, older_than: str) -> list[str]:
    """Days strictly older than `older_than` (YYYY-MM-DD) whose full lineage
    chain is committed."""
    m = pipe.manifest
    daily = _committed(m, "daily")
    monthly = _committed(m, "monthly")
    hourly = _committed(m, "hourly")
    gapfill = _committed(m, "gapfill")
    compress = _committed(m, "compress")
    # every conv_bucket stage key must be committed before any day drops:
    # chunks/gapfill read whole hourly series
    all_cb = {
        r["conv_bucket"]
        for r in pipe.read_tier("hourly").select("conv_bucket").distinct().collect()
    }
    cb_done = all_cb <= {int(x) for x in gapfill} and all_cb <= {
        int(x) for x in compress
    }
    out = []
    for day in sorted(hourly):
        if day >= older_than:
            continue
        month = day[:7]
        if day in daily and month in monthly and cb_done:
            out.append(day)
    return out


def drop_hourly_partitions(
    pipe: TierPipeline, days: list[str], run_id: str, force: bool = False
) -> list[str]:
    """L1: delete hourly bucket_date partitions. Refuses (RetentionError)
    when a requested day's lineage is not fully committed, unless forced."""
    safe = set(droppable_hourly_days(pipe, older_than="9999-12-31"))
    dropped = []
    for day in days:
        if day not in safe and not force:
            raise RetentionError(
                f"refusing to drop hourly day={day}: downstream rollup not "
                "manifest-committed"
            )
        part_dir = os.path.join(pipe.tier_path("hourly"), f"bucket_date={day}")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
            dropped.append(day)
    if dropped:
        pipe.manifest.commit(
            [
                {
                    "run_id": run_id,
                    "stage": "retention",
                    "partition_key": f"day={d}",
                    "lineage": "hourly",
                }
                for d in dropped
            ]
        )
    return dropped


def recover_compaction(path: str) -> bool:
    """Heal a compaction interrupted between its two renames: if the tier is
    absent at `path` but its pre-compaction copy survives at `path`+'__old',
    restore it. Returns True when a recovery happened. Called automatically
    by `compact_partition` and `TierPipeline.read_tier`, so a crashed
    compaction self-heals on the next read or retry."""
    old = path + "__old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def compact_partition(pipe: TierPipeline, tier: str, n_files: int = 1) -> None:
    """L2: rewrite a tier table into ~n_files per partition (small-file
    compaction; Iceberg's rewrite_data_files equivalent).

    Shuffle key is (partition value, salt∈[0,n_files)) so every partition
    spreads over ~n_files independent tasks/files — plain
    repartition(n, part_col) would funnel each partition value through ONE
    task and serialize unrelated partitions through n tasks. Promotion: the
    old directory is renamed aside, the compacted one takes its place, and
    the old copy is deleted last. Between the two renames the tier path is
    briefly absent — a crash in that window is healed by
    `recover_compaction` (run here and on every pipeline read), but
    compaction is NOT safe against concurrent readers of the same tier;
    with a real Iceberg catalog the snapshot commit makes this atomic.
    """
    path = pipe.tier_path(tier)
    recover_compaction(path)
    df = pipe.spark.read.parquet(path)
    part_col = "bucket_month" if tier == "monthly" else "bucket_date"
    tmp = path + "__compact"
    salt = F.pmod(F.xxhash64("conv_id"), F.lit(n_files))
    (
        df.repartition(F.col(part_col), salt)
        .write.partitionBy(part_col)
        .mode("overwrite")
        .parquet(tmp)
    )
    old = path + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def retention_status(pipe: TierPipeline) -> dict:
    """Summary for ops: per-stage committed partition counts + dropped days."""
    m = pipe.manifest.read()
    rows = (
        m.groupBy("stage")
        .agg(F.countDistinct("partition_key").alias("n"))
        .collect()
    )
    return {r["stage"]: r["n"] for r in rows}
