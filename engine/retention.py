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


def _existing_parts(pipe: TierPipeline, table_path: str, dirnames: list[str]) -> list[str]:
    """Partition dirnames that currently exist in the table (snapshot-aware:
    in snapshot mode existence means presence in the published snapshot)."""
    base = table_path
    if pipe.snapshots:
        store = pipe._store(table_path)
        cur = store.current_id()
        if cur is None:
            return []
        base = store.snapshot_path(cur)
    return [d for d in dirnames if os.path.isdir(os.path.join(base, d))]


def _remove_parts(pipe: TierPipeline, table_path: str, dirnames: list[str]) -> None:
    """Physically drop partition dirs. Plain mode: rmtree. Snapshot mode:
    one CoW snapshot without them — concurrent readers keep their pinned
    view and the pre-drop state stays time-travelable until expired."""
    if not dirnames:
        return
    if pipe.snapshots:
        pipe._store(table_path).drop_partitions(dirnames, op="retention")
        return
    for d in dirnames:
        shutil.rmtree(os.path.join(table_path, d))


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
    for day in days:
        if day not in safe and not force:
            raise RetentionError(
                f"refusing to drop hourly day={day}: downstream rollup not "
                "manifest-committed"
            )
    table = pipe.tier_path("hourly")
    existing = _existing_parts(pipe, table, [f"bucket_date={d}" for d in days])
    _remove_parts(pipe, table, existing)
    dropped = [d.split("=", 1)[1] for d in existing]
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
        _recommit_series_fingerprints(pipe, run_id)
    return dropped


def _recommit_series_fingerprints(pipe: TierPipeline, run_id: str) -> None:
    """After an hourly retention drop, re-commit the gapfill/compress
    manifest rows with fingerprints recomputed over the REMAINING hourly
    days. Without this the next run's fingerprint diff would read the
    horizon truncation as late data and re-roll every conv_bucket's series
    from the partial input — overwriting archived full-history gapfill and
    chunk partitions with truncated ones. With it, an unchanged input skips
    cleanly; genuinely new post-drop data still re-rolls its bucket (which
    then regenerates from the remaining horizon only — documented loss of
    pre-horizon fill rows for that actively-changing bucket)."""
    from .checkpoint import work_manifest
    from .pipeline import _STATE_HASH_COLS
    from .rollup import observed_state

    from .checkpoint import DELETED_SNAPSHOT

    hourly = observed_state(pipe.read_tier("hourly"))
    work = work_manifest(
        hourly, F.col("conv_bucket").cast("string"), _STATE_HASH_COLS, "cb"
    ).collect()
    work_keys = {r["partition_key"] for r in work}
    rows = []
    for stage in ("gapfill", "compress"):
        committed = _committed(pipe.manifest, stage)
        rows += [
            {
                "run_id": run_id,
                "stage": stage,
                "partition_key": r["partition_key"],
                "rows_in": r["rows_in"],
                "lineage": "hourly-retention-recommit",
                "input_snapshot_id": r["input_snapshot_id"],
            }
            for r in work
            if r["partition_key"].split("=", 1)[1] in committed
        ]
        # conv_buckets whose EVERY hourly row fell inside the dropped days
        # have no work row left; the DELETED sentinel (archive lineage)
        # exempts their gapfill/chunk partitions from the stale-input
        # cascade — the archived series outlives its raw tier, which is
        # the entire point of retention — while still re-rolling the
        # bucket if its conversations ever produce data again.
        rows += [
            {
                "run_id": run_id,
                "stage": stage,
                "partition_key": f"cb={cb}",
                "lineage": "hourly-retention-archive",
                "input_snapshot_id": DELETED_SNAPSHOT,
            }
            for cb in sorted(committed)
            if f"cb={cb}" not in work_keys
        ]
    if rows:
        pipe.manifest.commit(rows)


def droppable_daily_days(pipe: TierPipeline, older_than: str) -> list[str]:
    """Daily bucket_date partitions strictly older than `older_than` whose
    month has a committed monthly rollup — the tier-lifecycle completion
    (VERDICT r2 item 9): hourly days drop once daily+monthly+series stages
    commit (L1), daily days drop once their month commits."""
    m = pipe.manifest
    daily = _committed(m, "daily")
    monthly = _committed(m, "monthly")
    return [
        d for d in sorted(daily) if d < older_than and d[:7] in monthly
    ]


def drop_daily_partitions(
    pipe: TierPipeline, days: list[str], run_id: str, force: bool = False
) -> list[str]:
    """Drop daily bucket_date partitions whose month is monthly-committed,
    and FREEZE those months: a monthly re-roll needs every sibling day of
    the month, so once any day is retention-dropped the month's aggregate
    is final — late raw data for a frozen month is refused (recorded in the
    pipeline result as `frozen_skipped`), never silently rolled up from a
    partial month. This is the continuous-aggregate finalization rule:
    retention of the lower tier freezes the upper one."""
    safe = set(droppable_daily_days(pipe, older_than="9999-12-31"))
    for day in days:
        if day not in safe and not force:
            raise RetentionError(
                f"refusing to drop daily day={day}: monthly rollup not "
                "manifest-committed"
            )
    table = pipe.tier_path("daily")
    existing = _existing_parts(pipe, table, [f"bucket_date={d}" for d in days])
    _remove_parts(pipe, table, existing)
    dropped = [d.split("=", 1)[1] for d in existing]
    if dropped:
        rows = [
            {
                "run_id": run_id,
                "stage": "retention",
                "partition_key": f"day={d}",
                "lineage": "daily",
            }
            for d in dropped
        ]
        rows += [
            {
                "run_id": run_id,
                "stage": "frozen",
                "partition_key": f"month={m}",
                "lineage": "daily-retention",
            }
            for m in sorted({d[:7] for d in dropped})
        ]
        pipe.manifest.commit(rows)
    return dropped


def frozen_months(manifest: Manifest) -> set[str]:
    """Months finalized by daily retention — excluded from monthly re-rolls."""
    return {
        r["partition_key"].split("=", 1)[1]
        for r in manifest.read()
        .filter(F.col("stage") == "frozen")
        .select("partition_key")
        .distinct()
        .collect()
    }


def droppable_conv_buckets(pipe: TierPipeline, stage: str) -> list[int]:
    """conv_bucket partitions of the gapfill/compress tables safe to expire:
    committed AND not pending (a bucket whose hourly input changed is mid
    re-roll — dropping it would race the rewrite). Retention of cold
    conversation buckets; if a dropped bucket's conversations turn hot
    again, the fingerprint diff re-rolls and the partition reappears —
    that resurrection is the intended semantics for activity-based
    retention."""
    assert stage in ("gapfill", "compress"), stage
    from .checkpoint import pending_rows, work_manifest
    from .pipeline import _STATE_HASH_COLS
    from .rollup import observed_state

    hourly = observed_state(pipe.read_tier("hourly"))
    work = work_manifest(
        hourly, F.col("conv_bucket").cast("string"), _STATE_HASH_COLS, "cb"
    )
    pending = {
        r["partition_key"]
        for r in pending_rows(work.collect(), pipe.manifest, stage)
    }
    committed = _committed(pipe.manifest, stage)
    return sorted(
        int(cb) for cb in committed if f"cb={cb}" not in pending
    )


def drop_conv_bucket_partitions(
    pipe: TierPipeline,
    stage: str,
    cbs: list[int],
    run_id: str,
    force: bool = False,
) -> list[int]:
    """Expire conv_bucket partitions of the gapfill ('gapfill') or chunks
    ('compress') table. Refuses while the bucket is pending re-roll unless
    forced; the drop is manifest-recorded (stage='retention') and survives
    reruns — an unchanged input fingerprint keeps the partition dropped,
    a changed one regenerates it."""
    safe = set(droppable_conv_buckets(pipe, stage))
    table_path = pipe.gapfill_path if stage == "gapfill" else pipe.chunks_path
    for cb in cbs:
        if cb not in safe and not force:
            raise RetentionError(
                f"refusing to drop {stage} cb={cb}: bucket is pending re-roll "
                "or was never committed"
            )
    existing = _existing_parts(
        pipe, table_path, [f"conv_bucket={cb}" for cb in cbs]
    )
    _remove_parts(pipe, table_path, existing)
    dropped = [int(d.split("=", 1)[1]) for d in existing]
    if dropped:
        pipe.manifest.commit(
            [
                {
                    "run_id": run_id,
                    "stage": "retention",
                    "partition_key": f"cb={cb}",
                    "lineage": stage,
                }
                for cb in dropped
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


def compact_partition(
    pipe: TierPipeline,
    tier: str,
    n_files: int = 1,
    sort_by: tuple[str, ...] = (),
    rowgroup_bytes: int | None = None,
    zorder: tuple[str, str] | None = None,
) -> None:
    """L2: rewrite a tier table — or the 'gapfill' / 'compress' (chunks)
    series tables, keyed by conv_bucket — into ~n_files per partition
    (small-file compaction; Iceberg's rewrite_data_files equivalent).

    `sort_by` is Iceberg's rewrite-with-sort-order: rows are clustered by
    the given columns WITHIN each output file, so parquet row-group min/max
    stats become disjoint ranges on the leading sort column and a point
    lookup (`conv_id = X`) or series range scan skips every non-matching
    row group at footer level — the read-side payoff that makes periodic
    compaction worth its write cost on a 100-TB series store.
    `rowgroup_bytes` tunes parquet.block.size for the rewrite (smaller row
    groups = finer skipping granularity at slightly more footer overhead).

    `zorder` (mutually exclusive with `sort_by`) is the multi-dimensional
    variant — Iceberg's rewrite ZORDER strategy: rows cluster on a Morton
    interleave of the two columns' rank positions (engine/zorder.py), so
    row-group min/max stats prune on EITHER dimension (conv point lookups
    AND cross-conversation time-range scans), where a linear sort prunes
    only its leading column.

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
    if tier == "gapfill":
        path, part_cols = pipe.gapfill_path, ["conv_bucket"]
    elif tier == "compress":
        path, part_cols = pipe.chunks_path, ["conv_bucket"]
    elif tier == "monthly":
        path, part_cols = pipe.tier_path(tier), ["bucket_month"]
    elif tier == "hourly":
        # respect the pipeline's partition-spec version: compacting an
        # evolved (day, conv_bucket) tier must not silently rewrite it
        # back to day-only dirs
        path, part_cols = pipe.tier_path(tier), pipe.hourly_partition_cols()
    else:
        path, part_cols = pipe.tier_path(tier), ["bucket_date"]
    salt = F.pmod(F.xxhash64("conv_id"), F.lit(n_files))
    if zorder and sort_by:
        raise ValueError("zorder and sort_by are mutually exclusive")

    def _rewrite(df, dest, dynamic: bool):
        cols = df.columns
        if zorder:
            from .zorder import with_zorder_key

            df = with_zorder_key(df, zorder)
        out = df.repartition(*[F.col(c) for c in part_cols], salt)
        if zorder:
            out = out.sortWithinPartitions(*part_cols, "__z").select(*cols)
        elif sort_by:
            out = out.sortWithinPartitions(*part_cols, *sort_by)
        w = out.write
        if dynamic:
            w = w.option("partitionOverwriteMode", "dynamic")
        if rowgroup_bytes:
            w = w.option("parquet.block.size", rowgroup_bytes)
        w.partitionBy(*part_cols).mode("overwrite").parquet(dest)

    if pipe.snapshots:
        # snapshot mode: rewrite into a fresh snapshot reading the published
        # one, then an atomic pointer flip — concurrent readers keep their
        # pinned pre-compaction view, and no path is ever absent. This is
        # the Iceberg rewrite_data_files + snapshot-commit shape.
        store = pipe._store(path)
        df = store.read(pipe.spark)
        sid = store.begin("compact")
        try:
            _rewrite(df, store.snapshot_path(sid), dynamic=True)
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)
        return
    recover_compaction(path)
    df = pipe.spark.read.parquet(path)
    tmp = path + "__compact"
    _rewrite(df, tmp, dynamic=False)
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


def expire_snapshots(
    pipe: TierPipeline,
    keep_last: int = 1,
    protect_runs: list[str] | None = None,
    consumers: list | None = None,
) -> dict[str, list[str]]:
    """Iceberg `expire_snapshots` for snapshot-mode pipelines: GC retained
    snapshot trees across every pipeline table, keeping the newest
    `keep_last` per table (the published one always survives). File data is
    freed when its last hardlink goes, so a partition rewritten N runs ago
    but unchanged since keeps exactly one physical copy no matter how many
    snapshots referenced it.

    Referenced snapshots are protected even below keep_last (ADVICE r3):
    - the newest sealed run barrier's ids (the default `read_consistent()` /
      `rollback_run` target) always survive;
    - `protect_runs` pins additional sealed runs by id;
    - `consumers` (IncrementalConvSummary instances or their paths) pin each
      consumer's _CONSUMED hourly snapshot so its next refresh stays
      incremental instead of silently degrading to a full rebuild."""
    if not pipe.snapshots:
        raise RetentionError("expire_snapshots requires TierPipeline(snapshots=True)")
    protected: dict[str, set] = {}

    def _protect(table: str, sid: str | None) -> None:
        if sid:
            protected.setdefault(table, set()).add(sid)

    try:
        for name, sid in pipe.run_snapshots().items():
            _protect(name, sid)
    except ValueError:
        pass  # no sealed runs yet
    for rid in protect_runs or []:
        for name, sid in pipe.run_snapshots(rid).items():
            _protect(name, sid)
    for c in consumers or []:
        if isinstance(c, str):
            f = os.path.join(c, "_CONSUMED")
            try:
                with open(f) as fh:
                    _protect("hourly", fh.read().strip() or None)
            except FileNotFoundError:
                pass
        else:
            _protect("hourly", c.consumed_id())
    out = {}
    for name in ("hourly", "daily", "monthly", "gapfill", "chunks"):
        store = pipe._store(pipe.table_path(name))
        if store.current_id() is not None:
            out[name] = store.expire(
                keep_last=keep_last, protected=protected.get(name, set())
            )
    return out
