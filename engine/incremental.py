"""Incremental downstream consumer over the snapshot changelog
(engine/snapstore.diff / read_changes) — the CDC pattern a 100-TB serving
layer uses instead of re-scanning the tier store.

`IncrementalConvSummary` maintains a per-(conv_id, day) PARTIAL-aggregate
table keyed by the hourly tier's own partition unit. Each `refresh()`:

1. diffs the consumed hourly snapshot against the published one —
   partition-level, resolved from file inventories, no data read;
2. recomputes partials for exactly the added/rewritten days (partition-
   pruned scans) and overwrites those day partitions (dynamic overwrite);
3. drops partials of removed days (retention downstream-propagation);
4. records the consumed snapshot id (write-temp-rename, crash-safe).

The serving view (`read()`) aggregates the partials — correct under
arbitrary day REWRITES, not just appends, because a day's partial is
replaced wholesale; min/max/sum all compose from per-day partials. Refresh
cost is O(changed days), not O(history): one late turn re-rolls one day in
the pipeline and one day here. If the consumed snapshot has been expired
before the next refresh (GC raced the consumer), refresh degrades to a
full rebuild — correct, just not incremental; pin `expire(keep_last≥2)`
to consumer cadence.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import observed_state
from .snapstore import SnapshotError, SnapStore


class IncrementalConvSummary:
    def __init__(self, pipe, path: str):
        if not pipe.snapshots:
            raise ValueError("incremental consumer requires TierPipeline(snapshots=True)")
        self.pipe = pipe
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def partials_path(self) -> str:
        return os.path.join(self.path, "partials")

    @property
    def _consumed_file(self) -> str:
        return os.path.join(self.path, "_CONSUMED")

    def consumed_id(self) -> str | None:
        try:
            with open(self._consumed_file) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _record_consumed(self, sid: str) -> None:
        tmp = self._consumed_file + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(sid)
        os.replace(tmp, self._consumed_file)

    def _day_partials(self, hourly: DataFrame, days: list[str] | None) -> DataFrame:
        h = observed_state(hourly)
        if days is not None:
            h = h.filter(F.col("bucket_date").cast("string").isin(days))
        return h.groupBy(
            "conv_id", F.col("bucket_date").cast("string").alias("bucket_date")
        ).agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("token_sum").alias("token_sum"),
            F.min("token_min").alias("token_min"),
            F.max("token_max").alias("token_max"),
            F.max("bucket_start").alias("last_active"),
        )

    def refresh(self) -> dict:
        """Consume the hourly changelog up to the published snapshot.
        Returns {'mode': 'full'|'incremental'|'noop', 'days': [...]}."""
        store = SnapStore(self.pipe.tier_path("hourly"))
        current = store.current_id()
        if current is None:
            raise SnapshotError("hourly tier has no published snapshot")
        consumed = self.consumed_id()
        if consumed == current:
            return {"mode": "noop", "days": []}
        hourly = store.read(self.pipe.spark, as_of=current)
        if consumed is None or not os.path.isdir(store.snapshot_path(consumed)):
            # first build, or GC expired the consumed snapshot: full rebuild
            (
                self._day_partials(hourly, None)
                .write.partitionBy("bucket_date")
                .mode("overwrite")
                .parquet(self.partials_path)
            )
            self._record_consumed(current)
            return {"mode": "full", "days": []}
        d = store.diff(consumed, current)
        changed = sorted(
            p.split("=", 1)[1] for p in d["added"] + d["rewritten"]
        )
        if changed:
            (
                self._day_partials(hourly, changed)
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket_date")
                .mode("overwrite")
                .parquet(self.partials_path)
            )
        import shutil

        for p in d["removed"]:
            day = p.split("=", 1)[1]
            shutil.rmtree(
                os.path.join(self.partials_path, f"bucket_date={day}"),
                ignore_errors=True,
            )
        self._record_consumed(current)
        return {"mode": "incremental", "days": changed, "removed": len(d["removed"])}

    def read(self) -> DataFrame:
        """The serving view: per-conversation totals composed from day
        partials (sums/min/max compose; last_active = max over days)."""
        p = self.pipe.spark.read.parquet(self.partials_path)
        return p.groupBy("conv_id").agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("token_sum").alias("token_sum"),
            F.min("token_min").alias("token_min"),
            F.max("token_max").alias("token_max"),
            F.max("last_active").alias("last_active"),
        )
