"""EP2 — the full tiering batch job (SURVEY.md §3):

    ingest -> dedup/order -> hourly -> daily -> monthly -> gap-fill ->
    compress -> (retention) with a manifest commit after every stage.

Each stage materializes to its table and commits per-partition lineage rows,
deliberately mirroring the reference's write-GeoTIFF-then-skip-on-rerun
checkpoint idiom: a rerun anti-joins the manifest and touches only
uncommitted partitions (partition pruning keeps the scans narrow).

Resume granularity per stage:
    hourly/daily  -> bucket_date (day)      key 'day=YYYY-MM-DD'
    monthly       -> month                   key 'month=YYYY-MM'
    gapfill/compress -> conv_bucket          key 'cb=<n>'   (series must be
                        whole per conversation: LOCF/interp cross months)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bucket import dedup_turns, mask_valid
from .checkpoint import Manifest, new_run_id, pending_partitions
from .codec.chunks import make_chunks
from .gapfill import gapfill, hourly_series
from .rollup import rollup_hourly, rollup_up, tier_view
from .skew import rollup_hourly_salted

N_CONV_BUCKETS = 64


def _conv_bucket(col="conv_id", n=N_CONV_BUCKETS):
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def _write(df: DataFrame, path: str, partition_cols: list[str]):
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )


def _per_key_counts(df: DataFrame, key_col) -> dict[str, int]:
    rows = df.groupBy(key_col.alias("_k")).count().collect()
    return {str(r["_k"]): r["count"] for r in rows}


class TierPipeline:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        salted: bool = False,
        n_salts: int = 16,
        fill_method: str = "locf",
    ):
        self.spark = spark
        self.root = root
        self.salted = salted
        self.n_salts = n_salts
        self.fill_method = fill_method
        self.manifest = Manifest(spark, os.path.join(root, "_manifest"))

    # -- paths -------------------------------------------------------------
    def tier_path(self, tier: str) -> str:
        return os.path.join(self.root, "tiers", tier)

    @property
    def gapfill_path(self) -> str:
        return os.path.join(self.root, "gapfill")

    @property
    def chunks_path(self) -> str:
        return os.path.join(self.root, "chunks")

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.read.parquet(self.tier_path(tier))

    # -- stage driver --------------------------------------------------------
    def _run_stage(
        self,
        stage: str,
        run_id: str,
        work_keys: DataFrame,  # column: partition_key
        build,  # pending_keys DF -> (input_df, out_df, key_col_in, key_col_out)
        out_path: str,
        partition_cols: list[str],
        lineage: str,
    ) -> int:
        t0 = time.monotonic()
        pending = pending_partitions(work_keys, self.manifest, stage)
        keys = [r["partition_key"] for r in pending.collect()]
        if not keys:
            return 0
        inp, out, key_in, key_out = build(keys)
        rows_in = _per_key_counts(inp, key_in)
        rows_out = _per_key_counts(out, key_out)
        _write(out, out_path, partition_cols)
        wall = int((time.monotonic() - t0) * 1000)
        self.manifest.commit(
            [
                {
                    "run_id": run_id,
                    "stage": stage,
                    "partition_key": k,
                    "rows_in": rows_in.get(k.split("=", 1)[1], 0),
                    "rows_out": rows_out.get(k.split("=", 1)[1], 0),
                    "wall_ms": wall,
                    "lineage": lineage,
                    "output_snapshot_id": out_path,
                }
                for k in keys
            ]
        )
        return len(keys)

    # -- stages --------------------------------------------------------------
    ALL_STAGES = ("hourly", "daily", "monthly", "gapfill", "compress")

    def run(
        self, t0: DataFrame, run_id: str | None = None, stages=None
    ) -> dict:
        """Run the batch job. `stages` limits execution to a prefix of
        ALL_STAGES (used by tests to simulate a kill between stages; a later
        run resumes from the manifest)."""
        stages = tuple(stages or self.ALL_STAGES)
        run_id = run_id or new_run_id()
        t0 = dedup_turns(mask_valid(t0))
        t0 = t0.withColumn("bucket_date", F.to_date("ts"))
        done = {}

        # 1. raw -> hourly, keyed by day
        day_keys = t0.select(
            F.concat(F.lit("day="), F.col("bucket_date").cast("string")).alias(
                "partition_key"
            )
        ).distinct()

        def build_hourly(keys):
            days = [k.split("=", 1)[1] for k in keys]
            inp = t0.filter(F.col("bucket_date").cast("string").isin(days))
            roll = (
                rollup_hourly_salted(inp, self.n_salts)
                if self.salted
                else rollup_hourly(inp)
            )
            out = roll.withColumns(
                {
                    "bucket_date": F.to_date("bucket_start"),
                    "conv_bucket": _conv_bucket(),
                }
            )
            return (
                inp,
                out,
                F.col("bucket_date").cast("string"),
                F.col("bucket_date").cast("string"),
            )

        done["hourly"] = self._run_stage(
            "hourly", run_id, day_keys, build_hourly,
            self.tier_path("hourly"), ["bucket_date"], "raw",
        )
        if "daily" not in stages:
            return {"run_id": run_id, "stages": done}

        # 2. hourly -> daily, keyed by day
        hourly = self.read_tier("hourly")
        daily_keys = hourly.select(
            F.concat(F.lit("day="), F.col("bucket_date").cast("string")).alias(
                "partition_key"
            )
        ).distinct()

        def build_daily(keys):
            days = [k.split("=", 1)[1] for k in keys]
            inp = hourly.filter(F.col("bucket_date").cast("string").isin(days))
            out = rollup_up(inp, "daily").withColumns(
                {
                    "bucket_date": F.to_date("bucket_start"),
                    "conv_bucket": _conv_bucket(),
                }
            )
            key = F.col("bucket_date").cast("string")
            return inp, out, key, key

        done["daily"] = self._run_stage(
            "daily", run_id, daily_keys, build_daily,
            self.tier_path("daily"), ["bucket_date"], "hourly",
        )
        if "monthly" not in stages:
            return {"run_id": run_id, "stages": done}

        # 3. daily -> monthly, keyed by month
        daily = self.read_tier("daily")
        month_of = F.date_format("bucket_start", "yyyy-MM")
        month_keys = daily.select(
            F.concat(F.lit("month="), month_of).alias("partition_key")
        ).distinct()

        def build_monthly(keys):
            months = [k.split("=", 1)[1] for k in keys]
            inp = daily.filter(month_of.isin(months))
            out = rollup_up(inp, "monthly").withColumns(
                {
                    "bucket_month": F.date_format("bucket_start", "yyyy-MM"),
                    "conv_bucket": _conv_bucket(),
                }
            )
            return inp, out, month_of, F.col("bucket_month")

        done["monthly"] = self._run_stage(
            "monthly", run_id, month_keys, build_monthly,
            self.tier_path("monthly"), ["bucket_month"], "daily",
        )
        if "gapfill" not in stages:
            return {"run_id": run_id, "stages": done}

        # 4. gap-fill, keyed by conv_bucket (series must stay whole)
        hourly = self.read_tier("hourly")
        cb_keys = hourly.select(
            F.concat(F.lit("cb="), F.col("conv_bucket").cast("string")).alias(
                "partition_key"
            )
        ).distinct()

        def build_gapfill(keys):
            cbs = [int(k.split("=", 1)[1]) for k in keys]
            inp = hourly.filter(F.col("conv_bucket").isin(cbs))
            series = hourly_series(inp)
            out = gapfill(series, self.fill_method).withColumn(
                "conv_bucket", _conv_bucket()
            )
            return inp, out, F.col("conv_bucket").cast("string"), F.col(
                "conv_bucket"
            ).cast("string")

        done["gapfill"] = self._run_stage(
            "gapfill", run_id, cb_keys, build_gapfill,
            self.gapfill_path, ["conv_bucket"], "hourly",
        )
        if "compress" not in stages:
            return {"run_id": run_id, "stages": done}

        # 5. compress hourly series into chunk blobs, keyed by conv_bucket
        def build_compress(keys):
            cbs = [int(k.split("=", 1)[1]) for k in keys]
            inp = hourly.filter(F.col("conv_bucket").isin(cbs))
            out = make_chunks(hourly_series(inp), tier="hourly").withColumn(
                "conv_bucket", _conv_bucket()
            )
            return inp, out, F.col("conv_bucket").cast("string"), F.col(
                "conv_bucket"
            ).cast("string")

        done["compress"] = self._run_stage(
            "compress", run_id, cb_keys, build_compress,
            self.chunks_path, ["conv_bucket"], "hourly",
        )

        return {"run_id": run_id, "stages": done}

    # -- EP3: SQL over continuous aggregates ---------------------------------
    def register_views(self):
        for tier in ("hourly", "daily", "monthly"):
            path = self.tier_path(tier)
            if os.path.exists(path):
                tier_view(self.spark.read.parquet(path), tier).createOrReplaceTempView(
                    f"tiers_{tier}"
                )
