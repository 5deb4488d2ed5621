"""Bucketed tier storage (SURVEY.md §2 L5 scale path).

Hash-bucketed, sort-ordered persistent tables so that every downstream
join / aggregation keyed on ``conv_id`` is CO-LOCATED: Spark's bucketed
scan reports the bucket spec as its output partitioning, so joins between
two tables bucketed the same way, and groupBys on the bucket key, run with
ZERO exchanges — the shuffle was paid once at write time and amortized
over every subsequent query. This is the cluster-scale materialization of
the repartition strategy in engine/skew.py: at 100 TB the hourly tier is
read by the daily roll-up, the gap-filler, the chunk compressor and
ad-hoc queries, and bucketing removes the conv_id shuffle from all of
them.

Mechanics: ``DataFrameWriter.bucketBy(n, key).sortBy(key, ...)`` requires
``saveAsTable`` (bucket metadata lives in the session catalog, parquet
files on disk). ``spark.sql.sources.bucketing.enabled`` is on by default;
reads of a bucketed table expose ``HashPartitioning(key, n)`` and
in-bucket sort order, which the planner uses to elide Exchange (and, when
sortBy matches the join key, Sort) operators. The bucket COUNT must match
on both sides of a join (or be a multiple with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

The same physical layout maps 1:1 onto Iceberg's ``bucket(N, conv_id)``
hidden partition transform via the io.tier_backend seam when a catalog is
configured (SURVEY.md §7.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "bucket_start"),
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed parquet table in the session
    catalog. One shuffle now; none later for conv_id-keyed work."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket spec, so
    downstream joins/aggs on the bucket key plan without an Exchange."""
    return spark.table(table)


def cogroup_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket counts and a
    join key prefixed by the bucket column, the executed plan contains no
    Exchange on either side (asserted by tests/test_bucketed.py)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on
    )
