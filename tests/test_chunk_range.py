"""Pruned chunk-range read (round-4 session 8): read_chunk_range must
(1) equal full-decode-then-clip bit-exactly, (2) prune blobs BEFORE the
Python decode boundary, and (3) push the span predicate into the parquet
scan of a written T4 table so row-group stats skip non-overlapping chunks.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.codec.chunks import (  # noqa: E402
    decode_chunks,
    make_chunks,
    read_chunk_range,
)
from engine.synth import synth_transcripts  # noqa: E402

LO, HI = "2026-01-03 00:00:00", "2026-01-05 00:00:00"


@pytest.fixture(scope="module")
def chunk_table(spark, tmp_path_factory):
    t0 = synth_transcripts(spark, n_convs=30, hot_turns=200)
    series = (
        t0.groupBy(
            "conv_id",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_start"),
        )
        .agg(F.count("*").cast("double").alias("value"))
        .withColumn("metric", F.lit("n_turns"))
    )
    path = str(tmp_path_factory.mktemp("t4") / "chunks")
    make_chunks(series, tier="hourly", chunk_unit="day").write.parquet(path)
    return spark.read.parquet(path)


def _sorted(df):
    return df.orderBy("conv_id", "metric", "bucket_start").collect()


def test_range_read_equals_decode_then_clip(spark, chunk_table):
    full, _ = decode_chunks(chunk_table)
    expected = full.filter(
        (F.col("bucket_start") >= F.lit(LO).cast("timestamp_ntz"))
        & (F.col("bucket_start") < F.lit(HI).cast("timestamp_ntz"))
    )
    got, bad = read_chunk_range(chunk_table, LO, HI)
    assert bad.count() == 0
    rows_e, rows_g = _sorted(expected), _sorted(got)
    assert len(rows_e) > 0, "fixture must overlap the query range"
    assert rows_g == rows_e


def test_prunes_before_decode(spark, chunk_table):
    lo = F.lit(LO).cast("timestamp_ntz")
    hi = F.lit(HI).cast("timestamp_ntz")
    total = chunk_table.count()
    overlapping = chunk_table.filter(
        (F.col("chunk_end") >= lo) & (F.col("chunk_start") < hi)
    ).count()
    assert 0 < overlapping < total, (
        "fixture must span more days than the query window"
    )


def test_span_predicate_reaches_the_scan(spark, chunk_table):
    got, _ = read_chunk_range(chunk_table, LO, HI)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the chunk-boundary predicates must appear among the pushed filters
    # (row-group stats answer them), not only as a post-scan Filter
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ][0]
    assert "chunk_end" in pushed and "chunk_start" in pushed


def test_boundary_semantics(spark, chunk_table):
    got, _ = read_chunk_range(chunk_table, LO, HI)
    mm = got.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    ).first()
    assert str(mm["lo"]) >= LO
    assert str(mm["hi"]) < HI
