"""Chunk round-trip verification on Spark (SURVEY.md §5.3 / K5):
decode(encode(series)) == series bit-exactly, and the per-turn text-equality
invariant under stable (conv_id, turn_idx) ordering (BASELINE.json:15)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.codec.chunks import compression_stats, decode_chunks, make_chunks  # noqa: E402
from engine.gapfill import hourly_series  # noqa: E402
from engine.rollup import rollup_hourly  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=80, hot_turns=400)
    df.cache().count()
    return df


def test_series_roundtrip_bitexact(spark, t0):
    series = hourly_series(rollup_hourly(t0))
    chunks = make_chunks(series, tier="hourly", chunk_unit="month")
    decoded, bad = decode_chunks(chunks)
    assert bad.count() == 0
    dec = decoded.select("conv_id", "metric", "bucket_start", "value")
    src = series.select("conv_id", "metric", "bucket_start", "value")
    # bit-exact both directions (exceptAll treats NaN=NaN, exact doubles)
    assert dec.exceptAll(src).count() == 0
    assert src.exceptAll(dec).count() == 0


def test_chunk_metadata(spark, t0):
    series = hourly_series(rollup_hourly(t0), metrics=["turn_rate"])
    chunks = make_chunks(series, tier="hourly", chunk_unit="month")
    pdf = chunks.toPandas()
    assert (pdf["n_points"] >= 1).all()
    assert (pdf["chunk_end"] >= pdf["chunk_start"]).all()
    assert pdf["ts_blob"].map(len).gt(0).all()
    # chunk count == distinct (conv, metric, month)
    n_expected = (
        series.select(
            "conv_id", "metric", F.date_trunc("month", "bucket_start")
        )
        .distinct()
        .count()
    )
    assert len(pdf) == n_expected


def test_compression_beats_raw(spark, t0):
    series = hourly_series(rollup_hourly(t0))
    stats = compression_stats(
        make_chunks(series, tier="hourly", chunk_unit="month")
    ).toPandas()
    # raw = 16 bytes/point (ts int64 + value float64); codec must beat it
    assert (stats["bytes_per_point"] < 16).all(), stats


def test_per_turn_text_equality_after_roundtrip(spark, t0):
    """BASELINE.json:15: per-turn text equality under stable (conv_id,
    turn_idx) ordering after decompression round-trips. The turn-level
    series (ts, token_count) goes through the codecs; every decoded point
    must map back to exactly one T0 turn with identical text."""
    turns = t0.select(
        "conv_id",
        F.lit("token_count").alias("metric"),
        F.col("ts").alias("bucket_start"),
        F.length("text").cast("double").alias("value"),
        "turn_idx",
        "text",
    )
    series = turns.select("conv_id", "metric", "bucket_start", "value")
    decoded, bad = decode_chunks(make_chunks(series, tier="raw", chunk_unit="month"))
    assert bad.count() == 0

    joined = turns.alias("o").join(
        decoded.alias("d"),
        (F.col("o.conv_id") == F.col("d.conv_id"))
        & (F.col("o.bucket_start") == F.col("d.bucket_start"))
        & (F.col("o.value") == F.col("d.value")),
        "inner",
    )
    n_turns = t0.count()
    assert joined.count() == n_turns  # every turn round-tripped

    orig = [
        (r.conv_id, r.turn_idx, r.text)
        for r in t0.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    after = [
        (r.conv_id, r.turn_idx, r.text)
        for r in joined.select("o.conv_id", "o.turn_idx", "o.text")
        .orderBy("o.conv_id", "o.turn_idx")
        .collect()
    ]
    assert orig == after


# -- io backend seam (SURVEY §7.1): branch selection is config-driven --------


def test_tier_backend_selection(spark):
    from engine.io import iceberg_catalog, table_identifier, tier_backend

    # sandbox session: no catalog configured -> parquet path passthrough
    assert iceberg_catalog(spark) is None
    assert tier_backend(spark, "/data/tiers/hourly") == (
        "parquet",
        "/data/tiers/hourly",
    )
    # a configured spark.sql.catalog.<name> flips the seam to Iceberg
    conf = [
        ("spark.app.name", "x"),
        ("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog"),
        ("spark.sql.catalog.lake.type", "rest"),
    ]
    assert iceberg_catalog(spark, _conf_items=conf) == "lake"
    assert tier_backend(spark, "/data/tiers/hourly", _conf_items=conf) == (
        "iceberg",
        "lake.tiers.hourly",
    )
    assert table_identifier("lake", "s3://bkt/t/monthly/") == "lake.tiers.monthly"
