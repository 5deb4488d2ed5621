"""Persisted benchmark-contamination index (engine/contamindex.py):
incremental == one-shot parity, fingerprint no-ops, batch re-rolls, and
benchmark-change staleness discipline."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from engine import io as eio
from engine.contamindex import ContamIndex
from engine.corpusops import MIN_SHARED, doc_gram_fps

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return eio.read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )


def _oneshot(docs, bench):
    """Reference: the one-shot contamination join over given frames."""
    c = doc_gram_fps(docs)
    b = doc_gram_fps(bench).select(F.col("doc_id").alias("bench_id"), "gfp")
    return (
        c.join(b, "gfp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )


def _key(pdf):
    return sorted(map(tuple, pdf[["doc_id", "bench_id", "n_shared"]].values))


def test_incremental_equals_oneshot(spark, tmp_path):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 11 == 0)
    corpus = d.filter(F.col("doc_id") % 11 != 0)
    idx = ContamIndex(spark, str(tmp_path / "ci"))
    assert idx.set_benchmark(bench)["updated"]
    mid = (corpus.agg(F.max("doc_id")).first()[0] + 1) // 2
    assert idx.ingest(corpus.filter(F.col("doc_id") < mid), "b0")["ingested"]
    assert idx.ingest(corpus.filter(F.col("doc_id") >= mid), "b1")["ingested"]
    assert _key(idx.hits().toPandas()) == _key(
        _oneshot(corpus, bench).toPandas()
    )


def test_unchanged_reoffer_is_noop(spark, tmp_path):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 11 == 0)
    corpus = d.filter(F.col("doc_id") % 11 != 0)
    idx = ContamIndex(spark, str(tmp_path / "ci"))
    idx.set_benchmark(bench)
    idx.ingest(corpus, "b0")
    tok = idx.bench_token()
    # same benchmark content -> no new snapshot, batches stay fresh
    assert not idx.set_benchmark(bench)["updated"]
    assert idx.bench_token() == tok
    assert not idx.ingest(corpus, "b0")["ingested"]
    assert idx.stale_batches() == []


def test_changed_batch_rerolls_its_partition(spark, tmp_path):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 11 == 0)
    corpus = d.filter(F.col("doc_id") % 11 != 0)
    idx = ContamIndex(spark, str(tmp_path / "ci"))
    idx.set_benchmark(bench)
    idx.ingest(corpus, "b0")
    # contaminate one corpus doc with a benchmark doc's text: the batch
    # fingerprint changes, the re-offer re-rolls, and the new hit appears
    bench_row = bench.orderBy("doc_id").first()
    victim = corpus.agg(F.min("doc_id")).first()[0]
    mutated = corpus.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.lit(bench_row["text"])).otherwise(
            F.col("text")
        ),
    )
    assert idx.ingest(mutated, "b0")["ingested"]
    got = _key(idx.hits().toPandas())
    assert got == _key(_oneshot(mutated, bench).toPandas())
    assert (victim, bench_row["doc_id"]) in {
        (a, b) for a, b, _ in got
    }


def test_benchmark_change_stales_then_heals(spark, tmp_path):
    d = _docs(spark)
    bench1 = d.filter(F.col("doc_id") % 11 == 0)
    bench2 = d.filter((F.col("doc_id") % 11 == 0) | (F.col("doc_id") % 7 == 0))
    corpus = d.filter((F.col("doc_id") % 11 != 0) & (F.col("doc_id") % 7 != 0))
    idx = ContamIndex(spark, str(tmp_path / "ci"))
    idx.set_benchmark(bench1)
    idx.ingest(corpus, "b0")
    assert idx.stale_batches() == []
    # grow the suite: committed batch is now pinned to the old benchmark
    assert idx.set_benchmark(bench2)["updated"]
    assert idx.stale_batches() == ["batch=b0"]
    with pytest.raises(ValueError, match="stale"):
        idx.hits()
    # allow_stale serves the old answer; re-ingest heals to the new one
    assert _key(idx.hits(allow_stale=True).toPandas()) == _key(
        _oneshot(corpus, bench1).toPandas()
    )
    assert idx.ingest(corpus, "b0")["ingested"]
    assert idx.stale_batches() == []
    assert _key(idx.hits().toPandas()) == _key(
        _oneshot(corpus, bench2).toPandas()
    )


def test_ingest_requires_benchmark(spark, tmp_path):
    idx = ContamIndex(spark, str(tmp_path / "ci"))
    with pytest.raises(ValueError, match="set_benchmark"):
        idx.ingest(_docs(spark), "b0")
