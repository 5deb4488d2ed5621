"""Persisted incremental document dedup index (engine/dedupindex.py):
after every batch ingest, pairs() and components() must equal the
full-rebuild MinHash-LSH pipeline bit-exactly — including the chain-rewire
case where a later doc lands between two earlier bucket members."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import io as eio  # noqa: E402
from engine.dedupindex import DocDedupIndex  # noqa: E402
from engine.graph import connected_components  # noqa: E402
from engine.textops import neardup_verified_pairs  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _pdf(df, keys):
    return (
        df.toPandas()
        .sort_values(list(keys), ignore_index=True)
        .reindex(sorted(df.columns), axis=1)
    )


@pytest.fixture(scope="module")
def docs(spark):
    df = eio.read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    df.cache().count()
    return df


def _assert_matches_rebuild(spark, idx, corpus):
    got_pairs = _pdf(idx.pairs(), ("doc_a", "doc_b"))
    want_pairs = _pdf(
        neardup_verified_pairs(spark, corpus).select("doc_a", "doc_b"),
        ("doc_a", "doc_b"),
    )
    pd.testing.assert_frame_equal(got_pairs, want_pairs)
    got_c = _pdf(idx.components(), ("node",))
    if len(want_pairs):
        want_c = _pdf(
            connected_components(
                neardup_verified_pairs(spark, corpus).select(
                    F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
                )
            ),
            ("node",),
        )
        pd.testing.assert_frame_equal(got_c, want_c)
    else:
        assert len(got_c) == 0


def test_incremental_matches_rebuild_after_every_batch(spark, docs, tmp_path):
    idx = DocDedupIndex(spark, str(tmp_path / "ix"))
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    step = (hi + 2) // 3
    acc = None
    for i in range(3):
        b = docs.filter(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        assert idx.ingest(b, f"b{i}")["ingested"]
        acc = b if acc is None else acc.unionByName(b)
        _assert_matches_rebuild(spark, idx, acc)


def test_chain_rewire_on_late_middle_doc(spark, tmp_path):
    """The candidate-deletion case: docs 10 and 30 are near-dups found at
    batch 1; doc 20 (between them by id) arrives later and rewires the
    bucket chain. The index must still equal a full rebuild — touched
    buckets are recomputed wholly, never appended."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    b1 = mk([(10, text), (30, text + " tailword")])
    b2 = mk([(20, text + " otherword")])
    idx = DocDedupIndex(spark, str(tmp_path / "rw"))
    assert idx.ingest(b1, "b1")["ingested"]
    _assert_matches_rebuild(spark, idx, b1)
    assert idx.ingest(b2, "b2")["ingested"]
    full = b1.unionByName(b2)
    _assert_matches_rebuild(spark, idx, full)
    # all three are one component labelled by the min id
    comp = {r["node"]: r["component_id"] for r in idx.components().collect()}
    assert comp == {10: 10, 20: 10, 30: 10}


def test_reingest_noop_and_shrinking_reroll(spark, docs, tmp_path):
    idx = DocDedupIndex(spark, str(tmp_path / "rr"))
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    b0 = docs.filter(F.col("doc_id") < hi // 2)
    b1 = docs.filter(F.col("doc_id") >= hi // 2)
    assert idx.ingest(b0, "b0")["ingested"]
    assert idx.ingest(b1, "b1")["ingested"]
    assert not idx.ingest(b0, "b0")["ingested"]
    assert not idx.ingest(b1, "b1")["ingested"]
    # re-roll b1 down to a subset: its removed docs' bucket contributions
    # (and any pairs they carried) must vanish from the index
    b1_small = b1.filter(F.col("doc_id") % 3 == 0)
    assert idx.ingest(b1_small, "b1")["ingested"]
    _assert_matches_rebuild(spark, idx, b0.unionByName(b1_small))


def test_rebuild_scan_is_partition_pruned(spark, docs, tmp_path):
    idx = DocDedupIndex(spark, str(tmp_path / "pp"))
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    idx.ingest(docs.filter(F.col("doc_id") < hi // 2), "b0")
    cond = (F.col("band") == 0) & (F.col("kb") == 3)
    plan = (
        idx._read("bands")
        .filter(cond)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "band" in plan and "kb" in plan


def test_streaming_ingest_maintains_index(spark, docs, tmp_path):
    """Index maintenance from a stream: each micro-batch trigger ingests
    its docs as one index batch (foreachBatch → DocDedupIndex.ingest); the
    final persisted state equals a full rebuild over everything streamed."""
    src = str(tmp_path / "src")
    # several files -> several triggers
    docs.repartitionByRange(6, "doc_id").write.parquet(src)
    idx = DocDedupIndex(spark, str(tmp_path / "stream-ix"))

    def each_batch(batch_df, batch_id):
        idx.ingest(batch_df, f"t{batch_id}")

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(each_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    _assert_matches_rebuild(spark, idx, docs)


def test_compact_preserves_answers_and_accepts_new_batches(spark, docs, tmp_path):
    """compact() merges the tokens/bands batch partitions into one base
    partition: pairs()/components() are bit-identical, unchanged re-ingests
    stay no-ops, a NEW batch on top of the base still equals a full
    rebuild, and a content re-roll of compacted history is refused."""
    idx = DocDedupIndex(spark, str(tmp_path / "cp"))
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    step = (hi + 2) // 3
    parts = [
        docs.filter(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        for i in range(3)
    ]
    assert idx.ingest(parts[0], "b0")["ingested"]
    assert idx.ingest(parts[1], "b1")["ingested"]
    before = _pdf(idx.pairs(), ("doc_a", "doc_b"))

    merged = idx.compact()
    assert merged["tokens"] == 2 and merged["bands"] == 2
    ts = idx._store("tokens")
    cur = ts.snapshot_path(ts.current_id())
    assert [d for d in os.listdir(cur) if d.startswith("batch=")] == [
        "batch=__base__"
    ]
    pd.testing.assert_frame_equal(_pdf(idx.pairs(), ("doc_a", "doc_b")), before)
    assert not idx.ingest(parts[0], "b0")["ingested"]

    assert idx.ingest(parts[2], "b2")["ingested"]
    _assert_matches_rebuild(
        spark, idx, parts[0].unionByName(parts[1]).unionByName(parts[2])
    )

    with pytest.raises(ValueError, match="compact"):
        idx.ingest(parts[0].limit(5), "b0")
    with pytest.raises(ValueError, match="reserved"):
        idx.ingest(parts[2], "__base__")
