"""Persisted incremental similarity index (engine/simindex.py): the index
state after N incremental batch ingests must equal a full rebuild
BIT-EXACTLY, re-ingests must be fingerprint-gated no-ops, and searches over
the stored index must match the per-run-rebuild registered queries."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import io as eio  # noqa: E402
from engine.simindex import SimIndex  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _pdf(df, keys):
    return (
        df.toPandas()
        .sort_values(list(keys), ignore_index=True)
        .reindex(sorted(df.columns), axis=1)
    )


@pytest.fixture(scope="module")
def em(spark):
    df = eio.read_table(spark, SF_DIR, "embeddings")
    df.cache().count()
    return df


def _batches(em, n=3):
    """Deterministic contiguous vec_id ranges (batch 0 holds the lowest ids,
    so auto-built first_k centroids match a full-corpus build)."""
    hi = em.agg(F.max("vec_id")).first()[0] + 1
    step = (hi + n - 1) // n
    return [
        em.filter((F.col("vec_id") >= i * step) & (F.col("vec_id") < (i + 1) * step))
        for i in range(n)
    ]


def test_incremental_ingest_equals_full_rebuild(spark, em, tmp_path):
    inc = SimIndex(spark, str(tmp_path / "inc"))
    for i, b in enumerate(_batches(em)):
        assert inc.ingest(b, f"b{i}")["ingested"]
    full = SimIndex(spark, str(tmp_path / "full"))
    assert full.ingest(em, "all")["ingested"]

    for name, keys in (
        ("lsh_buckets", ("vec_id", "tbl")),
        ("inverted_lists", ("vec_id",)),
        ("verified_pairs", ("vec_a", "vec_b")),
    ):
        got = _pdf(getattr(inc, name)(), keys)
        want = _pdf(getattr(full, name)(), keys)
        pd.testing.assert_frame_equal(got, want), name

    q = F.col("vec_id") < 10
    pd.testing.assert_frame_equal(
        _pdf(inc.ivf_topk(q), ("qid", "rn")), _pdf(full.ivf_topk(q), ("qid", "rn"))
    )


def test_index_searches_match_registered_queries(spark, em, tmp_path):
    """The stored-index answers equal the per-run-rebuild driver queries:
    verified_pairs == embedding_neardup_pairs, ivf_topk == ivf_cosine_topk
    (both oracle-hash-checked queries), so index persistence changes WHERE
    the work happens, never the answers."""
    import __spark_entry__ as entrymod

    idx = SimIndex(spark, str(tmp_path / "ix"))
    for i, b in enumerate(_batches(em)):
        idx.ingest(b, f"b{i}")

    pairs = _pdf(idx.verified_pairs(), ("vec_a", "vec_b"))
    ref_pairs = _pdf(
        entrymod.queries()["embedding_neardup_pairs"](spark, SF_DIR),
        ("vec_a", "vec_b"),
    )
    pd.testing.assert_frame_equal(pairs, ref_pairs)

    topk = _pdf(idx.ivf_topk(F.col("vec_id") < 10), ("qid", "rn"))
    ref_topk = _pdf(
        entrymod.queries()["ivf_cosine_topk"](spark, SF_DIR), ("qid", "rn")
    )
    pd.testing.assert_frame_equal(topk, ref_topk)


def test_reingest_is_noop_and_changed_batch_rerolls(spark, em, tmp_path):
    idx = SimIndex(spark, str(tmp_path / "re"))
    b0, b1, _ = _batches(em)
    assert idx.ingest(b0, "b0")["ingested"]
    assert idx.ingest(b1, "b1")["ingested"]
    before = _pdf(idx.lsh_buckets(), ("vec_id", "tbl"))
    # unchanged batch: fingerprint match, nothing rewritten
    assert not idx.ingest(b0, "b0")["ingested"]
    assert not idx.ingest(b1, "b1")["ingested"]
    pd.testing.assert_frame_equal(_pdf(idx.lsh_buckets(), ("vec_id", "tbl")), before)
    # changed batch content: that batch re-rolls, and its OLD rows are gone
    # (drop-first inside the snapshot commit — dynamic overwrite alone would
    # leave rows in bucket partitions the new content no longer touches)
    b0_small = b0.filter(F.col("vec_id") % 2 == 0)
    assert idx.ingest(b0_small, "b0")["ingested"]
    after = idx.lsh_buckets()
    b0_hi = b0.agg(F.max("vec_id")).first()[0]
    odd_in_b0 = after.filter(
        (F.col("vec_id") <= b0_hi) & (F.col("vec_id") % 2 == 1)
    ).count()
    assert odd_in_b0 == 0
    assert after.count() < len(before)


def test_centroid_retrain_invalidates_batches(spark, em, tmp_path):
    idx = SimIndex(spark, str(tmp_path / "rt"))
    b0, b1, _ = _batches(em)
    idx.ingest(b0, "b0")
    idx.ingest(b1, "b1")
    lists_before = _pdf(idx.inverted_lists(), ("vec_id",))
    tok_before = idx.centroid_token()
    idx.build_centroids(em, mode="kmeans")
    assert idx.centroid_token() != tok_before
    # every batch is pending again; re-ingest re-assigns
    assert idx.ingest(b0, "b0")["ingested"]
    assert idx.ingest(b1, "b1")["ingested"]
    lists_after = _pdf(idx.inverted_lists(), ("vec_id",))
    assert set(lists_after["vec_id"]) == set(lists_before["vec_id"])
    assert not lists_after.equals(lists_before)  # kmeans moved assignments
    # lsh state is centroid-independent: byte-identical after the re-roll
    # (rewritten, same rows)
    # and a further unchanged re-ingest is a no-op again
    assert not idx.ingest(b0, "b0")["ingested"]


def test_refresh_scan_is_partition_pruned(spark, em, tmp_path):
    """Scale evidence: the new-vs-stored candidate join filters the stored
    LSH scan by its partition columns via dynamic partition pruning (the
    broadcast side seeds the pruning subquery), so a refresh reads only
    colliding bucket directories, not the whole index."""
    idx = SimIndex(spark, str(tmp_path / "pp"))
    b0, b1, _ = _batches(em)
    idx.ingest(b0, "b0")
    from engine.simsearch import lsh_table_buckets

    stored = idx._read("lsh").filter(F.col("batch") != "b1")
    nb = F.broadcast(
        lsh_table_buckets(b1, idx.n_tables, idx.planes_per_table).select(
            F.col("vec_id").alias("nid"), "tbl", "bucket"
        )
    )
    j = stored.join(nb, ["tbl", "bucket"]).filter(F.col("vec_id") != F.col("nid"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]
    assert "PartitionFilters" in plan


def test_stream_ingest_equals_rebuild(spark, em, tmp_path):
    """Structured-Streaming index maintenance (engine/streaming.py
    run_stream_into_simindex): embeddings arriving as micro-batch files
    (one file per trigger) leave the persisted index bit-identical to a
    one-shot full rebuild — same LSH buckets, IVF lists, and verified
    pairs (modulo which batch partition emitted them)."""
    from engine.streaming import run_stream_into_simindex

    src = str(tmp_path / "src")
    batches = _batches(em)
    # one parquet FILE per batch => one micro-batch per trigger; file names
    # carry the batch order so trigger order matches vec_id order (the
    # auto-centroid build must see the lowest ids first, like _batches)
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(src)

    stream_idx = SimIndex(spark, str(tmp_path / "sidx"))
    res = run_stream_into_simindex(spark, src, stream_idx)
    assert res["batches"] >= 1

    full = SimIndex(spark, str(tmp_path / "full"))
    assert full.ingest(em, "all")["ingested"]

    for name, keys in (
        ("lsh_buckets", ("vec_id", "tbl")),
        ("inverted_lists", ("vec_id",)),
        ("verified_pairs", ("vec_a", "vec_b")),
    ):
        got = _pdf(getattr(stream_idx, name)(), keys)
        want = _pdf(getattr(full, name)(), keys)
        pd.testing.assert_frame_equal(got, want), name


def test_compact_preserves_answers_and_accepts_new_batches(spark, em, tmp_path):
    """compact() merges per-batch partitions into one base partition: every
    read answers bit-identically, unchanged re-ingests stay no-ops, a NEW
    batch on top of the base still equals a full rebuild, and a content
    re-roll of compacted history is refused instead of corrupting state."""
    b0, b1, b2 = _batches(em)
    idx = SimIndex(spark, str(tmp_path / "cp"))
    assert idx.ingest(b0, "b0")["ingested"]
    assert idx.ingest(b1, "b1")["ingested"]
    before_pairs = _pdf(idx.verified_pairs(), ("vec_a", "vec_b"))
    before_topk = _pdf(idx.ivf_topk(F.col("vec_id") < 10), ("qid", "rn"))

    merged = idx.compact()
    assert merged["lsh"] == 2 and merged["vectors"] == 2
    vs = idx._store("vectors")
    cur = vs.snapshot_path(vs.current_id())
    assert [d for d in os.listdir(cur) if d.startswith("batch=")] == [
        "batch=__base__"
    ]

    pd.testing.assert_frame_equal(
        _pdf(idx.verified_pairs(), ("vec_a", "vec_b")), before_pairs
    )
    pd.testing.assert_frame_equal(
        _pdf(idx.ivf_topk(F.col("vec_id") < 10), ("qid", "rn")), before_topk
    )
    # fingerprints survive compaction: unchanged re-ingest is still a no-op
    assert not idx.ingest(b0, "b0")["ingested"]

    # incremental contract is compaction-invisible: base + new batch ==
    # one-shot full rebuild, bit-exact
    assert idx.ingest(b2, "b2")["ingested"]
    full = SimIndex(spark, str(tmp_path / "cpfull"))
    assert full.ingest(em, "all")["ingested"]
    for name, keys in (
        ("lsh_buckets", ("vec_id", "tbl")),
        ("inverted_lists", ("vec_id",)),
        ("verified_pairs", ("vec_a", "vec_b")),
    ):
        pd.testing.assert_frame_equal(
            _pdf(getattr(idx, name)(), keys), _pdf(getattr(full, name)(), keys)
        )

    # content re-roll of a compacted batch: refused, state untouched
    with pytest.raises(ValueError, match="compact"):
        idx.ingest(b0.filter(F.col("vec_id") % 2 == 0), "b0")
    # the reserved merge id is not a valid user batch
    with pytest.raises(ValueError, match="reserved"):
        idx.ingest(b2, "__base__")
