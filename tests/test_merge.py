"""MERGE INTO (engine/merge.py): Iceberg-semantics upsert/delete apply —
touched-partitions-only rewrites, cross-partition key moves, emptied-
partition drops, cardinality refusal, snapshot atomicity."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.merge import MergeError, merge_into  # noqa: E402
from engine.snapstore import SnapshotError, SnapStore  # noqa: E402

SCHEMA = "k int, day string, val string"

BASE = [
    (1, "d1", "a"),
    (2, "d1", "b"),
    (3, "d2", "c"),
    (4, "d3", "d"),   # d3's only row; its partition must never rewrite below
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _write_base(spark, path):
    _mk(spark, BASE).write.partitionBy("day").parquet(path)


def _rows(spark, path):
    return {
        tuple(r) for r in spark.read.parquet(path)
        .select("k", "day", "val").collect()
    }


def test_upsert_update_insert_and_move(spark, tmp_path):
    path = str(tmp_path / "t1")
    _write_base(spark, path)
    source = _mk(
        spark,
        [
            (2, "d1", "B2"),   # in-place update
            (3, "d4", "C4"),   # update MOVING partitions d2 -> d4
            (9, "d5", "new"),  # insert into a brand-new partition
        ],
    )
    d3_dir = os.path.join(path, "day=d3")
    mtime = max(os.path.getmtime(os.path.join(d3_dir, f)) for f in os.listdir(d3_dir))
    stats = merge_into(
        spark, path, source, on=["k"], partition_cols=["day"]
    )
    assert stats["inserted"] == 1 and stats["updated"] == 2 and stats["deleted"] == 0
    assert _rows(spark, path) == {
        (1, "d1", "a"),
        (2, "d1", "B2"),
        (3, "d4", "C4"),
        (4, "d3", "d"),
        (9, "d5", "new"),
    }
    # the move emptied d2 -> its directory is gone, not a zombie copy
    assert not os.path.exists(os.path.join(path, "day=d2"))
    # untouched partition d3 was neither read-rewritten nor dropped
    assert max(
        os.path.getmtime(os.path.join(d3_dir, f)) for f in os.listdir(d3_dir)
    ) == mtime
    assert "day=d3" not in stats["partitions"]


def test_delete_clause_and_emptied_partition(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_base(spark, path)
    stats = merge_into(
        spark, path,
        _mk(spark, [(4, "d3", "x"), (1, "d1", "x")]),
        on=["k"], partition_cols=["day"],
        when_matched="delete", when_not_matched="ignore",
    )
    assert stats["deleted"] == 2 and stats["inserted"] == 0
    assert _rows(spark, path) == {(2, "d1", "b"), (3, "d2", "c")}
    assert not os.path.exists(os.path.join(path, "day=d3"))


def test_ignore_unmatched_updates_only(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write_base(spark, path)
    stats = merge_into(
        spark, path,
        _mk(spark, [(1, "d1", "A"), (42, "d9", "ghost")]),
        on=["k"], partition_cols=["day"], when_not_matched="ignore",
    )
    assert stats["updated"] == 1 and stats["inserted"] == 0
    rows = _rows(spark, path)
    assert (1, "d1", "A") in rows and not any(k == 42 for k, _, _ in rows)


def test_duplicate_source_keys_refused(spark, tmp_path):
    path = str(tmp_path / "t4")
    _write_base(spark, path)
    with pytest.raises(MergeError, match="multiple rows"):
        merge_into(
            spark, path,
            _mk(spark, [(1, "d1", "x"), (1, "d1", "y")]),
            on=["k"], partition_cols=["day"],
        )


def test_bad_clauses_and_schema_refused(spark, tmp_path):
    path = str(tmp_path / "t5")
    _write_base(spark, path)
    src = _mk(spark, [(1, "d1", "x")])
    with pytest.raises(MergeError, match="contradictory"):
        merge_into(
            spark, path, src, on=["k"], partition_cols=["day"],
            when_matched="delete", when_not_matched="insert",
        )
    with pytest.raises(MergeError, match="missing target columns"):
        merge_into(
            spark, path, src.drop("val"), on=["k"], partition_cols=["day"]
        )


def test_snapshot_merge_is_atomic_and_time_travelable(spark, tmp_path):
    store = SnapStore(str(tmp_path / "t6"))
    sid0 = store.begin("write")
    (
        _mk(spark, BASE)
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .mode("overwrite")
        .parquet(store.snapshot_path(sid0))
    )
    store.publish(sid0)

    stats = merge_into(
        spark, str(tmp_path / "t6"),
        _mk(spark, [(3, "d4", "C4"), (9, "d5", "new")]),
        on=["k"], partition_cols=["day"], store=store,
    )
    assert stats["updated"] == 1 and stats["inserted"] == 1
    cur = {
        tuple(r)
        for r in store.read(spark).select("k", "day", "val").collect()
    }
    assert (3, "d4", "C4") in cur and (9, "d5", "new") in cur
    # pre-merge snapshot intact (time travel), exactly one new snapshot
    old = {
        tuple(r)
        for r in store.read(spark, as_of=sid0)
        .select("k", "day", "val").collect()
    }
    assert old == {tuple(r) for r in BASE}
    assert len(store.snapshot_ids()) == 2


def test_merge_parity_against_full_outer_reference(spark, tmp_path):
    """Property: upsert == full-outer reference on a synth tier table
    partitioned by day, with moves, inserts and untouched days."""
    from engine.rollup import build_tiers
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=15, hot_turns=120)
    hourly = (
        build_tiers(t0)["hourly"]
        .withColumn("day", F.to_date("bucket_start").cast("string"))
        .select("conv_id", "bucket_start", "day", "n_turns", "token_sum")
    )
    path = str(tmp_path / "t7")
    hourly.write.partitionBy("day").parquet(path)
    target = spark.read.parquet(path)
    # deterministic CDC batch: bump every 7th row's counters, move its day
    h = F.abs(F.xxhash64("conv_id", "bucket_start"))
    src = (
        target.filter(h % 7 == 0)
        .withColumn("n_turns", F.col("n_turns") + 100)
        .withColumn(
            "day",
            F.when(h % 3 == 0, F.lit("2099-01-01")).otherwise(F.col("day")),
        )
        .localCheckpoint()
    )
    expect = {
        tuple(r)
        for r in target.join(src, ["conv_id", "bucket_start"], "left_anti")
        .unionByName(src)
        .select("conv_id", "bucket_start", "day", "n_turns", "token_sum")
        .collect()
    }
    merge_into(
        spark, path, src,
        on=["conv_id", "bucket_start"], partition_cols=["day"],
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(path)
        .select("conv_id", "bucket_start", "day", "n_turns", "token_sum")
        .collect()
    }
    assert got == expect
