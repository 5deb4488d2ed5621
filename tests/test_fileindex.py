"""File-skipping index (engine/fileindex.py): per-file min/max + Bloom.

The contract under test: zero false negatives ever (candidates ⊇ the true
file set, point reads are exact), pruning is real (candidates ≪ files for
a clustered table), maintenance is incremental (only new/rewritten files
re-index; vanished files drop) and an incremental index is bit-exact equal
to a full rebuild.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from engine.fileindex import FileIndex, _md5_pos_expr, _md5_pos_py
from engine.synth import synth_transcripts


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """Multi-file, day-partitioned transcript table, conv-clustered files
    (repartition by conv_id → each conv lands in one file per day)."""
    root = str(tmp_path_factory.mktemp("fi") / "turns")
    df = synth_transcripts(spark, n_convs=60, hot_turns=200).withColumn(
        "day", F.to_date("ts").cast("string")
    )
    df.repartition(4, "conv_id").write.partitionBy("day").parquet(root)
    return root


def _truth_files(spark, root, key, value):
    rows = (
        spark.read.option("basePath", root)
        .parquet(root)
        .filter(F.col(key) == value)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    out = set()
    for (f,) in rows:
        p = f.replace("file://", "").replace("file:", "")
        out.add(os.path.relpath(p, root))
    return out


def test_md5_position_parity(spark):
    """The Python bit-position replay matches the Spark expression exactly
    — the property that makes driver-side lookup possible."""
    vals = ["c-000017", "", "x#y", "日本語", "0", "42"]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    for seed in range(5):
        got = [
            r[0]
            for r in df.select(_md5_pos_expr("k", seed, 1 << 17)).collect()
        ]
        assert got == [_md5_pos_py(v, seed, 1 << 17) for v in vals]
    # integral keys hash via their canonical string form on both sides
    dfi = spark.createDataFrame([(7,), (123456789,)], "k long")
    got = [r[0] for r in dfi.select(_md5_pos_expr("k", 3, 4096)).collect()]
    assert got == [_md5_pos_py(7, 3, 4096), _md5_pos_py(123456789, 3, 4096)]


def test_point_parity_pruning_no_false_negatives(spark, table, tmp_path):
    idx = FileIndex(spark, table, str(tmp_path / "idx"), key="conv_id")
    st = idx.refresh()
    assert st["indexed"] > 0 and st["reused"] == 0
    total_files = idx.stats()["files"]
    assert total_files > 8  # genuinely multi-file

    full = spark.read.parquet(table)
    convs = [r[0] for r in full.select("conv_id").distinct().limit(10).collect()]
    pruned_any = False
    for c in convs:
        truth = _truth_files(spark, table, "conv_id", c)
        cands = set(idx.candidates(c))
        assert truth <= cands, f"false negative for {c}"
        got = sorted(map(tuple, idx.read_point(c).collect()))
        want = sorted(map(tuple, full.filter(F.col("conv_id") == c).collect()))
        assert got == want
        pruned_any |= len(cands) < total_files
    assert pruned_any  # conv-clustered files → the index must skip files


def test_noop_then_incremental_equals_full_rebuild(spark, table, tmp_path):
    mut = str(tmp_path / "turns")
    shutil.copytree(table, mut)
    idx = FileIndex(spark, mut, str(tmp_path / "idx"), key="conv_id")
    first = idx.refresh()
    assert idx.refresh() == {"indexed": 0, "reused": first["indexed"], "removed": 0}

    # append a new day's files: only those index
    extra = (
        synth_transcripts(spark, n_convs=10, hot_turns=50)
        .withColumn("day", F.lit("2031-01-01"))
    )
    extra.repartition(2, "conv_id").write.partitionBy("day").mode("append").parquet(mut)
    inc = idx.refresh()
    assert inc["reused"] == first["indexed"] and inc["indexed"] > 0
    assert inc["removed"] == 0

    fresh = FileIndex(spark, mut, str(tmp_path / "idx2"), key="conv_id")
    fresh.refresh()
    a = idx._read_index_arrow().to_pandas().sort_values("file").reset_index(drop=True)
    b = fresh._read_index_arrow().to_pandas().sort_values("file").reset_index(drop=True)
    assert a.equals(b)  # incremental == full rebuild, bloom bytes included


def test_removed_files_drop_and_reads_stay_exact(spark, table, tmp_path):
    mut = str(tmp_path / "turns")
    shutil.copytree(table, mut)
    idx = FileIndex(spark, mut, str(tmp_path / "idx"), key="conv_id")
    n0 = idx.refresh()["indexed"]
    day = sorted(d for d in os.listdir(mut) if d.startswith("day="))[0]
    shutil.rmtree(os.path.join(mut, day))
    st = idx.refresh()
    assert st["removed"] > 0 and st["indexed"] == 0
    assert st["reused"] == n0 - st["removed"]
    full = spark.read.parquet(mut)
    c = full.select("conv_id").first()[0]
    for f in idx.candidates(c):
        assert not f.startswith(day)
    got = sorted(map(tuple, idx.read_point(c).collect()))
    want = sorted(map(tuple, full.filter(F.col("conv_id") == c).collect()))
    assert got == want


def test_spec_change_forces_full_rebuild(spark, table, tmp_path):
    p = str(tmp_path / "idx")
    FileIndex(spark, table, p, key="conv_id").refresh()
    idx2 = FileIndex(spark, table, p, key="conv_id", nbits=1 << 12)
    st = idx2.refresh()
    assert st["reused"] == 0 and st["indexed"] > 0
    c = spark.read.parquet(table).select("conv_id").first()[0]
    assert _truth_files(spark, table, "conv_id", c) <= set(idx2.candidates(c))


def test_tiny_bloom_false_positives_cost_io_not_answers(spark, table, tmp_path):
    """64-bit blooms saturate → many false-positive candidates, but the
    re-applied predicate keeps the answer exact."""
    idx = FileIndex(
        spark, table, str(tmp_path / "idx"), key="conv_id", nbits=64, nhashes=2
    )
    idx.refresh()
    full = spark.read.parquet(table)
    c = full.select("conv_id").distinct().orderBy("conv_id").first()[0]
    got = sorted(map(tuple, idx.read_point(c).collect()))
    want = sorted(map(tuple, full.filter(F.col("conv_id") == c).collect()))
    assert got == want


def test_missing_key_and_in_list(spark, table, tmp_path):
    idx = FileIndex(spark, table, str(tmp_path / "idx"), key="conv_id")
    idx.refresh()
    full = spark.read.parquet(table)
    miss = idx.read_point("no-such-conversation")
    assert miss.count() == 0 and miss.columns == full.columns

    convs = [r[0] for r in full.select("conv_id").distinct().limit(3).collect()]
    got = sorted(map(tuple, idx.read_points(convs).collect()))
    want = sorted(
        map(tuple, full.filter(F.col("conv_id").isin(convs)).collect())
    )
    assert got == want


def test_integer_key_minmax_pruning(spark, tmp_path):
    """Native-type min/max: integer keys must compare numerically (a string
    index would put 10 < 9 and prune wrongly)."""
    root = str(tmp_path / "ev")
    df = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("user_id"), F.col("id").alias("event_id")
    )
    df.repartition(8, "user_id").write.parquet(root)
    idx = FileIndex(spark, root, str(tmp_path / "idx"), key="user_id")
    idx.refresh()
    for u in (0, 9, 10, 499):
        got = sorted(map(tuple, idx.read_point(u).collect()))
        want = sorted(
            map(
                tuple,
                spark.read.parquet(root).filter(F.col("user_id") == u).collect(),
            )
        )
        assert got == want and len(got) == 10
    assert len(idx.candidates(9)) < idx.stats()["files"]


def test_engine_conversation_drilldown(spark, tmp_path):
    """Facade integration: eng.conversation() serves one conv's hourly
    series through the point index, exactly matching the tier filter; a
    second run's snapshot flip reuses unchanged partitions' index rows
    (hardlink identity survives the pointer advance)."""
    from engine.api import TierEngine
    from engine.rollup import observed_state

    eng = TierEngine(spark, str(tmp_path / "root"), snapshots=True, lease=False)
    t0 = synth_transcripts(spark, n_convs=40, hot_turns=150)
    eng.run(t0)
    conv = t0.select("conv_id").first()[0]
    got = sorted(map(tuple, eng.conversation(conv).collect()))
    want = sorted(
        map(
            tuple,
            eng.tier("hourly").filter(F.col("conv_id") == conv).collect(),
        )
    )
    assert got == want and got

    # a second batch (new day) flips the snapshot; refresh must reuse the
    # untouched partitions' rows and the drill-down stays exact
    idx0 = eng.point_index()
    idx0.refresh()
    extra = synth_transcripts(spark, n_convs=6, hot_turns=60).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 400 DAYS")
    )
    eng.run(t0.unionByName(extra))
    idx1 = eng.point_index()
    st = idx1.refresh()
    assert st["reused"] > 0  # hardlinked old partitions kept their identity
    got2 = sorted(map(tuple, eng.conversation(conv, refresh=False).collect()))
    want2 = sorted(
        map(
            tuple,
            eng.tier("hourly").filter(F.col("conv_id") == conv).collect(),
        )
    )
    assert got2 == want2
    # pruning across the whole store: candidates ≪ files for a tail conv
    tail = extra.select("conv_id").first()[0]
    assert len(idx1.candidates(tail)) < idx1.stats()["files"]
