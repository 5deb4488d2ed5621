"""Shard-export sink (engine/shardsink.py): plan parity with the
single-reducer oracle shape, balance bounds, deterministic re-export,
manifest verification and tamper detection."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from engine import io as eio
from engine.shardsink import (
    export_shards,
    read_manifest,
    shard_plan,
    verify_shards,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 1000


def _docs(spark):
    return eio.read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_shard_plan_matches_bruteforce(spark):
    """The two-phase distributed prefix sum equals the literal running sum
    in (hash, doc_id) order."""
    from engine.corpusops import portable_hash60

    d = _docs(spark)
    rows = (
        d.select(
            "doc_id",
            portable_hash60(F.col("doc_id")).alias("h"),
            F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
            .cast("long")
            .alias("n_tok"),
        )
        .collect()
    )
    cum = 0
    exp = {}
    for r in sorted(rows, key=lambda r: (r["h"], r["doc_id"])):
        cum += r["n_tok"]
        exp[r["doc_id"]] = (r["n_tok"], cum, (cum - 1) // BUDGET)
    got = {
        r["doc_id"]: (r["n_tok"], r["cum_tokens"], r["shard"])
        for r in shard_plan(d, BUDGET).collect()
    }
    assert got == exp


def test_shard_plan_no_single_partition(spark):
    p = (
        shard_plan(_docs(spark), BUDGET)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in p, p


def test_shard_balance_bounds(spark):
    """Every shard except the last holds budget ± max_doc_tokens tokens —
    the boundary doc lands wholly in one shard, nothing else drifts."""
    plan = shard_plan(_docs(spark), BUDGET).collect()
    max_doc = max(r["n_tok"] for r in plan)
    per = {}
    for r in plan:
        per[r["shard"]] = per.get(r["shard"], 0) + r["n_tok"]
    last = max(per)
    assert len(per) > 2, "budget too large for fixture — weak test"
    for s, tok in per.items():
        if s != last:
            assert abs(tok - BUDGET) < max_doc, (s, tok)
        assert sorted(per) == list(range(last + 1)), "gap in shard ids"


def test_export_verify_and_determinism(spark, tmp_path):
    d = _docs(spark)
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = export_shards(d, out1, BUDGET)
    m2 = export_shards(d.repartition(16), out2, BUDGET)
    assert m1 == m2, "export is not deterministic under repartitioning"
    ok, msg = verify_shards(spark, out1)
    assert ok, msg
    assert m1["total_docs"] == d.count()
    assert read_manifest(out1) == m1


def test_verify_detects_tampering(spark, tmp_path):
    d = _docs(spark)
    out = str(tmp_path / "t")
    export_shards(d, out, BUDGET)

    # (a) a missing shard directory
    victim = sorted(
        p for p in __import__("pathlib").Path(out).glob("shard=*")
    )[1]
    backup = str(victim) + ".bak"
    shutil.move(str(victim), backup)
    ok, msg = verify_shards(spark, out)
    assert not ok and "shard set mismatch" in msg, msg
    shutil.move(backup, str(victim))
    ok, _ = verify_shards(spark, out)
    assert ok

    # (b) corrupted payload: rewrite one shard with one doc's text altered
    sub = spark.read.parquet(str(victim))
    tampered = sub.withColumn(
        "text",
        F.when(
            F.col("doc_id") == sub.limit(1).collect()[0]["doc_id"],
            F.concat(F.col("text"), F.lit(" TAMPERED")),
        ).otherwise(F.col("text")),
    )
    tampered.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tv"))
    shutil.rmtree(str(victim))
    shutil.copytree(str(tmp_path / "tv"), str(victim))
    ok, msg = verify_shards(spark, out)
    assert not ok and ("xor_check" in msg or "sum_check" in msg
                       or "n_tokens" in msg), msg

    # (c) no manifest => not a published export
    shutil.move(f"{out}/_SHARD_MANIFEST.json", f"{out}/m.bak")
    ok, msg = verify_shards(spark, out)
    assert not ok and "no manifest" in msg
