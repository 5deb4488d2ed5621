#!/usr/bin/env python3
"""Extra, non-frozen benchmarks for optimization work (guide §1.4): isolate
expensive operators with noop sinks and per-phase timers. NOT part of the
frozen bench.py contract — numbers here feed OPTIMIZATION_r06.md only.

Usage:
    python bench_extra.py simindex [--sf-dir /root/testdata/sf1.0]
    python bench_extra.py neardup  [--sf-dir ...]
    python bench_extra.py lifecycle
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import build_session  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(label, fn, spark=None):
    if spark is not None:
        spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"  {label:<40s} {dt:8.3f}s", flush=True)
    if spark is not None:
        spark.sparkContext.setJobDescription(None)
    return dt, out


def probe_simindex(sf_dir: str, cpus: int) -> None:
    import shutil

    from pyspark.sql import functions as F

    from engine import io as eio
    from engine.simindex import SimIndex
    from engine.simsearch import lsh_table_buckets

    spark = build_session(cpus, app="probe-simindex")
    em = eio.read_table(spark, sf_dir, "embeddings")
    n = em.count()
    print(f"embeddings rows = {n}")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"

    # phase timings of the ingest internals
    _timed("lsh_table_buckets (noop)", lambda: _noop(
        lsh_table_buckets(em, 6, 5)), spark)
    nb = lsh_table_buckets(em, 6, 5).localCheckpoint()
    bstats = (
        nb.groupBy("tbl", "bucket").count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("intra_pairs"),
             F.max("count").alias("max_bucket"))
        .first()
    )
    print(f"intra candidate pairs (pre-distinct) = {int(bstats['intra_pairs'])}, "
          f"max bucket = {bstats['max_bucket']}")

    troot = os.path.join(base, "probe_simindex_root")
    shutil.rmtree(troot, ignore_errors=True)
    idx = SimIndex(spark, troot)
    wall, _ = _timed("full ingest(all)", lambda: idx.ingest(em, "all"), spark)

    # refresh profile: base 90% then delta 10%
    cut = int((em.agg(F.max("vec_id")).first()[0] + 1) * 0.9)
    rroot = os.path.join(base, "probe_simindex_refresh")
    shutil.rmtree(rroot, ignore_errors=True)
    idx2 = SimIndex(spark, rroot)
    _timed("base ingest(90%)", lambda: idx2.ingest(
        em.filter(F.col("vec_id") < cut), "base"), spark)
    _timed("delta ingest(10%)", lambda: idx2.ingest(
        em.filter(F.col("vec_id") >= cut), "delta"), spark)

    pairs = idx.verified_pairs()
    print(f"verified pairs = {pairs.count()}")


def probe_neardup(sf_dir: str, cpus: int) -> None:
    from engine import io as eio
    from engine.textops import neardup_canonical_docs, neardup_components_docs

    spark = build_session(cpus, app="probe-neardup")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("neardup_canonical_docs", "neardup_components_docs"):
        for i in range(2):
            _timed(f"{name} #{i}", lambda n=name: _noop(qs[n](spark, sf_dir)),
                   spark)




def probe_neardup_phases(sf_dir: str, cpus: int) -> None:
    from pyspark.sql import functions as F

    from engine.queries import _t
    from engine.textops import (_doc_token_ids, _minhash_bands, _tokens_col,
                                neardup_verified_pairs)

    spark = build_session(cpus, app="probe-neardup-phases")
    d = _t(spark, sf_dir, "documents")
    print("docs =", d.count())
    _timed("explode tokens only (noop)", lambda: _noop(
        d.select("doc_id", F.explode(_tokens_col()).alias("w"))), spark)
    _timed("_doc_token_ids (noop)", lambda: _noop(_doc_token_ids(d)), spark)
    tw = _doc_token_ids(d)
    print("token rows =", tw.count())
    _timed("_minhash_bands (noop)", lambda: _noop(
        _minhash_bands(spark, tw)), spark)
    _timed("verified_pairs (noop)", lambda: _noop(
        neardup_verified_pairs(spark, d)), spark)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["simindex", "neardup", "neardup_phases"])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if args.what == "simindex":
        probe_simindex(args.sf_dir, args.cpus)
    elif args.what == "neardup":
        probe_neardup(args.sf_dir, args.cpus)
    elif args.what == "neardup_phases":
        probe_neardup_phases(args.sf_dir, args.cpus)


if __name__ == "__main__":
    main()
