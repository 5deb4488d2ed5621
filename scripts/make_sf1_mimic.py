#!/usr/bin/env python3
"""Build a deterministic 10x upsample of /root/testdata/sf0.1 that mimics
the DRIVER's sf1.0 measurement dataset scale (BENCH_r05.json: the driver's
round-end bench escalated to sf=1.0). Unlike bench.py's make_sf1 (relational
facts only), this scales EVERY table — embeddings (2k->20k vectors),
documents (5k->50k), events (100k->1M) — because the round-6 optimization
targets (simindex ingest, neardup, ivf) are keyed on those tables.

Key offsets keep join selectivity and group cardinality scaling with rows
(pure duplication would only deepen per-key skew). Text/vector payloads are
perturbed per replica so near-dup/LSH behavior is scale-realistic:
  - documents: replica id is appended as an extra token (docs stay distinct)
  - embeddings: vec_id offset; vector reused (IVF/LSH cost depends on count)
No RNG anywhere: output is a pure function of the source tables.

Usage: python scripts/make_sf1_mimic.py [dst_dir]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1mimic"


def main():
    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                          app="make-sf1-mimic")
    if os.path.exists(os.path.join(DST, "_DONE")):
        print("already built", DST)
        return
    os.makedirs(DST, exist_ok=True)
    rep = F.broadcast(spark.range(10).select(F.col("id").alias("_rep")))
    # dims copied verbatim
    for t in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
    # facts: 10x with per-table key offsets
    plans = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
        "documents": ["doc_id"],
    }
    for t, keys in plans.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        offs = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        out = df.crossJoin(rep)
        for k, off in offs.items():
            out = out.withColumn(k, F.col(k) + F.col("_rep") * F.lit(off))
        if t == "events":
            # spread replicas in time (+_rep minutes) so per-bucket
            # cardinalities scale instead of 10x-duplicating each second
            out = out.withColumn(
                "ts", F.col("ts") + F.make_interval(mins=F.col("_rep"))
            )
        if t == "documents":
            # keep docs textually distinct across replicas (near-dup paths)
            out = out.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"),
                             F.col("_rep").cast("string"))
                ),
            )
        out.drop("_rep").repartition(8).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print("built", t)
    with open(os.path.join(DST, "_DONE"), "w") as f:
        f.write("ok")
    print("done ->", DST)


if __name__ == "__main__":
    main()
