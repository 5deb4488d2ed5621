"""Fresh-process driver-contract verification (the /verify recipe):
entry() smoke + every queries() entry vs its DuckDB oracle at sf0.01.

Usage: python scripts/verify_sweep.py [sf_dir] [name_substr ...]
       python scripts/verify_sweep.py --json OUT.json [sf_dir] [name_substr ...]

With name_substr args, only queries whose name contains any substring run.
Prints one line per query and a final SUMMARY line; exit 1 on any failure.
With --json, also writes a per-query artifact in the same shape as the
driver's CORRECTNESS_r*.json ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) so the full registered set carries
machine-auditable evidence each round, not just the driver's subset.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def determinism_probe(spark) -> bool:
    """Recipe step 3: the tier pipeline on the synthetic table must produce
    an identical sorted-frame hash at two shuffle layouts (integer-backed
    tier state guarantees it). Returns True on match."""
    import pandas as pd

    from engine.rollup import build_tiers, tier_view
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=40, hot_turns=400)
    hashes = []
    for parts in ("4", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        m = tier_view(build_tiers(t0)["monthly"], "monthly").toPandas()
        m = m[sorted(m.columns)].sort_values(
            by=sorted(m.columns), ignore_index=True
        )
        hashes.append(int(pd.util.hash_pandas_object(m.astype(str)).sum()))
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    print(f"determinism_probe: {'MATCH' if hashes[0] == hashes[1] else 'MISMATCH'}"
          f" ({hashes[0]} vs {hashes[1]})")
    return hashes[0] == hashes[1]


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    probe = False
    if argv and argv[0] == "--determinism":
        probe = True
        argv = argv[1:]
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    pats = argv[1:]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", "/dev/shm/spark-verify")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m
    from tests.oracle_utils import assert_frames_match, duck_run, normalize

    n = len(m.entry(spark).limit(5).collect())
    print(f"entry_smoke: {n} rows OK", flush=True)

    if probe:
        return 0 if determinism_probe(spark) else 1

    queries = m.queries()
    oracles = m.oracle_sql()
    if pats:
        queries = {k: v for k, v in queries.items() if any(p in k for p in pats)}
    report: dict[str, dict] = {}
    full = rows_only = failed = 0
    for name in sorted(queries):
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = int(spark_pdf.shape[0])
            sql = oracles.get(name)
            if sql is None:
                rows_only += 1
                rec["err"] = "no_oracle"
                print(f"{name}: rows-only ({len(spark_pdf)} rows)", flush=True)
                continue
            duck_pdf = duck_run(sf_dir, sql)
            rec["oracle_rows"] = int(duck_pdf.shape[0])
            a, b = normalize(spark_pdf), normalize(duck_pdf)
            rec["schema_match"] = list(a.columns) == list(b.columns)
            rec["rows_match"] = len(a) == len(b)
            assert_frames_match(spark_pdf, duck_pdf, name)
            rec["hash_match"] = True
            full += 1
            print(f"{name}: MATCH ({len(spark_pdf)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            if rec["hash_match"] is None and rec["err"] is None:
                rec["hash_match"] = False
                rec["err"] = str(e)[:500]
            print(f"{name}: FAIL {e}", flush=True)
            traceback.print_exc()
        finally:
            report[name] = rec
    print(
        f"SUMMARY: {full} full-match, {rows_only} rows-only, {failed} failed "
        f"of {len(queries)} at {sf_dir}"
    )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
