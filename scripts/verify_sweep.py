"""Fresh-process driver-contract verification (the /verify recipe):
entry() smoke + every queries() entry vs its DuckDB oracle at sf0.01.

Usage: python scripts/verify_sweep.py [sf_dir] [name_substr ...]
With name_substr args, only queries whose name contains any substring run.
Prints one line per query and a final SUMMARY line; exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    from tests.oracle_utils import assert_frames_match, duck_run

    n = len(m.entry(spark).limit(5).collect())
    print(f"entry_smoke: {n} rows OK", flush=True)

    queries = m.queries()
    oracles = m.oracle_sql()
    if len(sys.argv) > 2:
        pats = sys.argv[2:]
        queries = {k: v for k, v in queries.items() if any(p in k for p in pats)}
    full = rows_only = failed = 0
    for name in sorted(queries):
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            sql = oracles.get(name)
            if sql is None:
                assert spark_pdf.shape[0] >= 0
                rows_only += 1
                print(f"{name}: rows-only ({len(spark_pdf)} rows)", flush=True)
                continue
            duck_pdf = duck_run(sf_dir, sql)
            assert_frames_match(spark_pdf, duck_pdf, name)
            full += 1
            print(f"{name}: MATCH ({len(spark_pdf)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"{name}: FAIL {e}", flush=True)
            traceback.print_exc()
    print(
        f"SUMMARY: {full} full-match, {rows_only} rows-only, {failed} failed "
        f"of {len(queries)} at {sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
