#!/usr/bin/env python3
"""Dump .explain('formatted') for the bench-headline declared queries into
plans/<tag>/<query>_<suffix>.txt (judge evidence for OPTIMIZATION_r06.md).

Usage: python scripts/dump_plans.py <outdir> <suffix> [name ...]
       e.g. python scripts/dump_plans.py plans/r06 after
With no names, dumps the bench RELATIONAL set.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from bench import RELATIONAL, build_session

    import __spark_entry__ as entry

    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                          app="dump-plans")
    qs = entry.queries()
    for name in names or RELATIONAL:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
