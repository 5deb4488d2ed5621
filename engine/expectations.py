"""Declarative data-quality expectations (SURVEY.md §2 L — lifecycle /
publish gating): a constraint suite compiled into the MINIMAL number of
Spark jobs, pluggable as the `TierPipeline(wap_audit=…)` so bad data is
vetoed BEFORE it publishes (the write-audit-publish pattern; same problem
space as AWS Deequ / Great Expectations, re-expressed as plain conditional
aggregation over Catalyst).

Compilation strategy (the scale story):
- every ROW-LEVEL check (not_null, in_range, in_set, matches, freshness,
  arbitrary boolean expression) folds into ONE aggregation pass — a single
  scan with partial+final conditional sums, no data shuffle;
- each UNIQUE-KEY check is one exact `count(*) − count(distinct keys)`
  aggregate (its own shuffle, unavoidable for exactness);
- each REFERENTIAL check is one broadcast anti-join probe against the
  (dimension-sized) reference keys.

Null semantics follow the completeness/validity split used by every DQ
tool: `not_null` measures completeness; value checks (`in_range`,
`in_set`, `matches`) SKIP nulls — a null is a completeness violation, not
a validity one — so the two never double-count.

`Suite.check(df)` returns a `DQReport`; `Suite.as_wap_audit(table)` adapts
it into a callable that raises `ExpectationError` inside the WAP seal,
leaving published tables and the manifest byte-untouched on veto.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(AssertionError):
    """Raised by a WAP audit when a suite fails — vetoes the publish."""


@dataclass(frozen=True)
class Check:
    name: str           # report key (unique within a suite)
    kind: str           # row | unique | ref
    violated: Column | None = None          # row-level: TRUE when violated
    keys: tuple = ()                        # unique: key columns
    ref_keys: object = None                 # ref: (fact_col, dim_df, dim_col)
    max_violations: int = 0                 # tolerance before the suite fails


def not_null(col: str, max_violations: int = 0) -> Check:
    return Check(
        f"null_{col}", "row", F.col(col).isNull(),
        max_violations=max_violations,
    )


def in_range(col: str, lo, hi, max_violations: int = 0) -> Check:
    """Validity: non-null values outside [lo, hi]."""
    c = F.col(col)
    return Check(
        f"range_{col}", "row",
        c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)),
        max_violations=max_violations,
    )


def in_set(col: str, values, max_violations: int = 0) -> Check:
    c = F.col(col)
    return Check(
        f"set_{col}", "row",
        c.isNotNull() & ~c.isin(list(values)),
        max_violations=max_violations,
    )


def matches(col: str, regex: str, max_violations: int = 0) -> Check:
    c = F.col(col)
    return Check(
        f"regex_{col}", "row",
        c.isNotNull() & ~c.rlike(regex),
        max_violations=max_violations,
    )


def expect_expr(name: str, violated_sql: str, max_violations: int = 0) -> Check:
    """Arbitrary boolean SQL over the row; TRUE means violated."""
    return Check(name, "row", F.expr(violated_sql), max_violations=max_violations)


def freshness(ts_col: str, now, max_lag_s: int) -> Check:
    """Every row older than `now - max_lag_s` seconds violates. `now` is an
    explicit literal (a timestamp string or datetime) so audits are
    deterministic and replayable — never wall-clock inside the plan."""
    def us(c):
        # TIMESTAMP_NTZ has no direct long cast; session TZ is UTC so the
        # ltz round-trip is value-preserving (engine-wide convention)
        return F.unix_micros(c.cast("timestamp_ntz").cast("timestamp_ltz"))

    lag_s = (us(F.lit(now)) - us(F.col(ts_col))) / F.lit(1_000_000)
    return Check(f"fresh_{ts_col}", "row", lag_s > F.lit(max_lag_s))


def unique(keys: list[str], max_violations: int = 0) -> Check:
    return Check(
        "unique_" + "_".join(keys), "unique", keys=tuple(keys),
        max_violations=max_violations,
    )


def ref_integrity(
    col: str, dim: DataFrame, dim_col: str, max_violations: int = 0
) -> Check:
    """Orphaned foreign keys: non-null `col` values with no match in the
    (dimension-sized, broadcast) reference column."""
    return Check(
        f"ref_{col}", "ref", ref_keys=(col, dim, dim_col),
        max_violations=max_violations,
    )


@dataclass
class DQReport:
    rows_scanned: int
    violations: dict[str, int]
    tolerances: dict[str, int] = field(default_factory=dict)

    @property
    def failed(self) -> dict[str, int]:
        return {
            k: v
            for k, v in self.violations.items()
            if v > self.tolerances.get(k, 0)
        }

    @property
    def passed(self) -> bool:
        return not self.failed


class Suite:
    """An ordered set of checks over one table."""

    def __init__(self, checks: list[Check]):
        names = [c.name for c in checks]
        if len(names) != len(set(names)):
            raise ValueError(f"duplicate check names: {names}")
        self.checks = list(checks)

    # -- compile & run -------------------------------------------------------
    def summary(self, df: DataFrame) -> DataFrame:
        """One-row DataFrame: rows_scanned + one violation-count column per
        check, computed in the minimal number of jobs (see module doc).
        Row-level checks share a single scan; this is the driver-query /
        oracle surface (`check()` collects it)."""
        row_checks = [c for c in self.checks if c.kind == "row"]
        aggs = [F.count(F.lit(1)).alias("rows_scanned")] + [
            F.sum(F.when(c.violated, 1).otherwise(0))
            .cast("long")
            .alias(c.name)
            for c in row_checks
        ]
        out = df.agg(*aggs)
        for c in self.checks:
            if c.kind == "unique":
                # uniqueness is defined over rows whose every key is
                # non-null (COUNT DISTINCT skips null keys; null-key rows
                # are `not_null`'s jurisdiction, not duplicates)
                nn = F.lit(True)
                for k in c.keys:
                    nn = nn & F.col(k).isNotNull()
                dup = df.select(
                    (
                        F.sum(F.when(nn, 1).otherwise(0))
                        - F.count_distinct(*[F.col(k) for k in c.keys])
                    )
                    .cast("long")
                    .alias(c.name)
                )
                out = out.crossJoin(dup)  # two one-row frames
            elif c.kind == "ref":
                col, dim, dim_col = c.ref_keys
                orphans = (
                    df.filter(F.col(col).isNotNull())
                    .join(
                        F.broadcast(
                            dim.select(F.col(dim_col).alias(col)).distinct()
                        ),
                        col,
                        "left_anti",
                    )
                    .select(F.count(F.lit(1)).cast("long").alias(c.name))
                )
                out = out.crossJoin(orphans)
        return out

    def check(self, df: DataFrame) -> DQReport:
        row = self.summary(df).collect()[0].asDict()
        rows = row.pop("rows_scanned")
        return DQReport(
            rows_scanned=rows,
            violations=row,
            tolerances={c.name: c.max_violations for c in self.checks},
        )

    # -- WAP integration ------------------------------------------------------
    def as_wap_audit(self, table: str = "hourly") -> Callable:
        """Adapter for `TierPipeline(wap=True, wap_audit=suite.as_wap_audit())`:
        inside the seal, reads the STAGED view of `table` (the pipeline's
        `_read_path` resolves in-flight snapshots during a WAP run) and
        raises `ExpectationError` on any over-tolerance violation — the run
        aborts and nothing publishes."""

        def audit(pipe) -> DQReport:
            report = self.check(pipe._read_path(pipe.table_path(table)))
            if not report.passed:
                raise ExpectationError(
                    f"expectations failed on staged '{table}': {report.failed} "
                    f"(rows_scanned={report.rows_scanned})"
                )
            return report

        return audit
