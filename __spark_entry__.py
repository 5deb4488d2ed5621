"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship tier pipeline; ``queries()`` /
``oracle_sql()`` register SURVEY.md §2 operators for the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engine import io as eio
from engine import rollup as erollup
from engine.queries import ORACLE_SQL, QUERIES

# importing these modules registers their queries into QUERIES/ORACLE_SQL
import engine.alert_queries  # noqa: F401,E402
import engine.aqp  # noqa: F401,E402
import engine.basket  # noqa: F401,E402
import engine.contamindex  # noqa: F401,E402
import engine.corpusops  # noqa: F401,E402
import engine.correlate  # noqa: F401,E402
import engine.more_queries  # noqa: F401,E402
import engine.multimodal  # noqa: F401,E402
import engine.dedupindex  # noqa: F401,E402
import engine.drift_queries  # noqa: F401,E402
import engine.fileindex  # noqa: F401,E402
import engine.graphrank  # noqa: F401,E402
import engine.scrub  # noqa: F401,E402
import engine.seqops  # noqa: F401,E402
import engine.shardsink  # noqa: F401,E402
import engine.simindex  # noqa: F401,E402
import engine.ts_analytics  # noqa: F401,E402
import engine.simsearch  # noqa: F401,E402
import engine.textops  # noqa: F401,E402
import engine.tier_queries  # noqa: F401,E402
import engine.udx  # noqa: F401,E402
import engine.vocabindex  # noqa: F401,E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: adapt the events fixture to
    transcript shape, roll through hourly→daily→monthly continuous-aggregate
    tiers, return the monthly tier (mean/min/max/count for turn_rate,
    token_count, tool_invocations per conversation-month)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = eio.read_table(spark, SF0001, "events")
    t0 = eio.transcripts_from_events(events)
    tiers = erollup.build_tiers(t0)
    return erollup.tier_view(tiers["monthly"], "monthly")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extensions). Each callable takes (spark, sf_dir)
    and returns a DataFrame whose column names match oracle_sql()."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like queries()."""
    return dict(ORACLE_SQL)
