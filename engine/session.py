"""SparkSession factory with the engine's standard configuration.

All jobs run in UTC with Arrow enabled (BASELINE.json:15 mandates vectorized
pandas/Arrow UDFs, no per-row Python). AQE is on so skewed sort-merge joins
split at runtime; hot-key *aggregation* skew is handled explicitly in
engine/skew.py (AQE cannot fix skewed groupBy, SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # determinism / correctness
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.int96RebaseModeInWrite": "CORRECTED",
    # vectorized Python boundary (codecs, gap-fill)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # runtime re-planning at scale
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local-mode shuffle sizing; a real cluster overrides via spark-submit conf
    "spark.sql.shuffle.partitions": "32",
    # File-listing strategy (guide §6): above this many paths Spark lists
    # partition directories with a DISTRIBUTED job — each such listing costs
    # a full scheduler round-trip (~0.5-1 s here), and a 475-day tier read
    # pays it on every spark.read.parquet call. On a local/POSIX store the
    # driver's own thread-pool listing of a few thousand dirs is
    # milliseconds, so keep the job path for genuinely huge path sets only.
    # Production (object stores, 10^5+ partitions): lower via this env var —
    # the distributed listing is the right tool there.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": os.environ.get(
        "SPARK_GRAFT_LIST_JOB_THRESHOLD", "4096"
    ),
    # keep broadcast joins for the small dimension tables
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "transcript-tiers",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master=None`` defers to the environment (spark-submit / existing
    session); tests and bench pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
