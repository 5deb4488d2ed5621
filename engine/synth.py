"""Deterministic synthetic transcript generator (T0).

Shape mandated by BASELINE.json:15: (conv_id string, turn_idx int32,
role string, text string, tool string, ts timestamp). Generation rules are
FIXTURES.md §1: everything is hash-derived from (cid, turn_idx) with
pyspark's xxhash64 — zero per-row Python, zero RNG state, zero wall clock —
so the same call reproduces the same table at any parallelism.

Scale design:
  * conversations get a Zipf-like turn budget n_turns(c) =
    max(2, floor(C / (c+1)^1.1)) — conversation 0 is a deliberately "hot"
    key for the salting path (engine/skew.py);
  * turn rows come from a two-level sequence/explode in blocks of 4096 so no
    driver-side row materializes a multi-million element array;
  * cumulative inter-turn gaps (ts) are computed with a TWO-PHASE prefix
    sum: per-block gap totals via a higher-order `aggregate` over the
    block's index range, a window cumsum over the tiny block table, then a
    within-block window capped at 4096 rows. A naive
    `sum().over(partitionBy(conv_id))` would serialize the hot
    conversation's millions of rows through one task — the generator would
    hit the exact skew wall the engine exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BASE_TS = "2026-01-01 00:00:00"
_BLOCK = 4096  # max elements per exploded sequence row

_TOOLS = ["search", "exec", "fetch", "calc"]


def _h(*cols):
    """xxhash64 over columns — the only entropy source."""
    return F.xxhash64(*cols)


def _gap_s(cid, i):
    """Inter-turn gap seconds for turn i of conversation cid: 5..244 s plus
    a 1-in-19 injected 2–6 h gap (creates missing hourly buckets for
    LOCF/linear-interpolation tests)."""
    base = F.lit(5) + F.pmod(_h(cid, i, F.lit(13)), F.lit(240))
    big = F.when(
        F.pmod(_h(cid, i, F.lit(17)), F.lit(19)) == 0,
        F.lit(7200) + F.pmod(_h(cid, i, F.lit(19)), F.lit(14401)),
    ).otherwise(0)
    return (base + big).cast("long")


def conv_turn_counts(spark: SparkSession, n_convs: int, hot_turns: int) -> DataFrame:
    """Per-conversation turn budget with Zipf-like (s≈1.1) skew."""
    return spark.range(n_convs).select(
        F.col("id").alias("cid"),
        F.greatest(
            F.lit(2),
            F.floor(F.lit(float(hot_turns)) / F.pow(F.col("id") + 1, F.lit(1.1))),
        )
        .cast("int")
        .alias("n_turns"),
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    hot_turns: int = 400,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic T0 table. Total turns ≈ hot_turns * H_{1.1}(n_convs).

    ~5k turns: (200, 400); ~200k turns: (2000, 12000); bench 1–20M:
    (20000+, 150000+).
    """
    convs = conv_turn_counts(spark, n_convs, hot_turns)

    # two-level explode: blocks of <=_BLOCK turn indices per row
    blocks = convs.select(
        "cid",
        "n_turns",
        F.explode(
            F.sequence(F.lit(0), ((F.col("n_turns") - 1) / _BLOCK).cast("int"))
        ).alias("blk"),
    ).withColumns(
        {
            "blk_lo": F.col("blk") * _BLOCK,
            "blk_hi": F.least(F.col("n_turns") - 1, (F.col("blk") + 1) * _BLOCK - 1),
        }
    )
    if partitions:
        blocks = blocks.repartition(partitions, "cid", "blk")

    # phase 1: per-block gap totals (vectorized HOF, no explode yet) and the
    # running offset of each block within its conversation
    cid = F.col("cid")
    blocks = blocks.withColumn(
        "blk_gap_sum",
        F.aggregate(
            F.transform(
                F.sequence("blk_lo", "blk_hi"), lambda i: _gap_s(cid, i)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    w_blocks = (
        Window.partitionBy("cid")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = blocks.withColumn(
        "block_base", F.coalesce(F.sum("blk_gap_sum").over(w_blocks), F.lit(0))
    )

    # the block table is tiny, so AQE coalesces the window shuffle to ~1
    # partition — repartition BEFORE the explode or the 10^7-row expansion
    # runs in a single task
    n_part = partitions or spark.sparkContext.defaultParallelism * 2
    blocks = blocks.repartition(n_part, "cid", "blk")

    # phase 2: explode turns; within-block cumsum windows are <=4096 rows —
    # hot conversations spread over hash(cid, blk) partitions, never one task
    turns = blocks.select(
        "cid", "blk", "block_base",
        F.explode(F.sequence("blk_lo", "blk_hi")).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    tix = F.col("turn_idx")
    w_inblock = Window.partitionBy("cid", "blk").orderBy("turn_idx")
    turns = turns.withColumn("gap_s", _gap_s(cid, tix)).withColumn(
        "cum_gap", F.col("block_base") + F.sum("gap_s").over(w_inblock)
    )

    role_h = F.pmod(_h(cid, tix, F.lit(1)), F.lit(20))
    role = F.when(role_h < 9, "user").when(role_h < 18, "assistant").otherwise("tool")
    text = F.concat(
        F.lit("t-"),
        cid.cast("string"),
        F.lit("-"),
        tix.cast("string"),
        F.lit("-"),
        F.repeat(F.lit("x"), F.pmod(_h(cid, tix, F.lit(7)), F.lit(180)).cast("int")),
    )
    tool = F.when(
        F.col("role") == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (1 + F.pmod(_h(cid, tix, F.lit(11)), F.lit(4))).cast("int"),
        ),
    )
    # ~1% of turns jittered backwards <=90 s (late / out-of-order data)
    late_s = F.when(
        F.pmod(_h(cid, tix, F.lit(23)), F.lit(100)) == 0,
        F.lit(1) + F.pmod(_h(cid, tix, F.lit(29)), F.lit(90)),
    ).otherwise(0)

    return (
        turns.withColumn("role", role)
        .select(
            F.concat(F.lit("conv-"), F.lpad(cid.cast("string"), 8, "0")).alias(
                "conv_id"
            ),
            tix.alias("turn_idx"),
            F.col("role"),
            text.alias("text"),
            tool.alias("tool"),
            F.timestamp_micros(
                F.unix_micros(F.to_timestamp(F.lit(BASE_TS)))
                # conversation start offsets spread over 90 days so the table
                # spans >=3 calendar months incl. the Feb-2026 short-month edge
                + F.pmod(_h(cid, F.lit(31)), F.lit(7_776_000)) * 1_000_000
                + (F.col("cum_gap") - late_s) * 1_000_000
            )
            .cast("timestamp_ntz")  # canonical engine ts type (naive UTC)
            .alias("ts"),
        )
    )
