"""Physical-plan audits (SURVEY.md §4): the optimizations the engine relies
on at 100 TB must be visible in the plan, not assumed — predicate pushdown
to the parquet scan, column pruning, broadcast of small dims, partial+final
hash aggregation, and no Python in the built-in paths."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine import io as eio  # noqa: E402
from engine.rollup import rollup_hourly  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    li = eio.read_table(spark, SF_DIR, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in p, p


def test_column_pruning_reaches_scan(spark):
    li = eio.read_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    p = plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p, p


def test_small_dim_join_broadcasts(spark):
    n = eio.read_table(spark, SF_DIR, "nation")
    c = eio.read_table(spark, SF_DIR, "customer")
    df = c.join(n, c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in plan(df)


def test_rollup_uses_partial_final_hash_agg(spark):
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=50)
    p = plan(rollup_hourly(t0))
    # two HashAggregate occurrences around one exchange = map-side combine
    assert p.count("HashAggregate") >= 2, p
    assert "Exchange hashpartitioning(conv_id" in p, p


def test_rollup_path_has_no_python_udf(spark):
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=50)
    from engine.rollup import build_tiers, tier_view

    p = plan(tier_view(build_tiers(t0)["monthly"], "monthly"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
        "built-in tier path must stay JVM-side"
    )


def test_gapfill_linear_is_arrow_not_row_python(spark):
    from engine.gapfill import gapfill_linear, hourly_series
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=50)
    p = plan(gapfill_linear(hourly_series(rollup_hourly(t0))))
    assert "FlatMapGroupsInPandas" in p, p  # Arrow grouped map
    assert "BatchEvalPython" not in p, "no row-at-a-time Python"


#: queries whose plan intentionally contains a BroadcastNestedLoopJoin: each
#: broadcasts a tiny CONSTANT table (8-30 rows of permutation/hyperplane/bit
#: indices, or the bounded ANN query set) against the fact side — the
#: broadcast side cannot grow with data scale, so the NLJ is O(n · const).
#: queries whose plan intentionally contains an Exchange SinglePartition:
#: a global scalar aggregate (grand total) compiles to partial HashAggregate
#: per partition → single final reducer. Only ONE partial row per upstream
#: partition crosses that exchange — bounded by partition count, not data —
#: which is the correct shape for a global sum at any scale.
GLOBAL_AGG_OK = {
    "hot_users_topk",  # grand-total sum over the per-key aggregate
    "funnel_conversion_steps",  # three per-step COUNT(*) grand totals, each
    # fed by the per-user partial aggregate (one row per upstream partition)
    "corpus_mixture_upsample",  # MAX over the per-source size aggregate
    # (one row per source) — the balance target for the mixture
    "dq_orders_suite",  # a DQ summary IS one global scalar row: every
    # violation counter folds partial (per input partition) before the
    # single final reduce; uniqueness/ref probes join as one-row frames
    "tier_drift_roles",  # the range totals (N_a, N_b) and the TV numerator
    # are corpus-level scalars over the per-value distribution (rows =
    # category cardinality, fed by partial sums)
    "ab_conversion_ztest",  # the experiment read-out is one global row:
    # per-variant exposure/conversion counts (≤ #variants rows, fed by the
    # per-user partial aggregate) fold to the z statistic
    "basket_lift_event_types",  # the basket grand total N: partial
    # count-distinct over the per-basket distinct aggregate — one row per
    # upstream partition crosses the single reducer
    "graph_assortativity",  # the assortativity read-out is ONE global row:
    # six integer edge-moment sums fold partial (per partition) before the
    # single final reduce that evaluates the closed-form r
}

BNLJ_OK = {
    "hot_users_topk",  # broadcasts the ONE-ROW grand total into per-key shares
    "dq_orders_suite",  # stitches the one-row uniqueness / referential
    # probe results onto the one-row scalar summary (1×1 broadcast joins)
    "ann_cosine_topk",
    "ivf_cosine_topk",
    "simindex_ivf_topk",  # same bounded query×broadcast-centroid cross as ivf_cosine_topk, over the stored index
    "embedding_neardup_pairs",
    "lsh_cosine_buckets",
    "minhash_signatures",
    "neardup_canonical_docs",
    "neardup_components_docs",
    "simhash_docs",
    "corpus_mixture_upsample",  # broadcasts the ONE-ROW global max source
    # size into the per-source epochs table
    "token_prefix_tranches",  # broadcast `shard' < shard` prefix over the
    # per-shard totals table — rows = #range partitions (metadata scale),
    # the join that REPLACES the partition-less window's single reducer
    "corpus_shard_plan",  # same broadcast band-offset prefix join as
    # token_prefix_tranches (≤2^12 hash-band totals, metadata scale)
    "vocab_token_ids",  # broadcast (tf, prefix)-cell offset join — rows
    # bounded by distinct-tf × prefix shards, never by vocabulary size;
    # replaces ROW_NUMBER's Exchange SinglePartition
    "vocabindex_ids_oneshot",  # same distributed sort-rank inside the
    # persisted index's first build
    "vocabindex_totals",  # ditto (assignment ranking feeds the index
    # whose totals this query serves)
    "tier_drift_roles",  # stitches the ONE-ROW range totals and the
    # ONE-ROW TV numerator onto the per-value rows (1×k broadcast joins)
    "basket_lift_event_types",  # broadcasts the ONE-ROW basket grand
    # total onto the item-vocab-bounded pair rows
}


def _registered_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", _registered_names())
def test_registered_query_plan_is_scale_safe(spark, name):
    """Every driver-registered query must compile to a plan with no
    single-partition exchange (a one-reducer funnel dies at 100 TB) and no
    cartesian product; nested-loop joins only over constant broadcast sides."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_DIR)
    p = plan(df)
    if name not in GLOBAL_AGG_OK:
        assert "Exchange SinglePartition" not in p, f"{name}: single-reducer funnel"
    else:
        # even allowlisted queries must feed the single-partition exchange
        # from a partial aggregate, never raw data
        seg = p.split("Exchange SinglePartition")[1]
        assert "partial" in seg.split("Exchange")[0].lower(), (
            f"{name}: SinglePartition exchange not fed by partial aggregate:\n{p}"
        )
    assert "CartesianProduct" not in p, f"{name}: cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in p, (
            f"{name}: unexpected nested-loop join"
        )


def test_partition_pruning_on_tier_read(spark, tmp_path):
    from engine.pipeline import TierPipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=80)
    pipe = TierPipeline(spark, str(tmp_path / "t"))
    pipe.run(t0, stages=("hourly",))
    hourly = pipe.read_tier("hourly")
    one_day = hourly.filter(F.col("bucket_date") == "2026-01-05")
    p = plan(one_day)
    # bucket_date is a partition column: the filter must prune directories,
    # not appear as a data filter
    assert "PartitionFilters" in p and "bucket_date" in p.split("PartitionFilters")[1][:200], p


def test_dynamic_partition_pruning_on_tier_join(spark, tmp_path):
    """Joining the bucket_date-partitioned hourly tier against a filtered
    dim on the partition column must inject a DPP filter: only the dim's
    surviving days are scanned, the rest of the tier is never read."""
    from engine.pipeline import TierPipeline
    from engine.synth import synth_transcripts

    t0 = synth_transcripts(spark, n_convs=20, hot_turns=80)
    pipe = TierPipeline(spark, str(tmp_path / "dpp"))
    pipe.run(t0, stages=("hourly",))
    hourly = pipe.read_tier("hourly")
    dim = (
        hourly.select("bucket_date").distinct().limit(2)
        .withColumn("flag", F.lit(1))
    )
    dim.write.parquet(str(tmp_path / "dim"))
    dim_df = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("flag") == 1)
    joined = hourly.join(dim_df, "bucket_date")
    p = plan(joined)
    assert "dynamicpruning" in p.lower() or "DynamicPruning" in p, p
