#!/usr/bin/env python3
"""Bench harness (SURVEY.md §6 / M9).

Default mode prints ONE JSON line:
    {"metric": ..., "value": <total wall sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Headline set = the tier pipeline on a deterministic synthetic transcript
table (primary metric: turns/sec through hourly->daily->monthly) plus
representative relational queries on the driver tables at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), on
local[$SPARK_GRAFT_CPUS].

--scaling runs the same pipeline job at local[8] and local[32] on the same
input and reports thr8, thr32 and eff = (thr32/thr8)/4 into
BENCH/BASELINE.md (the sandbox substitute for N vs 4N executors).

Every action is a noop-sink write so Catalyst cannot prune the measured
work (a count() would let the optimizer drop unused aggregate columns).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# synthetic bench table sizing (deterministic, FIXTURES.md §1)
BENCH_CONVS = 20_000
BENCH_HOT = 150_000  # ~1.0M turns total; hot conv = 150k turns
# scaling runs need the job compute-bound, not overhead-bound (~0.6 s of
# driver/planning time is fixed per job): ~10M turns keeps the serial
# fraction small while trials stay short enough to repeat (the sandbox host
# shows 3-5x CPU-steal swings; the protocol interleaves trials per level and
# takes per-level best to sample uncontended windows)
SCALE_CONVS = 100_000
SCALE_HOT = 5_000_000
SCALE_TRIALS = 3


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def build_session(cpus: int, app="bench", mem="16g"):
    from engine.session import get_spark

    extra = {"spark.driver.memory": mem}
    if os.path.isdir("/dev/shm"):
        # memory-backed shuffle/spill: virtio disk serializes shuffle IO in
        # this sandbox and flattens core scaling
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    return get_spark(
        app, master=f"local[{cpus}]", shuffle_partitions=cpus, extra_conf=extra
    )


def synth_t0(spark, n_convs=BENCH_CONVS, hot=BENCH_HOT):
    from engine.synth import synth_transcripts

    return synth_transcripts(spark, n_convs=n_convs, hot_turns=hot,
                             partitions=CPUS * 2)


def pipeline_queries(spark, t0):
    """Synthetic-table stages as (prepare, factory) pairs — `prepare` runs
    UNTIMED before a stage's trials; `factory` builds a fresh DataFrame per
    trial.

    Two cache traps both of which would silently shrink the measured job:
    (1) re-sinking the SAME DataFrame lets Spark skip its materialized
    shuffle map stages — so factories build a fresh plan per trial; and
    (2) Spark's CacheManager substitutes a cached DataFrame into ANY
    plan-identical subtree, so the hourly cache the gap-fill/compress
    stages legitimately read from must not exist yet when the full
    leaf→monthly path is timed — hence the ordered prepare steps (the
    rollup stage runs first, against only the cached raw t0)."""
    from engine.codec.chunks import make_chunks
    from engine.gapfill import gapfill, hourly_series
    from engine.rollup import rollup_up, tier_view
    from engine.skew import rollup_hourly_salted

    state: dict = {}

    def hourly_cached():
        if "h" not in state:
            h = rollup_hourly_salted(t0, n_salts=16)
            h.cache().count()
            state["h"] = h
        return state["h"]

    return {
        # full leaf->monthly path from raw (the primary turns/sec metric)
        "pipeline_rollup_monthly": (
            None,
            lambda: tier_view(
                rollup_up(
                    rollup_up(rollup_hourly_salted(t0, 16), "daily"),
                    "monthly",
                ),
                "monthly",
            ),
        ),
        "gapfill_locf": (
            hourly_cached,
            lambda: gapfill(hourly_series(hourly_cached()), "locf"),
        ),
        "compress_chunks": (
            hourly_cached,
            lambda: make_chunks(hourly_series(hourly_cached()), tier="hourly"),
        ),
        # seventh round-4 session: the monoid/sketch state-family stack's
        # leaf cost — salted hourly rollup carrying TWA integrals, quantile
        # sketch maps, top/bottom-N arrays, and session islands in ONE pass
        # (one bounded window + three fine-keyed pre-agg joins on the same
        # (conv, hour) key). Priced separately so state-family regressions
        # surface as a bench delta without touching the primary
        # pipeline_rollup_monthly metric.
        "state_stack_hourly": (
            None,
            lambda: rollup_hourly_salted(
                t0,
                16,
                twa_cols=["token_count"],
                qsk_cols=["token_count"],
                topn_cols={"token_count": 3},
                botn_cols={"token_count": 3},
                session_gaps=[30],
            ),
        ),
    }


RELATIONAL = [
    "pricing_summary",
    "top_revenue_orders",
    "window_topk_orders",
    "tier_monthly",
    "gapfill_locf_hourly",
    "dod_timestamp_deltas",
    # LLM-pipeline scale paths at sf0.1 (VERDICT r2 item 7): the MinHash-LSH
    # near-dup chain and its connected-components canonicalization — timed
    # here so candidate-pair explosion regressions surface as bench deltas,
    # with hashes still gated at sf0.01 by the driver oracle
    "neardup_canonical_docs",
    "neardup_components_docs",
    # round-4 analytics pack representatives: a window-heavy per-series agg
    # (TWA), a double-percentile robust stat (MAD), and the hist-state
    # percentile server — the continuous-aggregate function family's cost
    # profile at sf0.1
    "twa_locf_daily",
    "outliers_mad_daily",
    "hist_percentile_monthly",
    # sequence-analytics representatives (third round-4 session): the CUSUM
    # prefix-form double window stack and the chained-join funnel
    "cusum_alerts_user",
    "funnel_conversion_steps",
    # seventh round-4 session: interpolated bucket serving — tier-struct
    # build + the lag()/lead() carry decoration over tier rows
    "tier_interp_twa_daily",
    # eleventh round-4 session: the drift-monitoring family representative —
    # freq tier build + exploded trailing-baseline fold + integer TV
    "drift_baseline_roles_daily",
]


#: per-stage timing trials (min wins). The host's bursty CPU steal makes a
#: single 32-thread measurement swing 2-3x run-to-run; min-of-N over fresh
#: plans samples the uncontended duty cycle the same way the scaling
#: protocol's per-level best-trial does, without changing what is measured.
BENCH_STAGE_TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))


def run_bench(sf_dir: str, cpus: int) -> dict:
    spark = build_session(cpus)
    import __spark_entry__ as entry

    # pipeline input = the INGESTED metrics table on storage, same as the
    # scaling job (B4 derive runs once at ingest; at 10^12 turns nobody
    # re-decodes text bytes on every tier build, and a .cache() of the
    # string-heavy raw table is the known-pathological path on this host)
    from engine.bucket import with_metrics

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if base is None:
        import tempfile

        base = tempfile.gettempdir()
    t0_path = os.path.join(base, "bench_t0_metrics.parquet")
    with_metrics(synth_t0(spark)).select(
        "conv_id", "turn_idx", "ts", "token_count", "is_tool"
    ).write.mode("overwrite").parquet(t0_path)
    t0 = spark.read.parquet(t0_path)
    n_turns = t0.count()

    def best(factory):
        # a FRESH DataFrame per trial: same full execution every time (no
        # skipped shuffle stages), min picks the least-stolen sample
        return min(
            _timed(lambda: _noop(factory()))[0]
            for _ in range(BENCH_STAGE_TRIALS)
        )

    timings: dict[str, float] = {}
    # synthetic tier-pipeline stages
    for name, (prepare, make_df) in pipeline_queries(spark, t0).items():
        if prepare is not None:
            prepare()
        timings[name] = best(make_df)
    # relational headline queries on the driver tables
    qs = entry.queries()
    for name in RELATIONAL:
        timings[name] = best(lambda n=name: qs[n](spark, sf_dir))
    # kmeans-trained IVF as the benched ANN path (VERDICT r2 item 5):
    # training (2 Lloyd rounds incl. its driver-side reseed bookkeeping)
    # plus the probe/re-rank search are both inside the timed region
    from engine import io as eio
    from engine.simsearch import ivf_topk_with_centroids, kmeans_centroids

    em = eio.read_table(spark, sf_dir, "embeddings")
    timings["ivf_bench"] = best(
        lambda: ivf_topk_with_centroids(em, kmeans_centroids(em, k=16, iters=2))
    )

    # persisted-index refresh (VERDICT r3 #1): base index over 90% of the
    # corpus is built UNTIMED; the timed unit is one incremental batch
    # ingest — hash+assign the new 10%, partition-pruned candidate join
    # against the stored index, verified-pair append. Each trial ingests
    # into a fresh hardlink copy of the base root (the fingerprint gate
    # would no-op a repeat ingest into the same root).
    import shutil

    from pyspark.sql import functions as F

    from engine.simindex import SimIndex

    cut = int((em.agg(F.max("vec_id")).first()[0] + 1) * 0.9)
    base_root = os.path.join(base, "bench_simindex_base")
    shutil.rmtree(base_root, ignore_errors=True)
    SimIndex(spark, base_root).ingest(em.filter(F.col("vec_id") < cut), "base")
    delta = em.filter(F.col("vec_id") >= cut)

    def refresh_trial():
        troot = base_root + "_trial"
        shutil.rmtree(troot, ignore_errors=True)
        shutil.copytree(base_root, troot, copy_function=os.link)
        idx = SimIndex(spark, troot)
        return _timed(lambda: idx.ingest(delta, "delta"))[0]

    timings["index_refresh"] = min(
        refresh_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    def rebuild_trial():
        troot = base_root + "_rebuild"
        shutil.rmtree(troot, ignore_errors=True)
        idx = SimIndex(spark, troot)
        return _timed(lambda: idx.ingest(em, "all"))[0]

    # the counterfactual the persisted index exists to avoid: full rebuild
    # over the whole corpus — refresh/rebuild is the O(batch)/O(corpus)
    # ratio a 100-TB ingest pipeline banks every batch
    timings["index_rebuild_full"] = min(
        rebuild_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    # PQ coarse re-rank on the stored index (round-5): same probe budget,
    # candidates scored from 16-byte codes (lists scan column-prunes the
    # vector column — plan-asserted in tests/test_pq.py), only the top-40
    # survivors fetch full vectors. At this SF both paths are
    # scheduler-bound; the row exists so the PQ plan's cost is tracked
    # round-over-round next to its exact twin.
    pq_root = os.path.join(base, "bench_simindex_pq")
    shutil.rmtree(pq_root, ignore_errors=True)
    pq_idx = SimIndex(spark, pq_root, pq_m=16, pq_ks=32)
    pq_idx.ingest(em, "all")
    timings["index_pq_search"] = best(
        lambda: pq_idx.ivf_topk(
            F.col("vec_id") < 10, nprobe=4, topk=5, pq_rerank=40
        )
    )
    timings["index_exact_search"] = best(
        lambda: pq_idx.ivf_topk(F.col("vec_id") < 10, nprobe=4, topk=5)
    )

    # dedup scale-stress (VERDICT r3 #8): 50k synthetic docs with a planted
    # 5k-doc mega-cluster; the star+chain candidate count vs the quadratic
    # all-pairs counterfactual is logged so candidate-explosion regressions
    # surface numerically, not just as wall-time drift
    stress_wall, stress_stats = _neardup_stress(spark, base)
    timings["neardup_stress_50k"] = stress_wall

    # lifecycle: right-to-be-forgotten (L7) — erase two tail conversations
    # from a built pipeline root. What the pair of rows proves: forget ≈
    # the generic resume floor (fingerprint scans every run already pays)
    # + a re-roll of ONLY the affected days — never a table rebuild. The
    # floor is measured explicitly as `resume_noop` (a run() with nothing
    # pending on an identical copy); the erasure increment is the delta.
    # Base root built untimed; each trial works on a fresh hardlink copy
    # (tombstones persist, so a repeat forget on one root would no-op).
    from engine.forget import forget_conversations
    from engine.pipeline import TierPipeline

    raw_path = os.path.join(base, "bench_forget_t0.parquet")
    synth_t0(spark, n_convs=5000, hot=40_000).write.mode("overwrite").parquet(
        raw_path
    )
    raw = spark.read.parquet(raw_path)
    fg_base = os.path.join(base, "bench_forget_base")
    shutil.rmtree(fg_base, ignore_errors=True)
    seed = TierPipeline(spark, fg_base, salted=True, snapshots=True, lease=False)
    seed.run(raw)
    seed.run(raw)  # arm the changelog-pruning pointers

    def lifecycle_trial(fn):
        troot = fg_base + "_trial"
        shutil.rmtree(troot, ignore_errors=True)
        shutil.copytree(fg_base, troot, copy_function=os.link)
        pipe = TierPipeline(
            spark, troot, salted=True, snapshots=True, lease=False
        )
        return _timed(lambda: fn(pipe))[0]

    timings["resume_noop"] = min(
        lifecycle_trial(lambda p: p.run(raw))
        for _ in range(BENCH_STAGE_TRIALS)
    )
    timings["forget_reroll"] = min(
        lifecycle_trial(
            lambda p: forget_conversations(
                p, ["conv-00004997", "conv-00004998"], t0=raw
            )
        )
        for _ in range(BENCH_STAGE_TRIALS)
    )

    # incremental sliding view (M88): base pipeline + consumed view built
    # UNTIMED, then one late turn re-rolls a single hourly day; the timed
    # unit is refresh() — diff → dirty {day, day+1} → two partition
    # recomputes. The counterfactual row rebuilds the whole trailing-24h
    # series: refresh/rebuild is the O(changed)/O(history) ratio the
    # incremental view banks on every late batch.
    from engine.incremental import IncrementalSlidingView

    sv_view_base = fg_base + "_svview"
    shutil.rmtree(sv_view_base, ignore_errors=True)
    sv_pipe = TierPipeline(
        spark, fg_base, salted=True, snapshots=True, lease=False
    )
    IncrementalSlidingView(sv_pipe, sv_view_base, 24).refresh()
    last_day = raw.selectExpr("max(to_date(ts)) AS d").collect()[0]["d"]
    sv_late = raw.filter(F.to_date("ts") == F.lit(last_day)).selectExpr(
        "conv_id", "cast(turn_idx + 900000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 10 minutes as ts",
    )
    sv_pipe.run(raw.unionByName(sv_late))

    def sv_refresh_trial():
        troot = sv_view_base + "_trial"
        shutil.rmtree(troot, ignore_errors=True)
        shutil.copytree(sv_view_base, troot, copy_function=os.link)
        v = IncrementalSlidingView(sv_pipe, troot, 24)
        wall, res = _timed(lambda: v.refresh())
        assert res["mode"] == "incremental", res
        return wall

    timings["sliding_view_refresh"] = min(
        sv_refresh_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    def sv_rebuild_trial():
        troot = sv_view_base + "_rebuild"
        shutil.rmtree(troot, ignore_errors=True)
        v = IncrementalSlidingView(sv_pipe, troot, 24)
        wall, res = _timed(lambda: v.refresh())
        assert res["mode"] == "full", res
        return wall

    timings["sliding_view_rebuild_full"] = min(
        sv_rebuild_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    # CDC merge (L9): month-partitioned orders base written UNTIMED; the
    # timed unit is the touched-partition merge of a ~1.5% batch (updates +
    # cross-partition moves + inserts) into a fresh hardlink copy per trial
    from engine.merge import merge_into

    orders = (
        eio.read_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderstatus",
            "o_totalprice",
        )
    )
    mg_base = os.path.join(base, "bench_merge_base")
    shutil.rmtree(mg_base, ignore_errors=True)
    orders.write.partitionBy("month").parquet(mg_base)
    tgt = spark.read.parquet(mg_base)
    updates = (
        tgt.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn(
            "month",
            F.when(F.col("o_orderkey") % 194 == 0, F.lit("2099-01")).otherwise(
                F.col("month")
            ),
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    )
    inserts = tgt.filter(F.col("o_orderkey") % 251 == 0).select(
        (F.col("o_orderkey") + 50_000_000).alias("o_orderkey"),
        "month",
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    cdc = updates.unionByName(inserts).localCheckpoint()

    def merge_trial():
        troot = mg_base + "_trial"
        shutil.rmtree(troot, ignore_errors=True)
        shutil.copytree(mg_base, troot, copy_function=os.link)
        return _timed(
            lambda: merge_into(
                spark, troot, cdc, on=["o_orderkey"], partition_cols=["month"]
            )
        )[0]

    timings["merge_upsert"] = min(
        merge_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    # point lookup (L11): per-file min/max+Bloom index over the forget-bench
    # root's built hourly tier. `fileindex_build` is the one-pass distributed
    # build; the timed pair proves the drill-down reads candidate files only
    # vs the full-scan filter counterfactual. Pruning counts land in the
    # JSON so a candidate-explosion regression surfaces numerically.
    from engine.fileindex import FileIndex

    tier_dir = seed.tier_data_path("hourly")
    pidx_root = os.path.join(base, "bench_pointidx")
    shutil.rmtree(pidx_root, ignore_errors=True)
    fi = FileIndex(spark, tier_dir, pidx_root, key="conv_id")
    timings["fileindex_build"] = _timed(fi.refresh)[0]
    probe = "conv-00002500"
    point_stats = {
        "files": fi.stats()["files"],
        "candidates": len(fi.candidates(probe)),
    }
    timings["point_lookup_indexed"] = min(
        _timed(lambda: fi.read_point(probe).count())[0]
        for _ in range(BENCH_STAGE_TRIALS)
    )
    timings["point_lookup_scan"] = min(
        _timed(
            lambda: seed.read_tier("hourly")
            .filter(F.col("conv_id") == probe)
            .count()
        )[0]
        for _ in range(BENCH_STAGE_TRIALS)
    )

    # pruned chunk-range read (M55): decode only the T4 blobs overlapping a
    # 3-day window vs the decode-everything-then-clip counterfactual; the
    # pruned/total chunk counts land in the JSON so a pruning regression
    # surfaces numerically, not just as wall-time drift
    from engine.codec.chunks import decode_chunks, read_chunk_range

    chunks_df = seed.read_table("chunks")
    c_lo, c_hi = "2026-02-01 00:00:00", "2026-02-04 00:00:00"
    chunk_stats = {
        "total": chunks_df.count(),
        "pruned_to": chunks_df.filter(
            (F.col("chunk_end") >= F.lit(c_lo).cast("timestamp_ntz"))
            & (F.col("chunk_start") < F.lit(c_hi).cast("timestamp_ntz"))
        ).count(),
    }
    timings["chunk_range_read"] = min(
        _timed(lambda: read_chunk_range(chunks_df, c_lo, c_hi)[0].count())[0]
        for _ in range(BENCH_STAGE_TRIALS)
    )
    timings["chunk_range_scan"] = min(
        _timed(
            lambda: decode_chunks(chunks_df)[0]
            .filter(
                (F.col("bucket_start") >= F.lit(c_lo).cast("timestamp_ntz"))
                & (F.col("bucket_start") < F.lit(c_hi).cast("timestamp_ntz"))
            )
            .count()
        )[0]
        for _ in range(BENCH_STAGE_TRIALS)
    )

    # manifest compaction (M54): fold the built root's per-commit manifest
    # files into one, pruning superseded rows — each trial on a fresh
    # hardlink copy (compact rewrites the manifest directory)
    def compact_trial():
        troot = fg_base + "_compact"
        shutil.rmtree(troot, ignore_errors=True)
        shutil.copytree(fg_base, troot, copy_function=os.link)
        pipe = TierPipeline(
            spark, troot, salted=True, snapshots=True, lease=False
        )
        return _timed(
            lambda: pipe.compact_manifest(prune_superseded=True)
        )[0]

    timings["manifest_compact"] = min(
        compact_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    # hierarchical continuous aggregates (M57): a versioned (week, cohort)
    # parent view + (month, cohort) child over the forget-bench root, both
    # built UNTIMED; the timed unit is the two-level incremental refresh
    # after a late batch re-rolls two conversations' days — each level
    # consumes O(its changed days) from its upstream's changelog. The
    # full-rebuild counterfactual (fresh views over the whole tier
    # history) is the cost the changelog consumption avoids every cycle.
    from engine.cagg import ContinuousAggregate

    CAGG_P = dict(
        keys={"week": "date_trunc('week', bucket_start)",
              "cohort": "substr(conv_id, length(conv_id), 1)"},
        aggs={
            "turns": ("sum", "n_turns"),
            "hours": ("count",),
            "min_tok": ("min", "token_min"),
            "peak": ("max", "n_turns"),
            "avg_turns": ("avg", "n_turns"),
            "ubuckets": ("distinct_kmv", "bucket_start", 2048),
        },
    )
    CAGG_C = dict(
        keys={"month": "date_trunc('month', week)", "cohort": "cohort"},
        aggs=["turns", "hours", "min_tok", "peak", "avg_turns", "ubuckets"],
    )
    cg_p_base = os.path.join(base, "bench_cagg_parent")
    cg_c_base = os.path.join(base, "bench_cagg_child")
    for d in (cg_p_base, cg_c_base):
        shutil.rmtree(d, ignore_errors=True)
    p0 = ContinuousAggregate(seed, cg_p_base, versioned=True, **CAGG_P)
    p0.refresh()
    p0.child(cg_c_base, **CAGG_C).refresh()
    late = raw.filter(
        F.col("conv_id").isin("conv-00004995", "conv-00004996")
    ).selectExpr(
        "conv_id", "cast(turn_idx + 1000000 as int) as turn_idx",
        "role", "text", "tool", "ts + interval 45 minutes as ts",
    )

    def cagg_refresh_trial():
        troot, pdir, cdir = (fg_base + "_cg", cg_p_base + "_t", cg_c_base + "_t")
        for s, d in ((fg_base, troot), (cg_p_base, pdir), (cg_c_base, cdir)):
            shutil.rmtree(d, ignore_errors=True)
            shutil.copytree(s, d, copy_function=os.link)
        pipe = TierPipeline(
            spark, troot, salted=True, snapshots=True, lease=False
        )
        pipe.run(raw.unionByName(late))  # untimed: the upstream mutation
        parent = ContinuousAggregate(pipe, pdir, versioned=True, **CAGG_P)
        child = parent.child(cdir, **CAGG_C)
        t, results = _timed(lambda: (parent.refresh(), child.refresh()))
        cagg_stats["parent_days_refreshed"] = len(results[0]["days"])
        cagg_stats["child_days_refreshed"] = len(results[1]["days"])
        return t

    cagg_stats: dict = {}
    timings["cagg_hier_refresh"] = min(
        cagg_refresh_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    def cagg_rebuild_trial():
        pdir, cdir = cg_p_base + "_rb", cg_c_base + "_rb"
        for d in (pdir, cdir):
            shutil.rmtree(d, ignore_errors=True)
        parent = ContinuousAggregate(seed, pdir, versioned=True, **CAGG_P)
        child = parent.child(cdir, **CAGG_C)
        return _timed(lambda: (parent.refresh(), child.refresh()))[0]

    timings["cagg_rebuild_full"] = min(
        cagg_rebuild_trial() for _ in range(BENCH_STAGE_TRIALS)
    )

    total = sum(timings.values())
    return {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "synthetic_turns": n_turns,
        "turns_per_sec_rollup": round(n_turns / timings["pipeline_rollup_monthly"]),
        "cpus": cpus,
        "neardup_stress": stress_stats,
        "point_lookup": point_stats,
        "chunk_range": chunk_stats,
        "cagg_hier": cagg_stats,
    }


def _neardup_stress(spark, base: str) -> tuple[float, dict]:
    """50k-doc corpus, 5k of them one near-dup mega-cluster (30 shared
    tokens + 1 of 13 variant tokens: pairwise Jaccard ≈ 0.94). Returns
    (best wall for the verified-pair pipeline, candidate-count stats)."""
    import pyspark.sql.functions as F

    from engine.textops import neardup_candidate_stats, neardup_verified_pairs

    n_docs, n_cluster = 50_000, 5_000
    path = os.path.join(base, "bench_stress_docs.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        fixed = " ".join(f"core{i:02d}" for i in range(30))
        uniq = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"t{k}x"),
                    F.pmod(F.xxhash64(F.col("id") * (k + 7)), F.lit(100000))
                    .cast("string"),
                )
                for k in range(8)
            ],
        )
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") < n_cluster,
                F.concat(
                    F.lit(fixed + " var"),
                    (F.col("id") % 13).cast("string"),
                ),
            )
            .otherwise(uniq)
            .alias("text"),
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    stats = neardup_candidate_stats(spark, docs)
    stats.update({"docs": n_docs, "planted_cluster": n_cluster})
    wall = min(
        _timed(lambda: _noop(neardup_verified_pairs(spark, docs)))[0]
        for _ in range(BENCH_STAGE_TRIALS)
    )
    return wall, stats


def scale_worker(cpus: int, table_path: str) -> dict:
    """One parallelism level, fresh JVM (invoked via subprocess — a stopped
    in-process session pollutes the next one's memory/scheduler). The input
    table is parquet on disk (page-cached after the first pass), so the
    measured job is the real pipeline unit: scan + decode + salted rollup
    through all three tiers. Best of 3 measured runs (GC variance)."""
    spark = build_session(cpus, app=f"scale-{cpus}", mem="24g")
    if not os.path.exists(os.path.join(table_path, "_SUCCESS")):
        # the rollup input is the INGESTED metrics table (B4 derive runs once
        # at ingest: token_count/is_tool columns, no raw text) — at 10^12
        # turns nobody re-decodes text bytes on every tier build
        from pyspark.sql import functions as F

        from engine.bucket import with_metrics

        t0 = synth_t0(spark, n_convs=SCALE_CONVS, hot=SCALE_HOT)
        with_metrics(t0).select(
            "conv_id", "turn_idx", "ts", "token_count", "is_tool"
        ).write.mode("overwrite").parquet(table_path)
    t0 = spark.read.parquet(table_path)
    n = t0.count()
    from engine.rollup import rollup_up, tier_view
    from engine.skew import rollup_hourly_salted

    def job():
        monthly = rollup_up(
            rollup_up(rollup_hourly_salted(t0, 16), "daily"), "monthly"
        )
        _noop(tier_view(monthly, "monthly"))

    _timed(job)  # warm-up (JIT, code cache, page cache)
    wall = min(_timed(job)[0] for _ in range(3))
    return {"turns": n, "wall_s": round(wall, 3), "thr": round(n / wall)}


def run_scaling(sf_dir: str, levels=(2, 8), trials=SCALE_TRIALS) -> dict:
    """Same job, same input, two parallelism levels in separate JVMs
    (driver-sanctioned substitute for N vs 4N executors — BASELINE.md;
    mirrors two spark-submit launches).

    The sandbox is a Firecracker microVM with heavy, bursty host CPU steal
    (identical runs vary 3-5x). Protocol: interleave `trials` fresh-JVM runs
    per level (A,B,A,B,...), each internally best-of-3, and score each level
    by its best trial — best-of sampling approximates the uncontended
    hardware both levels would see on a dedicated cluster."""
    import shutil
    import subprocess
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    table_path = os.path.join(base, "bench_scale_t0.parquet")
    trials_out = {c: [] for c in levels}
    for _ in range(trials):
        for cpus in levels:
            cmd = [sys.executable, os.path.abspath(__file__), "--scale-worker",
                   str(cpus), "--table-path", table_path]
            if shutil.which("taskset"):
                # pin the WHOLE JVM to n cores — local[n] only bounds task
                # slots; GC/shuffle/IO helper threads would otherwise spill
                # onto all 32 cores and fake the small-cluster number
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True, cwd=REPO,
            )
            trials_out[cpus].append(
                json.loads(out.stdout.strip().splitlines()[-1])
            )
    lo, hi = levels
    results = {c: max(ts, key=lambda r: r["thr"]) for c, ts in trials_out.items()}
    eff = (results[hi]["thr"] / results[lo]["thr"]) / (hi / lo)
    return {
        "runs": results,
        "trials": {str(c): [r["thr"] for r in ts] for c, ts in trials_out.items()},
        "levels": list(levels),
        "scaling_efficiency": round(eff, 3),
    }


def write_baseline_md(scal: dict, bench: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # keep the measurement-history narrative across regenerations — the
    # variance story is evidence, not boilerplate
    history = ""
    prev = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(prev):
        old = open(prev).read()
        marker = "## Measurement history"
        if marker in old:
            history = "\n" + old[old.index(marker):].rstrip() + "\n"
    lo, hi = scal["levels"]
    rlo, rhi = scal["runs"][lo], scal["runs"][hi]
    lines = [
        "# BENCH/BASELINE — measured results",
        "",
        "Protocol: same tier-pipeline job (parquet scan -> salted hourly",
        "rollup -> daily -> monthly composition, noop sink), same",
        "deterministic synthetic input, two parallelism levels in separate",
        f"taskset-pinned JVMs (local[{lo}] on {lo} cores vs local[{hi}] on",
        f"{hi} cores — the sandbox substitute for N vs 4N executors via",
        "spark-submit --py-files engine.zip; BASELINE.md).",
        "",
        "Host-noise control: this sandbox is a Firecracker microVM with",
        "bursty CPU steal — identical runs vary 3-5x. Each level runs",
        f"{len(scal['trials'][str(lo)])} interleaved fresh-JVM trials (each",
        "internally warm-up + best-of-3); the level's score is its best",
        "trial, approximating the uncontended hardware a dedicated cluster",
        "would provide at both sizes. All trial throughputs are listed so",
        "the variance is visible.",
        "",
        "| run | input turns | parallelism | wall s | turns/sec | scaling eff |",
        "|---|---|---|---|---|---|",
        f"| pipeline-full | {rlo['turns']} | local[{lo}] pinned {lo}c | {rlo['wall_s']} | {rlo['thr']} | (base) |",
        f"| pipeline-full | {rhi['turns']} | local[{hi}] pinned {hi}c | {rhi['wall_s']} | {rhi['thr']} | {scal['scaling_efficiency']} |",
        "",
        f"Scaling efficiency (thr{hi}/thr{lo})/{hi // lo} = "
        f"**{scal['scaling_efficiency']}** (target ≥ 0.8 on a real cluster).",
        "",
        f"Per-trial turns/sec: local[{lo}] = {scal['trials'][str(lo)]}, "
        f"local[{hi}] = {scal['trials'][str(hi)]}.",
        "",
        "## Headline query timings (sf0.1 driver tables + synthetic stages)",
        "",
        "```json",
        json.dumps(bench, indent=2),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n" + history)


#: sf1 relational subset (VERDICT r4 item 4): at sf0.1 most relational rows
#: sit at 0.3-1.2s — inside single-stage steal noise — so the 2× gate needs
#: a bigger input to mean anything. `--sf1` deterministically upsamples the
#: sf0.1 fact tables 10× (6M lineitem) and times these with the same
#: min-of-N protocol.
SF1_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "window_topk_orders",
    "region_nation_rollup",
    "semi_join_customers",
    "running_revenue",
]


def make_sf1(spark, src_dir: str, dst_dir: str) -> None:
    """Deterministic 10× upsample of the sf0.1 relational tables: each copy
    i offsets every key column by i·(max_key+1), so join fan-out, group
    cardinalities, and window partition counts all scale with the data
    (pure row duplication without key offsets would just deepen per-key
    skew). Dimension tables are carried over unchanged — dims are dims.
    Content is a pure function of the source tables: no RNG anywhere."""
    if os.path.exists(os.path.join(dst_dir, "_DONE")):
        return
    os.makedirs(dst_dir, exist_ok=True)
    from pyspark.sql import functions as F

    rep = F.broadcast(
        spark.range(10).select(F.col("id").alias("_rep"))
    )
    fact_keys = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
    }
    for t in ["region", "nation", "supplier", "part", "events",
              "documents", "embeddings"]:
        src = os.path.join(src_dir, f"{t}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                os.path.join(dst_dir, f"{t}.parquet")
            )
    for t, keys in fact_keys.items():
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        offs = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        out = df.crossJoin(rep)
        for k, off in offs.items():
            out = out.withColumn(k, F.col(k) + F.col("_rep") * F.lit(off))
        out.drop("_rep").write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{t}.parquet")
        )
    with open(os.path.join(dst_dir, "_DONE"), "w") as f:
        f.write("ok")


def run_sf1(src_dir: str, cpus: int) -> dict:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    sf1_dir = os.path.join(base, "bench_sf1")
    spark = build_session(cpus, app="bench-sf1")
    make_sf1(spark, src_dir, sf1_dir)
    import __spark_entry__ as entry

    qs = entry.queries()
    timings = {}
    for name in SF1_QUERIES:
        timings[f"sf1_{name}"] = round(
            min(
                _timed(lambda n=name: _noop(qs[n](spark, sf1_dir)))[0]
                for _ in range(BENCH_STAGE_TRIALS)
            ),
            3,
        )
    return {
        "metric": "sf1_relational_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "loadavg": open("/proc/loadavg").read().split()[:3],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", action="store_true",
                    help="time the relational subset on a deterministic 10x "
                         "upsample of --sf-dir (6M-row lineitem)")
    ap.add_argument("--scaling", action="store_true",
                    help="two-parallelism scaling evidence -> BENCH/BASELINE.md")
    ap.add_argument("--scaling-only", action="store_true",
                    help="scaling protocol alone (no headline bench, no "
                         "BASELINE.md rewrite) — cheap repeated window "
                         "attempts on a steal-prone host")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--levels", default="2,8",
                    help="N,4N parallelism pair for --scaling (cores); "
                         "pick a pair the host can back with real cores")
    ap.add_argument("--trials", type=int, default=SCALE_TRIALS,
                    help="interleaved fresh-JVM trials per level")
    ap.add_argument("--scale-worker", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--table-path", default="/tmp/bench_scale_t0.parquet",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.scale_worker:
        print(json.dumps(scale_worker(args.scale_worker, args.table_path)))
        return
    if args.sf1:
        print(json.dumps(run_sf1(args.sf_dir, args.cpus)))
        return
    if args.scaling_only:
        levels = tuple(int(x) for x in args.levels.split(","))
        print(json.dumps(run_scaling(args.sf_dir, levels=levels,
                                     trials=args.trials)))
        return
    if args.scaling:
        levels = tuple(int(x) for x in args.levels.split(","))
        scal = run_scaling(args.sf_dir, levels=levels, trials=args.trials)
        # fresh session for the headline run after scaling stopped its own
        bench = run_bench(args.sf_dir, args.cpus)
        write_baseline_md(scal, bench)
        bench["scaling"] = scal
        print(json.dumps(bench))
    else:
        print(json.dumps(run_bench(args.sf_dir, args.cpus)))


if __name__ == "__main__":
    main()
