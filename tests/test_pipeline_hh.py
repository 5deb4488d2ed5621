"""Bounded heavy-hitter tier state (`hh_cols`) through the FULL
TierPipeline: bit-identical under salting (the fine-keyed pre-agg is
salt-proof and the MG merge is a pure function of the input multiset),
composed across two tier-ups, enable-as-migration, and riding the full
mode stack. The truncating-regime MG guarantees themselves are pinned in
tests/test_heavyhitters.py; here `cap` is chosen BELOW the fixture's tool
cardinality on hot buckets so truncation genuinely fires inside the
pipeline."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import build_tiers, observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

CAP = 2  # below tool cardinality on busy buckets => truncation fires


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=30, hot_turns=200)
    df.cache().count()
    return df


def _hh(df, col=f"tool_hh{CAP}", ncol=f"tool_hhn{CAP}"):
    return {
        (r["conv_id"], r["bucket_start"]): (
            tuple(sorted(r[col].items())) if r[col] is not None else None,
            r[ncol],
        )
        for r in df.select("conv_id", "bucket_start", col, ncol).collect()
    }


def test_hh_salted_pipeline_equals_direct(spark, t0, tmp_path):
    """Pipeline (salted) == direct build_tiers (unsalted) at every tier,
    entry-for-entry — the MG state is deterministic, so salting must be
    invisible. Truncation is asserted live (some map smaller than the
    bucket's distinct tools)."""
    pipe = TierPipeline(
        spark, str(tmp_path / "h"), salted=True, hh_cols={"tool": CAP}
    )
    pipe.run(t0)
    direct = build_tiers(t0, hh_cols={"tool": CAP})
    truncated = False
    distinct_m = {
        (r["conv_id"], r["b"]): r["d"]
        for r in t0.filter(F.col("tool").isNotNull())
        .groupBy(
            "conv_id",
            F.date_trunc("month", "ts").cast("timestamp_ntz").alias("b"),
        )
        .agg(F.count_distinct("tool").alias("d"))
        .collect()
    }
    for tier in ("hourly", "daily", "monthly"):
        got = _hh(observed_state(pipe.read_tier(tier)))
        exp = _hh(direct[tier])
        assert None not in [v[0] for v in got.values()], tier
        assert got == exp, tier
    for k, (entries, _n) in _hh(direct["monthly"]).items():
        if distinct_m.get(k, 0) > len(entries):
            truncated = True
    assert truncated, "cap never binding — raise fixture cardinality"


def test_hh_enable_is_one_time_migration(spark, t0, tmp_path):
    root = str(tmp_path / "m")
    TierPipeline(spark, root).run(t0)
    mig = TierPipeline(spark, root, hh_cols={"tool": CAP})
    res = mig.run(t0)
    assert all(res["stages"][s] > 0 for s in ("hourly", "daily", "monthly"))
    for tier in ("hourly", "daily", "monthly"):
        cols = mig.read_tier(tier).columns
        assert f"tool_hh{CAP}" in cols and f"tool_hhn{CAP}" in cols, tier
    res2 = TierPipeline(spark, root, hh_cols={"tool": CAP}).run(t0)
    assert all(v == 0 for v in res2["stages"].values()), res2


def test_hh_composes_with_mode_stack(spark, t0, tmp_path):
    """hh state rides salted × snapshots × WAP; equals the plain+hh
    reference at every tier."""
    pipe = TierPipeline(
        spark,
        str(tmp_path / "s"),
        salted=True,
        snapshots=True,
        wap=True,
        hh_cols={"tool": CAP},
    )
    pipe.run(t0)
    ref = TierPipeline(spark, str(tmp_path / "r"), hh_cols={"tool": CAP})
    ref.run(t0)
    for tier in ("hourly", "daily", "monthly"):
        assert _hh(observed_state(pipe.read_tier(tier))) == _hh(
            observed_state(ref.read_tier(tier))
        ), tier
