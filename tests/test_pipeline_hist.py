"""Exact mergeable histogram tier state (`hist_cols`) through the FULL
TierPipeline: bit-exact under salting and tier composition, carried by the
LOCF densifier, and enabled on an existing root as a one-time
fingerprint-gated migration (same schema-evolution story as sketch_cols,
but with exact state the fingerprint hashes raw)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import build_tiers, observed_state  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

SPEC = {"token_count": (0.0, 32.0, 8)}


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=30, hot_turns=200)
    df.cache().count()
    return df


def _hists(df, col="token_count_hist"):
    return {
        (r["conv_id"], r["bucket_start"]): tuple(r[col])
        for r in df.select("conv_id", "bucket_start", col).collect()
    }


def test_hist_composition_and_salting_bit_exact(spark, t0, tmp_path):
    """Pipeline (salted) == direct build_tiers (unsalted) == brute force
    from raw, at every tier — arrays compared exactly, no tolerance."""
    pipe = TierPipeline(
        spark, str(tmp_path / "h"), salted=True, hist_cols=SPEC
    )
    pipe.run(t0)
    direct = build_tiers(t0, hist_cols=SPEC)
    for tier in ("hourly", "daily", "monthly"):
        got = observed_state(pipe.read_tier(tier))
        assert _hists(got) == _hists(direct[tier]), tier

    # brute force: bin each raw turn, count per (conv, month)
    origin, width, k = SPEC["token_count"]
    monthly = _hists(pipe.read_tier("monthly"))
    b = F.least(
        F.greatest(
            F.floor((F.length("text") - F.lit(origin)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(k - 1),
    ).cast("int")
    raw = {
        (r["conv_id"], r["m"], r["b"]): r["n"]
        for r in t0.groupBy(
            "conv_id",
            F.date_trunc("month", "ts").cast("timestamp_ntz").alias("m"),
            b.alias("b"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for (conv, m), hist in monthly.items():
        for i, cnt in enumerate(hist):
            assert cnt == raw.get((conv, m, i), 0), (conv, m, i)
    assert sum(sum(h) for h in monthly.values()) == sum(raw.values())


def test_hist_locf_densify_carries_arrays(spark, t0, tmp_path):
    """Gap rows in the hourly tier copy the previous observed histogram
    array (state LOCF), flagged filled and excluded from upper tiers."""
    pipe = TierPipeline(spark, str(tmp_path / "f"), hist_cols=SPEC)
    pipe.run(t0, stages=("hourly",))
    hourly = pipe.read_tier("hourly")
    filled = hourly.filter(F.col("filled"))
    if filled.isEmpty():
        pytest.skip("synth produced no intra-day gaps")
    # every filled row's hist equals the latest earlier observed row's in
    # the same (conv, day)
    rows = hourly.select(
        "conv_id", "bucket_start", "filled", "token_count_hist"
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["conv_id"], []).append(r)
    checked = 0
    for conv, rs in by_key.items():
        rs.sort(key=lambda r: r["bucket_start"])
        last_obs = None
        for r in rs:
            if not r["filled"]:
                last_obs = r
            else:
                assert last_obs is not None
                assert last_obs["bucket_start"].date() == r["bucket_start"].date()
                assert list(r["token_count_hist"]) == list(
                    last_obs["token_count_hist"]
                )
                checked += 1
    assert checked > 0


def test_hist_enable_is_one_time_migration(spark, t0, tmp_path):
    """Turning hist_cols on over an existing root re-rolls hourly + the
    tier cascade exactly once; a second run is a full no-op; plain-mode
    history (no hist) is what the pre-migration tiers had."""
    root = str(tmp_path / "m")
    plain = TierPipeline(spark, root)
    plain.run(t0)
    assert "token_count_hist" not in plain.read_tier("hourly").columns

    mig = TierPipeline(spark, root, hist_cols=SPEC)
    res = mig.run(t0)
    assert res["stages"]["hourly"] > 0
    assert res["stages"]["daily"] > 0 and res["stages"]["monthly"] > 0
    for tier in ("hourly", "daily", "monthly"):
        assert "token_count_hist" in mig.read_tier(tier).columns, tier

    res2 = TierPipeline(spark, root, hist_cols=SPEC).run(t0)
    assert all(v == 0 for v in res2["stages"].values()), res2
    # and the non-hist state is unchanged by the migration
    direct = build_tiers(t0)
    got = {
        (r["conv_id"], r["bucket_start"]): r["n_turns"]
        for r in observed_state(mig.read_tier("monthly")).collect()
    }
    exp = {
        (r["conv_id"], r["bucket_start"]): r["n_turns"]
        for r in direct["monthly"].collect()
    }
    assert got == exp
