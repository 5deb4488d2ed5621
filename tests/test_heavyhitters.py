"""Bounded heavy-hitters tier state (engine/heavyhitters.py): Misra–Gries
mergeable-summary guarantees across hourly→daily→monthly composition —
exact-regime equality with freq_cols, truncating-regime error bounds,
determinism, and serving."""

import sys
from datetime import datetime, timedelta
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.heavyhitters import (  # noqa: E402
    hh_error_bound,
    hh_topk,
    mg_truncate,
)
from engine.rollup import build_tiers  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

CAP = 8


def _mg_reference(counts: dict, cap: int) -> dict:
    """Literal Misra–Gries reduction: subtract the (cap+1)-th largest count
    from every entry, drop non-positives."""
    if len(counts) <= cap:
        return dict(counts)
    d = sorted(counts.values(), reverse=True)[cap]
    return {k: v - d for k, v in counts.items() if v - d > 0}


def test_mg_truncate_matches_reference(spark):
    cases = [
        {},
        {"a": 5},
        {chr(97 + i): i + 1 for i in range(CAP)},          # exactly cap
        {chr(97 + i): i + 1 for i in range(CAP + 1)},      # one over
        {f"v{i}": (i % 3) + 1 for i in range(40)},         # heavy ties
        {f"v{i}": 1000 if i < 2 else 1 for i in range(30)},  # hot + tail
    ]
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(cases)], "id int, m map<string,long>"
    )
    got = {
        r["id"]: dict(r["t"])
        for r in df.select("id", mg_truncate("m", CAP).alias("t")).collect()
    }
    for i, m in enumerate(cases):
        assert got[i] == _mg_reference(m, CAP), f"case {i}"
        assert len(got[i]) <= CAP


@pytest.fixture(scope="module")
def hh_fixture(spark):
    """A t0 whose `role` column is high-cardinality and Zipf-hot: 3 hot
    values plus a long tail, spread over 3 conversations × ~40 days so the
    monthly merge folds many hourly maps (truncation fires at every tier)."""
    base = datetime(2024, 1, 1)
    rows = []
    rng_state = 1234567
    for i in range(12000):
        rng_state = (rng_state * 1103515245 + 12345) % (2**31)
        r = rng_state
        conv = f"conv-{r % 3}"
        if r % 10 < 6:
            val = f"hot-{r % 3}"           # 60% mass on 3 values
        else:
            val = f"tail-{(r // 16) % 400}"  # long tail, ~400 distinct
        ts = base + timedelta(minutes=(i * 7) % (40 * 24 * 60))
        rows.append((conv, i, val, "x" * (r % 20 + 1), None, ts))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def test_exact_regime_equals_freq_maps(spark):
    """cap ≥ per-bucket cardinality ⇒ no truncation ever fires and the hh
    map is entry-identical to the exact freq map at every tier — the
    regime the driver oracle pins with a full hash."""
    t0 = synth_transcripts(spark, n_convs=12, hot_turns=200)
    tiers = build_tiers(t0, freq_cols=["role"], hh_cols={"role": 32})
    for tier in ("hourly", "daily", "monthly"):
        rows = tiers[tier].select(
            F.sort_array(F.map_entries("role_freq")).alias("exact"),
            F.sort_array(F.map_entries("role_hh32")).alias("hh"),
            "role_hhn32",
        ).collect()
        assert rows
        for r in rows:
            assert r["exact"] == r["hh"], tier
            assert r["role_hhn32"] == sum(e["value"] for e in r["exact"])


def test_mg_bounds_hold_across_tiers(spark, hh_fixture):
    """Truncating regime: at every tier, for every (conv, bucket) —
    estimates undercount only, undercount ≤ (N−S)/(cap+1) (the bound
    computable from state alone), map ≤ cap entries, and every value with
    true count > N/(cap+1) is present (no false dismissal)."""
    tiers = build_tiers(hh_fixture, hh_cols={"role": CAP})
    truncated_somewhere = False
    for tier in ("hourly", "daily", "monthly"):
        unit = {"hourly": "hour", "daily": "day", "monthly": "month"}[tier]
        true = (
            hh_fixture.groupBy(
                "conv_id",
                F.date_trunc(unit, "ts").cast("timestamp_ntz").alias("bucket_start"),
                "role",
            )
            .count()
            .collect()
        )
        truth = {}
        for r in true:
            truth.setdefault((r["conv_id"], r["bucket_start"]), {})[r["role"]] = (
                r["count"]
            )
        state = tiers[tier].select(
            "conv_id",
            "bucket_start",
            F.map_entries(f"role_hh{CAP}").alias("entries"),
            f"role_hhn{CAP}",
            hh_error_bound("role", CAP).alias("err"),
        ).collect()
        assert state
        for r in state:
            key = (r["conv_id"], r["bucket_start"])
            t = truth[key]
            est = {e["key"]: e["value"] for e in r["entries"]}
            n = r[f"role_hhn{CAP}"]
            assert n == sum(t.values()), key
            assert len(est) <= CAP, key
            if len(t) > CAP:
                truncated_somewhere = True
            for v, e in est.items():
                assert v in t and e <= t[v], (tier, key, v)
            for v, tv in t.items():
                under = tv - est.get(v, 0)
                assert under <= r["err"], (tier, key, v, under, r["err"])
                assert under <= n / (CAP + 1) + 1e-9, (tier, key, v)
                if tv > n / (CAP + 1):
                    assert v in est, (tier, key, v, "false dismissal")
    assert truncated_somewhere, "fixture never exceeded cap — weak test"


def test_hh_state_deterministic_under_partitioning(spark, hh_fixture):
    """The merged summary is a pure function of the input multiset: exact
    union-add fold (order-independent) + one final truncation — so any
    repartitioning produces bit-identical maps."""
    def canon(t0):
        m = build_tiers(t0, hh_cols={"role": CAP})["monthly"]
        return sorted(
            str(r)
            for r in m.select(
                "conv_id",
                "bucket_start",
                F.sort_array(F.map_entries(f"role_hh{CAP}")).alias("e"),
                f"role_hhn{CAP}",
            ).collect()
        )

    a = canon(hh_fixture.repartition(2))
    b = canon(hh_fixture.repartition(32, "role"))
    assert a == b


def test_hh_topk_serving_bounds(spark, hh_fixture):
    """hh_topk: ≤ k rows per (conv, month); for every served value
    est ≤ true ≤ est + err_bound; the 3 planted hot values are always
    served (they exceed N/(cap+1) by construction)."""
    monthly = build_tiers(hh_fixture, hh_cols={"role": CAP})["monthly"]
    served = hh_topk(monthly, "role", CAP, 5).collect()
    true = {
        (r["conv_id"], r["bucket_start"], r["role"]): r["count"]
        for r in hh_fixture.groupBy(
            "conv_id",
            F.date_trunc("month", "ts").cast("timestamp_ntz").alias("bucket_start"),
            "role",
        )
        .count()
        .collect()
    }
    per_group = {}
    for r in served:
        key = (r["conv_id"], r["bucket_start"])
        per_group.setdefault(key, []).append(r)
        tv = true[(r["conv_id"], r["bucket_start"], r["value"])]
        assert r["est"] <= tv <= r["est"] + r["err_bound"], r
    for key, rows in per_group.items():
        assert len(rows) <= 5
        vals = {r["value"] for r in rows}
        hot = {v for (c, b, v) in true if (c, b) == key and v.startswith("hot-")}
        assert hot <= vals, (key, hot, vals)


def test_hh_densify_carry_smoke(spark):
    """Gap-filled hourly rows LOCF-carry the hh map + total like every
    other state column (densify must not null them)."""
    from engine.rollup import densify_hourly_locf, rollup_hourly

    rows = [
        ("c", 0, "user", "x", None, datetime(2024, 1, 1, 0, 5)),
        ("c", 1, "asst", "y", None, datetime(2024, 1, 1, 3, 5)),
    ]
    t0 = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    hourly = rollup_hourly(t0, hh_cols={"role": 4})
    dense = densify_hourly_locf(hourly)
    filled = dense.filter(F.col("filled")).collect()
    assert filled, "expected gap rows between hour 0 and hour 3"
    for r in filled:
        assert r["role_hh4"] == {"user": 1}
        assert r["role_hhn4"] == 1
