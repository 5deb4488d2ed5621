"""M76 correlated-pairs search: exact-parity vs a numpy brute force and the
candidate-selection bound."""

import sys
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine.correlate import corr_pairs_topk  # noqa: E402

LO, HI = datetime(2024, 1, 1), datetime(2024, 2, 1)


def _state(spark, series: dict[str, dict[int, int]]):
    """Build a minimal daily-tier-shaped frame: conv_id, bucket_start,
    token_sum (+ the filled marker observed_state strips on)."""
    rows = [
        (conv, LO + timedelta(days=d), int(v))
        for conv, days in series.items()
        for d, v in days.items()
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket_start timestamp, token_sum long"
    ).withColumn("filled", F.lit(False))


def test_corr_matches_numpy_brute_force(spark):
    rng = np.random.default_rng(7)
    series = {
        f"c{i:02d}": {d: int(rng.integers(1, 200)) for d in range(20)}
        for i in range(6)
    }
    # a strongly correlated pair: c06 tracks c00 with slope 2
    series["c06"] = {d: 2 * v + 3 for d, v in series["c00"].items()}
    st = _state(spark, series)
    got = {
        (r.conv_a, r.conv_b): (r.n_common, r.corr)
        for r in corr_pairs_topk(st, LO, HI, top_series=10, min_overlap=5, k=100).collect()
    }
    convs = sorted(series)
    for i, ca in enumerate(convs):
        for cb in convs[i + 1 :]:
            common = sorted(set(series[ca]) & set(series[cb]))
            if len(common) < 5:
                assert (ca, cb) not in got
                continue
            x = np.array([series[ca][d] for d in common], dtype=float)
            y = np.array([series[cb][d] for d in common], dtype=float)
            if x.std() == 0 or y.std() == 0:
                assert (ca, cb) not in got
                continue
            n, corr = got[(ca, cb)]
            assert n == len(common)
            assert abs(corr - np.corrcoef(x, y)[0, 1]) < 1e-12, (ca, cb)
    # the planted linear pair is +1 (to closed-form rounding) and tops |r|
    assert abs(got[("c00", "c06")][1] - 1.0) < 1e-12
    assert got[("c00", "c06")][1] == max(abs(c) for _, c in got.values())


def test_candidate_selection_bounds_pair_space(spark):
    # 5 series; top_series=3 by volume keeps only c2,c3,c4 — no pair may
    # mention c0 or c1 even though they correlate perfectly.
    series = {f"c{i}": {d: (i + 1) * (d + 1) for d in range(15)} for i in range(5)}
    st = _state(spark, series)
    out = corr_pairs_topk(st, LO, HI, top_series=3, min_overlap=5, k=100).collect()
    names = {r.conv_a for r in out} | {r.conv_b for r in out}
    assert names == {"c2", "c3", "c4"}
    assert len(out) == 3  # C(3,2)


def test_zero_variance_and_low_overlap_excluded(spark):
    series = {
        "flat": {d: 50 for d in range(15)},
        "ramp": {d: d + 1 for d in range(15)},
        "brief": {0: 5, 1: 9},  # only 2 common buckets
    }
    st = _state(spark, series)
    out = corr_pairs_topk(st, LO, HI, top_series=10, min_overlap=5, k=100).collect()
    assert out == []  # flat excluded by variance, brief by overlap
