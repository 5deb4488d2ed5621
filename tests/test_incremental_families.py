"""M90/M86 as MAINTAINED tables (VERDICT r4 item 7): the generalized
incremental sliding view (engine/incremental.py series_fn) must keep
sliding_corr and sliding_hh serving tables bit-equal to a full recompute
after late-data re-rolls, completing the trailing-window family."""

import sys
from datetime import datetime
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.incremental import IncrementalSlidingView  # noqa: E402
from engine.pipeline import TierPipeline  # noqa: E402
from engine.rollup import observed_state  # noqa: E402
from engine.sliding import sliding_corr, sliding_hh  # noqa: E402


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp_ntz",
    )


def _base_rows():
    # three days, several hours each, token counts varied so rolling corr
    # windows have >=2 buckets and nonzero variance on both sides
    rows = []
    idx = 0
    for d, h, n in [
        (1, 20, 1), (1, 21, 3), (1, 23, 2),
        (2, 0, 5), (2, 1, 1), (2, 4, 4),
        (3, 9, 2), (3, 10, 6),
    ]:
        for i in range(n):
            rows.append(
                (
                    "c",
                    idx,
                    ["user", "assistant", "tool"][i % 3],
                    "x" * (3 + (idx * 7) % 11),
                    "grep" if i % 3 == 2 else None,
                    datetime(2024, 1, d, h, 5 * i),
                )
            )
            idx += 1
    return rows


def _parity_cycle(spark, tmp_path, pipe_kwargs, series_fn, sort_cols, sub):
    base = _mk(spark, _base_rows())
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True, **pipe_kwargs)
    pipe.run(base, stages=("hourly",))
    view = IncrementalSlidingView(
        pipe, str(tmp_path / "sv"), window_hours=6, series_fn=series_fn
    )
    assert view.refresh()["mode"] == "full"

    def full():
        return (
            series_fn(observed_state(pipe.read_tier("hourly")))
            .toPandas()
            .sort_values(sort_cols, ignore_index=True)
        )

    f1 = full()
    got = view.read().toPandas().sort_values(sort_cols, ignore_index=True)
    pd.testing.assert_frame_equal(got[f1.columns], f1)

    # a late turn lands in the 23:xx hour of day 1: its re-roll must dirty
    # day 1 AND spill into day 2's first (window-1) hours
    late = _mk(
        spark, [("c", 999, "user", "y" * 13, None, datetime(2024, 1, 1, 23, 40))]
    )
    pipe.run(base.unionByName(late), stages=("hourly",))
    r = view.refresh()
    assert r["mode"] == "incremental"
    assert set(r["days"]) == {"2024-01-01", "2024-01-02"}
    f2 = full()
    got2 = view.read().toPandas().sort_values(sort_cols, ignore_index=True)
    pd.testing.assert_frame_equal(got2[f2.columns], f2)
    sub(f1, f2)
    # idempotent: nothing changed -> no-op refresh, table still equal
    assert view.refresh()["days"] == []
    got3 = view.read().toPandas().sort_values(sort_cols, ignore_index=True)
    pd.testing.assert_frame_equal(got3[f2.columns], f2)


def test_sliding_corr_view_parity_after_late_data(spark, tmp_path):
    def sub(f1, f2):
        # the late turn changed day-1/2 correlations somewhere
        j = f2[f2.bucket_start <= datetime(2024, 1, 2, 4)]
        assert len(j) > 0
        assert not f1.equals(f2)

    _parity_cycle(
        spark,
        tmp_path,
        {},
        lambda h: sliding_corr(h, "n_turns", "token_sum", 6),
        ["conv_id", "bucket_start"],
        sub,
    )


def test_sliding_hh_view_parity_after_late_data(spark, tmp_path):
    def sub(f1, f2):
        # day-2 spill bucket's trailing map now counts the late user turn
        j2 = f2[f2.bucket_start == datetime(2024, 1, 2, 0)]
        j1 = f1[f1.bucket_start == datetime(2024, 1, 2, 0)]
        assert j2.w_total.iloc[0] == j1.w_total.iloc[0] + 1

    _parity_cycle(
        spark,
        tmp_path,
        {"hh_cols": {"role": 8}},
        lambda h: sliding_hh(h, "role", 8, 6),
        ["conv_id", "bucket_start"],
        sub,
    )
