"""SQL DDL surface for continuous aggregates (engine/caggsql.py): a view
declared as SQL text compiles to the exact spec its dict-declared twin
uses (spec-token identical — adopting an existing partials table is a
noop, not a rebuild), the restricted grammar rejects everything the
mergeable algebra cannot maintain with a named error, and the
hierarchical `rollup()` idiom builds a child bit-identical to the direct
`parent.child(...)` declaration."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.cagg import ContinuousAggregate  # noqa: E402
from engine.caggsql import (  # noqa: E402
    CaggSQLError,
    create_continuous_aggregate,
    parse_cagg_sql,
)
from engine.pipeline import TierPipeline  # noqa: E402
from engine.synth import synth_transcripts  # noqa: E402

DDL = """
CREATE CONTINUOUS AGGREGATE weekly AS
SELECT date_trunc('week', bucket_start) AS week,
       substr(conv_id, length(conv_id), 1) AS cohort,
       sum(n_turns) AS turns,
       count(*) AS rows,
       count(token_min) AS tok_rows,
       min(token_min) AS min_tok,
       max(n_turns) AS peak,
       avg(n_turns) AS avg_turns,
       first(bucket_start, bucket_start) AS first_bucket,
       last(token_max, bucket_start) AS last_max
FROM hourly
GROUP BY week, cohort
"""

DICT_KEYS = {"week": "date_trunc('week', bucket_start)",
             "cohort": "substr(conv_id, length(conv_id), 1)"}
DICT_AGGS = {
    "turns": ("sum", "n_turns"),
    "rows": ("count",),
    "tok_rows": ("count", "token_min"),
    "min_tok": ("min", "token_min"),
    "peak": ("max", "n_turns"),
    "avg_turns": ("avg", "n_turns"),
    "first_bucket": ("first", "bucket_start", "bucket_start"),
    "last_max": ("last", "token_max", "bucket_start"),
}


@pytest.fixture(scope="module")
def t0(spark):
    df = synth_transcripts(spark, n_convs=24, hot_turns=120)
    df.cache().count()
    return df


def _frames_equal(a, b, keys):
    pd.testing.assert_frame_equal(
        a.toPandas().sort_values(keys, ignore_index=True)[sorted(a.columns)],
        b.toPandas().sort_values(keys, ignore_index=True)[sorted(b.columns)],
    )


# -- parsing ---------------------------------------------------------------

def test_parse_full_grammar():
    spec = parse_cagg_sql(DDL)
    assert spec["source"] == "hourly"
    assert spec["keys"] == DICT_KEYS
    assert spec["aggs"] == DICT_AGGS
    assert spec["filter"] is None


def test_parse_where_positional_group_by_and_bare_key():
    spec = parse_cagg_sql(
        "select conv_id, sum(n_turns) as t from hourly "
        "where token_min > 0 and substr(conv_id, 1, 4) = 'conv' group by 1"
    )
    assert spec["keys"] == {"conv_id": "conv_id"}
    assert spec["aggs"] == {"t": ("sum", "n_turns")}
    assert spec["filter"] == "token_min > 0 and substr(conv_id, 1, 4) = 'conv'"


def test_parse_sketch_and_state_kinds():
    spec = parse_cagg_sql(
        "SELECT conv_id, approx_distinct(cohort) AS ad,"
        " distinct_kmv(token_min, 64) AS dk,"
        " percentile_qsk(tok_qsk, 0.9) AS p90, twa(rate_twa) AS w"
        " FROM hourly GROUP BY conv_id"
    )
    assert spec["aggs"] == {
        "ad": ("approx_distinct", "cohort"),
        "dk": ("distinct_kmv", "token_min", 64),
        "p90": ("percentile_qsk", "tok_qsk", 0.9),
        "w": ("twa", "rate_twa"),
    }


def test_parse_keyword_lookalikes_stay_inside_expressions():
    """FROM/WHERE/GROUP BY inside string literals or nested calls must not
    split clauses; AS binds to the LAST top-level occurrence."""
    spec = parse_cagg_sql(
        "SELECT concat(cohort, ' from where group by ') AS k,"
        " sum(cast(n_turns AS bigint)) AS s"
        " FROM hourly GROUP BY k"
    )
    assert spec["keys"] == {"k": "concat(cohort, ' from where group by ')"}
    assert spec["aggs"] == {"s": ("sum", "cast(n_turns AS bigint)")}


@pytest.mark.parametrize(
    "sql, hint",
    [
        ("SELECT x FROM hourly", "GROUP BY"),
        ("SELECT sum(a) AS s FROM hourly GROUP BY s", "aggregates"),
        ("SELECT k, n_turns + 1 AS b FROM hourly GROUP BY k", "neither grouped"),
        ("SELECT k, median(x) AS m FROM hourly GROUP BY k", "not in the mergeable"),
        ("SELECT k, sum(a, b) AS s FROM hourly GROUP BY k", "argument"),
        ("SELECT k, sum(a) AS s FROM hourly GROUP BY 3", "out of range"),
        ("SELECT k, sum(a) AS s FROM hourly GROUP BY z", "does not name"),
        ("SELECT k, sum(a) AS k FROM hourly GROUP BY k", "duplicate"),
        ("SELECT k, rollup(t) AS t FROM hourly GROUP BY k", "PARENT VIEW"),
        ("SELECT k, sum(a) AS s FROM parent GROUP BY k", "rollup"),
        ("SELECT k, rollup(t) AS t FROM a, b GROUP BY k", "one table"),
        ("SELECT k, count(*) AS c GROUP BY k", "FROM"),
    ],
)
def test_parse_errors_name_the_problem(sql, hint):
    with pytest.raises(CaggSQLError, match=hint):
        parse_cagg_sql(sql)


# -- execution -------------------------------------------------------------

def test_sql_view_equals_dict_view_and_adopts_partials(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    dict_view = ContinuousAggregate(
        pipe, str(tmp_path / "v"), keys=DICT_KEYS, aggs=DICT_AGGS
    )
    assert dict_view.refresh()["mode"] == "full"
    sql_view = create_continuous_aggregate(pipe, str(tmp_path / "v"), DDL)
    # identical compiled spec -> same token -> the SQL twin adopts the
    # dict-declared partials without a rebuild
    assert sql_view.spec_token() == dict_view.spec_token()
    assert sql_view.refresh()["mode"] == "noop"
    _frames_equal(sql_view.read(), dict_view.read(), ["week", "cohort"])


def test_sql_where_filter_applies(spark, t0, tmp_path):
    pipe = TierPipeline(spark, str(tmp_path / "p"), snapshots=True)
    pipe.run(t0, stages=("hourly",))
    sql_view = create_continuous_aggregate(
        pipe, str(tmp_path / "vs"),
        "SELECT conv_id, sum(n_turns) AS turns FROM hourly "
        "WHERE substr(conv_id, length(conv_id), 1) < '5' GROUP BY conv_id",
    )
    sql_view.refresh()
    dict_view = ContinuousAggregate(
        pipe, str(tmp_path / "vd"), keys=["conv_id"],
        aggs={"turns": ("sum", "n_turns")},
        filter="substr(conv_id, length(conv_id), 1) < '5'",
    )
    dict_view.refresh()
    _frames_equal(sql_view.read(), dict_view.read(), ["conv_id"])
    got = {r.conv_id for r in sql_view.read().collect()}
    assert got and all(c[-1] < "5" for c in got)


def test_sql_hierarchical_rollup_child(spark, t0, tmp_path):
    pipe = TierPipeline(
        spark, str(tmp_path / "p"), snapshots=True, qsk_cols=["token_count"]
    )
    pipe.run(t0, stages=("hourly",))
    parent = create_continuous_aggregate(
        pipe, str(tmp_path / "vp"),
        "SELECT date_trunc('week', bucket_start) AS week,"
        " substr(conv_id, length(conv_id), 1) AS cohort,"
        " sum(n_turns) AS turns, count(*) AS hours,"
        " percentile_qsk(token_count_qsk, 0.5) AS p50"
        " FROM hourly GROUP BY 1, 2",
        versioned=True,
    )
    assert parent.aggs["p50"] == ("percentile_qsk", "token_count_qsk", 0.5)
    parent.refresh()
    sql_child = create_continuous_aggregate(
        pipe, str(tmp_path / "vc"),
        "SELECT cohort, rollup(turns) AS turns, rollup(hours) AS hours,"
        " rollup(p50, 0.99) AS p99"
        " FROM weekly_parent GROUP BY cohort",
        parents={"weekly_parent": parent},
    )
    sql_child.refresh()
    direct = parent.child(
        str(tmp_path / "vd"), keys={"cohort": "cohort"},
        aggs={"turns": "turns", "hours": "hours", "p99": ("p50", 0.99)},
    )
    direct.refresh()
    assert sql_child.spec_token() == direct.spec_token()
    _frames_equal(sql_child.read(), direct.read(), ["cohort"])

    with pytest.raises(CaggSQLError, match="parents"):
        create_continuous_aggregate(
            pipe, str(tmp_path / "vx"),
            "SELECT cohort, rollup(turns) AS t FROM nope GROUP BY cohort",
            parents={"weekly_parent": parent},
        )
