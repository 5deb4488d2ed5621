"""Driver-contract parity: entry() smoke + every queries() entry vs its
DuckDB oracle at sf0.001 (the driver repeats this at sf0.01)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import assert_frames_match, duck_run  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert "turn_rate_mean" in df.columns


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert spark_pdf.shape[0] >= 0  # rows-only check, mirrors driver
        return
    duck_pdf = duck_run(SF_DIR, sql)
    assert_frames_match(spark_pdf, duck_pdf, name)
