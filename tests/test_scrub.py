"""M79 boilerplate stripping + M80 pattern redaction goldens."""

import pytest
from pyspark.sql import functions as F

from engine.scrub import DEFAULT_PATTERNS, redact_patterns, strip_boilerplate


def _frame(spark):
    # 'sys' appears in 3 distinct convs (boilerplate at min_keys=3);
    # 'hi' appears in 2 convs (kept at min_keys=3); per-conv repeats of a
    # text count ONCE toward the distinct-key frequency.
    rows = [
        ("a", 0, "sys"),
        ("a", 1, "hi"),
        ("a", 2, "sys"),
        ("a", 3, "body-a"),
        ("b", 0, "sys"),
        ("b", 1, "hi"),
        ("b", 2, "body-b"),
        ("c", 0, "sys"),
        ("c", 1, "body-c"),
    ]
    return spark.createDataFrame(rows, "k string, i int, text string")


def test_strip_boilerplate_threshold_and_reindex(spark):
    out = strip_boilerplate(_frame(spark), "k", ["i"], "text", min_keys=3)
    got = {
        (r.k, r.new_idx): r.text
        for r in out.select("k", "new_idx", "text").collect()
    }
    # every 'sys' row gone (incl. conv a's duplicate), survivors dense + ordered
    assert got == {
        ("a", 0): "hi",
        ("a", 1): "body-a",
        ("b", 0): "hi",
        ("b", 1): "body-b",
        ("c", 0): "body-c",
    }


def test_strip_boilerplate_distinct_key_not_row_count(spark):
    # 'hi' has 2 distinct convs but 2 rows in conv a would make 3 ROWS:
    # row-count semantics would wrongly flag it at min_keys=3.
    rows = [
        ("a", 0, "hi"),
        ("a", 1, "hi"),
        ("b", 0, "hi"),
        ("c", 0, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, i int, text string")
    out = strip_boilerplate(df, "k", ["i"], "text", min_keys=3)
    assert out.filter(F.col("text") == "hi").count() == 3


def test_strip_boilerplate_broadcast_parity_and_validation(spark):
    df = _frame(spark)
    a = strip_boilerplate(df, "k", ["i"], "text", 3, broadcast_flagged=True)
    b = strip_boilerplate(df, "k", ["i"], "text", 3, broadcast_flagged=False)
    key = lambda r: (r.k, r.new_idx, r.text)  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
    with pytest.raises(ValueError, match="min_keys"):
        strip_boilerplate(df, "k", ["i"], "text", 1)


def test_redact_patterns_goldens(spark):
    rows = [
        (0, "mail me at bob.smith+x@corp.example.org today"),
        (1, "ssn 123-45-6789 and card 12345678901234"),
        (2, "nothing sensitive here 123-45 12345"),
        (3, "two mails a@b.co c@d.io and ref 9876543"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in redact_patterns(df, "text").collect()}
    assert out[0].n_email == 1 and out[0].redacted == "mail me at <EMAIL> today"
    # ssn replaced BEFORE longnum; the 14-digit card is a single <NUM>
    assert (out[1].n_ssn, out[1].n_longnum) == (1, 1)
    assert out[1].redacted == "ssn <SSN> and card <NUM>"
    # short digit runs and dashed fragments untouched
    assert out[2].redacted == rows[2][1]
    assert (out[2].n_email, out[2].n_ssn, out[2].n_longnum) == (0, 0, 0)
    assert out[3].n_email == 2
    assert out[3].redacted == "two mails <EMAIL> <EMAIL> and ref <NUM>"


def test_redact_counts_are_preplacement_audit(spark):
    # an SSN-shaped span inside a longer string still counts as ssn even
    # though the email rule ran first and rewrote other spans
    df = spark.createDataFrame(
        [(0, "x@y.zz 111-22-3333 x@y.zz")], "doc_id int, text string"
    )
    r = redact_patterns(df, "text").collect()[0]
    assert (r.n_email, r.n_ssn, r.n_longnum) == (2, 1, 0)
    assert r.redacted == "<EMAIL> <SSN> <EMAIL>"
    assert set(DEFAULT_PATTERNS) == {"email", "ssn", "longnum"}
