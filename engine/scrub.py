"""Content-hygiene scrubbing for training corpora (SURVEY.md §2 M79-M80).

Two transforms every LLM data pipeline runs before training:

- **Boilerplate stripping** (M79): text that recurs near-verbatim across
  many independent conversations/documents (system prompts, canned
  greetings, headers/footers, cookie banners) teaches the model nothing
  and skews token statistics. `strip_boilerplate` flags any text whose
  distinct-key document frequency crosses a threshold and removes those
  rows, reindexing the survivors so downstream consumers still see dense
  turn indices.

- **Pattern redaction** (M80): PII-shaped spans (emails, long digit runs,
  SSN-shaped triples) are replaced with typed placeholder tokens and the
  per-pattern hit counts are kept for audit. `redact_patterns` is pure
  `regexp_replace`/`regexp_count` column algebra — JVM-side, zero shuffle,
  no UDF — and the pattern set is restricted to RE2-compatible syntax so
  the exact same regex runs on Spark (Java regex) and the DuckDB oracle.

Scale shape: boilerplate detection is one partial+final aggregate over
(text, key) plus an anti-join against the flagged set; the flagged set is
small by construction (a text needs document frequency >= min_keys to
qualify, so its size is bounded by total_rows / min_keys) and broadcasts.
Redaction is embarrassingly parallel row-local work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import io as eio
from .queries import _t, register

# RE2-compatible (no backreferences, no lookaround) so Spark's Java regex
# and DuckDB's RE2 count/replace the same non-overlapping spans.
DEFAULT_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    "longnum": (r"\d{7,}", "<NUM>"),
}


def strip_boilerplate(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    text_col: str,
    min_keys: int,
    broadcast_flagged: bool = True,
) -> DataFrame:
    """M79: drop rows whose `text_col` value appears in >= `min_keys`
    distinct `key_col` groups, then reindex the survivors per key.

    Returns the surviving rows with a dense `new_idx` (0-based, ordered by
    `order_cols` within each key). Detection is exact: one two-phase
    aggregate computes per-text distinct-key counts (partial aggregation
    applies — the (text, key) pairs combine map-side), and the flagged set
    joins back as a left-anti. With `broadcast_flagged` (default) the
    flagged texts broadcast — sound because a flagged text needs document
    frequency >= min_keys, bounding the set at total_rows / min_keys; pass
    False to force a shuffled anti-join when min_keys is tiny relative to
    the corpus.
    """
    if min_keys < 2:
        raise ValueError(f"min_keys must be >= 2, got {min_keys}")
    flagged = (
        df.groupBy(text_col)
        .agg(F.countDistinct(key_col).alias("_nk"))
        .filter(F.col("_nk") >= F.lit(min_keys))
        .select(text_col)
    )
    if broadcast_flagged:
        flagged = F.broadcast(flagged)
    kept = df.join(flagged, on=text_col, how="left_anti")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return kept.withColumn("new_idx", (F.row_number().over(w) - 1).cast("int"))


def redact_patterns(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """M80: replace every match of each named pattern with its placeholder
    and record per-pattern hit counts (`n_<name>` columns) plus the fully
    redacted text (`redacted`).

    Counts are taken against the ORIGINAL text per pattern (audit
    semantics: how many emails did this doc contain), while replacements
    apply sequentially in dict order to produce `redacted` — order matters
    when patterns overlap (e.g. an SSN is also a digit run), so the
    default dict places the more specific pattern first. Pure column
    expressions: whole-stage codegen, no shuffle, no Python.
    """
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    out = df
    red = F.col(text_col)
    for name, (rx, token) in pats.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(rx))
        )
        red = F.regexp_replace(red, rx, token)
    return out.withColumn("redacted", red)


@register(
    "strip_boilerplate_turns",
    """
    WITH t AS (
      SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
             props AS text, event_type AS role, ts, event_id
      FROM events),
    flagged AS (
      SELECT text FROM t GROUP BY text
      HAVING COUNT(DISTINCT conv_id) >= 60)
    SELECT conv_id,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY ts, event_id) - 1 AS INT)
             AS new_turn_idx,
           role, text
    FROM t ANTI JOIN flagged USING (text)
    ORDER BY conv_id, new_turn_idx
    """,
)
def strip_boilerplate_turns(spark, sf_dir):
    """M79 boilerplate-turn stripping over the events-derived transcripts:
    texts seen in >= 60 distinct conversations are canned boilerplate;
    surviving turns keep their relative order under a dense reindex. The
    kept rows themselves (conv, new index, role, text) sit under the
    full-hash gate, pinning both the flag threshold semantics and the
    reindex."""
    t0 = eio.transcripts_from_events(_t(spark, sf_dir, "events"))
    out = strip_boilerplate(
        t0, "conv_id", ["turn_idx"], "text", min_keys=60
    )
    return out.select(
        "conv_id",
        F.col("new_idx").alias("new_turn_idx"),
        "role",
        "text",
    ).orderBy("conv_id", "new_turn_idx")


@register(
    "redact_pii_docs",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail-' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com ref ' || CAST(1000000 + doc_id * 13 AS VARCHAR)
                  || CASE WHEN doc_id % 5 = 0
                          THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '\d{3}-\d{2}-\d{4}')) AS INT) AS n_ssn,
           CAST(len(regexp_extract_all(text, '\d{7,}')) AS INT) AS n_longnum,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
             '\d{7,}', '<NUM>', 'g') AS redacted
    FROM aug ORDER BY doc_id
    """,
)
def redact_pii_docs(spark, sf_dir):
    """M80 PII redaction under the full-hash gate: the documents fixture
    carries no PII, so the query plants deterministic doc_id-derived
    emails / reference numbers / SSN-shaped spans (same expression in the
    oracle), then redacts with the shared RE2-compatible pattern set.
    Both the audit counts and the redacted text hash-match, pinning
    non-overlapping replacement semantics across engines. Note the
    replacement ORDER (email, ssn, longnum): the email rule must run
    before <NUM> eats its digit run, and ssn before longnum is the
    specific-before-general rule the module docstring calls out."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail-"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com ref "),
            (F.lit(1000000) + F.col("doc_id") * 13).cast("string"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = redact_patterns(d, "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ssn").cast("int").alias("n_ssn"),
        F.col("n_longnum").cast("int").alias("n_longnum"),
        "redacted",
    ).orderBy("doc_id")
