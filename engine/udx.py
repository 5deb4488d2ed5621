"""User-defined execution surfaces (SURVEY.md §2 K6/K7).

The engine's hot paths are built-ins on purpose — these exist as the
*extension seam* for semantics Spark lacks, demonstrated with exactly-
reproducible integer math so the DuckDB oracle hash-verifies them:

- K6 UDAF: an Arrow GROUPED_AGG pandas_udf (partial aggregation per Arrow
  batch group — not a row-at-a-time Python UDF). Custom aggregates plug in
  here when sum/min/max/count composition isn't enough.
- K7 UDTF: a Python UDTF (lateral table function) generating positional
  word shingles — the row-to-many-rows seam for tokenizers/chunkers that
  can't be expressed as array HOFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from .queries import _t, register


def sum_sq_udaf():
    """K6: integer sum of squares — exact under any grouping/batching, so
    the oracle check is a strict hash comparison, not a tolerance. Built
    lazily: pandas_udf parses its DDL schema against the ACTIVE session, so
    a module-level decorator would crash plain imports (NOTES.md trap)."""

    @pandas_udf("long")
    def _sum_sq(v: pd.Series) -> int:  # GROUPED_AGG: Series -> scalar
        v = v.astype("int64")
        return int((v * v).sum())

    return _sum_sq


@register(
    "udaf_token_sq_stats",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(length(text) AS BIGINT) * CAST(length(text) AS BIGINT))
                AS BIGINT) AS sum_sq_chars
    FROM documents GROUP BY lang
    """,
)
def udaf_token_sq_stats(spark, sf_dir):
    """K6 surface: per-language second moment of document length via a
    GROUPED_AGG pandas UDAF (Arrow-batched partial aggregation; the JVM
    still does the shuffle + final merge)."""
    d = _t(spark, sf_dir, "documents")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates in
    # one agg() — compute the built-in count separately and join (tiny dim)
    sq = d.groupBy("lang").agg(
        sum_sq_udaf()(F.length("text").cast("long")).alias("sum_sq_chars")
    )
    n = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return n.join(sq, "lang").select("lang", "n_docs", "sum_sq_chars")


class WordShingleUDTF:
    """K7: lateral table function — 3-word shingles with positions.
    (Expressible as array HOFs too; this registers the UDTF *surface* with
    a result the SQL oracle reproduces token-for-token.) Wrapped with
    udtf(...) lazily for the same session-at-import reason as the UDAF."""

    def eval(self, text: str):
        toks = [t for t in (text or "").split(" ") if t != ""]
        for i in range(max(0, len(toks) - 2)):
            yield i + 1, " ".join(toks[i : i + 3])


@register(
    "udtf_doc_shingles",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents WHERE doc_id < 30)
    SELECT doc_id, CAST(i + 1 AS INT) AS pos,
           toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS shingle
    FROM t, unnest(range(greatest(0, len(toks) - 2))) AS u(i)
    """,
)
def udtf_doc_shingles(spark, sf_dir):
    """K7 surface: positional shingles via a LATERAL Python UDTF join."""
    spark.udtf.register(
        "word_shingles", udtf(WordShingleUDTF, returnType="pos int, shingle string")
    )
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.shingle "
        "FROM _udtf_docs, LATERAL word_shingles(text) AS s"
    )
