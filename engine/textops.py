"""Training-data text operators over the `documents` table: exact dedup,
quality scoring, language-ID heuristic, fingerprinting, MinHash signatures,
n-gram Jaccard, SimHash — each driver-verified against a DuckDB oracle.

Portability design: token ids are a *content-derived* polynomial char hash
((acc·131 + codepoint) mod 1e9+7) that Spark (array fold over split chars)
and DuckDB (list_reduce) compute bit-identically. Unlike a dense_rank token
dictionary there is NO global structure to build — no partition-less window,
no dictionary join, no single-reducer exchange — so the registered queries
ARE the 100-TB plan: cost O(total chars), embarrassingly parallel, one
shuffle for the per-doc aggregate. In production you'd swap the hash for
xxhash64(w) (same shape, cheaper); the shingle-level xxhash64 MinHash+LSH
path is exercised in tests/test_textops_engine.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# shared token helpers (Spark side)
# ---------------------------------------------------------------------------

_TOKHASH_P = 1000000007


def _tokens_col(text_col="text"):
    """Non-empty whitespace-split tokens as an array column."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def tok_hash(col) -> F.Column:
    """Portable token id: left-fold polynomial char hash mod 1e9+7.
    Deterministic, dictionary-free (the scale property) and reproducible in
    DuckDB via list_reduce (see _TOKHASH_SQL) for full oracle hash checks."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda a, c: (a * 131 + F.ascii(c)) % _TOKHASH_P,
    )


def _tokhash_sql(c: str) -> str:
    """DuckDB expression computing tok_hash() bit-identically."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(length({c})), i -> CAST(ascii({c}[i+1]) AS BIGINT))), "
        f"(a, b) -> (a * 131 + b) % {_TOKHASH_P})"
    )


def doc_tokens(docs: DataFrame, max_doc: int | None = None) -> DataFrame:
    d = docs if max_doc is None else docs.filter(F.col("doc_id") < max_doc)
    return d.select("doc_id", F.explode(_tokens_col()).alias("w"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_docs",
    """
    SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies,
           MIN(n_chars) AS n_chars
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup: hash-groupBy on content (one shuffle on the md5 key;
    at 100 TB this is the standard first dedup pass)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
        F.min("n_chars").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# quality / language-ID / token stats
# ---------------------------------------------------------------------------

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"]


@register(
    "text_quality_scores",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             CAST(length(text) AS BIGINT) AS n_chars2
      FROM documents)
    SELECT doc_id, lang, source, n_chars2,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_word_len,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             * 1.0 / len(toks) AS avg_word_len,
           CAST(len(list_filter(toks, x -> x IN ({','.join(repr(w) for w in _STOPWORDS)})))
             AS BIGINT) AS n_stop,
           CAST(len(list_filter(toks, x -> x IN ({','.join(repr(w) for w in _STOPWORDS)})))
             AS BIGINT) * 1.0 / len(toks) AS stop_ratio
    FROM t WHERE len(toks) > 0
    """,
)
def text_quality_scores(spark, sf_dir):
    """Quality scoring: word count, mean word length, stopword ratio —
    the standard pre-training quality filters, all JVM-side array HOFs."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_col()
    stop = F.filter(toks, lambda x: x.isin(*_STOPWORDS))
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    out = d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars2"),
        F.size(toks).cast("long").alias("n_words"),
        sum_len.alias("sum_word_len"),
        F.size(stop).cast("long").alias("n_stop"),
    )
    return out.filter(F.col("n_words") > 0).select(
        "doc_id", "lang", "source", "n_chars2", "n_words", "sum_word_len",
        (F.col("sum_word_len") * 1.0 / F.col("n_words")).alias("avg_word_len"),
        "n_stop",
        (F.col("n_stop") * 1.0 / F.col("n_words")).alias("stop_ratio"),
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}


def _marker_sql(lang):
    return ",".join(repr(w) for w in _LANG_MARKERS[lang])


@register(
    "lang_id_heuristic",
    f"""
    WITH t AS (
      SELECT doc_id, lang AS labeled_lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, labeled_lang,
             CAST(len(list_filter(toks, x -> x IN ({_marker_sql('en')}))) AS BIGINT) AS c_en,
             CAST(len(list_filter(toks, x -> x IN ({_marker_sql('es')}))) AS BIGINT) AS c_es,
             CAST(len(list_filter(toks, x -> x IN ({_marker_sql('de')}))) AS BIGINT) AS c_de,
             CAST(len(list_filter(toks, x -> x IN ({_marker_sql('fr')}))) AS BIGINT) AS c_fr
      FROM t)
    SELECT doc_id, labeled_lang,
           CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'unknown'
                WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
                WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
                WHEN c_de >= c_fr THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM c
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Language-ID by stopword-marker counts (n-gram-free heuristic; the
    deterministic tie-break order en>es>de>fr matches the oracle CASE)."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_col()

    def _count_markers(markers):
        # nb: the lambda must take exactly one arg — F.filter treats a
        # second parameter as the element-index column
        return F.size(F.filter(toks, lambda x: x.isin(*markers))).cast("long")

    counts = {lang: _count_markers(m) for lang, m in _LANG_MARKERS.items()}
    c = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[v.alias(f"c_{k}") for k, v in counts.items()],
    )
    pred = (
        F.when(
            (F.col("c_en") == 0) & (F.col("c_es") == 0)
            & (F.col("c_de") == 0) & (F.col("c_fr") == 0),
            "unknown",
        )
        .when(
            (F.col("c_en") >= F.col("c_es"))
            & (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_fr")),
            "en",
        )
        .when((F.col("c_es") >= F.col("c_de")) & (F.col("c_es") >= F.col("c_fr")), "es")
        .when(F.col("c_de") >= F.col("c_fr"), "de")
        .otherwise("fr")
    )
    return c.select("doc_id", "labeled_lang", pred.alias("pred_lang"))


@register(
    "doc_fingerprint",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
             generate_subscripts(list_filter(string_split(text, ' '), x -> x <> ''), 1) AS pos
      FROM documents),
    tw AS (SELECT doc_id, pos, {_tokhash_sql('w')} AS tid FROM tok)
    SELECT doc_id,
           CAST(SUM((pos * tid) % 1000000007) % 1000000007 AS BIGINT) AS fingerprint,
           COUNT(*) AS n_tokens
    FROM tw GROUP BY doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Rolling position-weighted fingerprint over content-hashed token ids —
    order-sensitive document hash, fully distributed (no dictionary, no
    global window; one shuffle on doc_id)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(_tokens_col()).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    tw = tok.select("doc_id", "pos", tok_hash(F.col("w")).alias("tid"))
    # per-term mod keeps the running sum ANSI-overflow-safe at any doc size:
    # (Σ aᵢ) mod P == (Σ (aᵢ mod P)) mod P
    return tw.groupBy("doc_id").agg(
        (F.sum(F.pmod(F.col("pos") * F.col("tid"), F.lit(_TOKHASH_P))) % _TOKHASH_P)
        .alias("fingerprint"),
        F.count("*").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# near-dup: MinHash, n-gram Jaccard, SimHash
# ---------------------------------------------------------------------------

_N_PERMS = 8
_MH_PRIME = 2147483647


@register(
    "minhash_signatures",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    tw AS (SELECT doc_id, {_tokhash_sql('w')} AS tid FROM tok),
    perms AS (SELECT unnest(range({_N_PERMS})) AS p)
    SELECT doc_id, CAST(p AS INT) AS perm,
           CAST(MIN((1000003 * tid + 17 * (p + 1)) % {_MH_PRIME}) AS BIGINT) AS minhash
    FROM tw CROSS JOIN perms
    GROUP BY doc_id, p
    """,
)
def minhash_signatures(spark, sf_dir):
    """MinHash signatures (8 affine permutations over content-hashed token
    ids): the shingle→minhash half of MinHash-LSH dedup, fully distributed —
    per-token hash, broadcast of the 8-row perm table, one partial+final
    min-agg shuffle on doc_id. Banding/bucket-join is exercised engine-side
    in tests/test_textops_engine.py."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("w")).distinct()
    tw = tok.select("doc_id", tok_hash(F.col("w")).alias("tid"))
    perms = spark.range(_N_PERMS).select(F.col("id").alias("p"))
    return (
        tw.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", F.col("p").cast("int").alias("perm"))
        .agg(
            F.min(
                (1000003 * F.col("tid") + 17 * (F.col("p") + 1)) % _MH_PRIME
            ).alias("minhash")
        )
    )


@register(
    "ngram_jaccard_pairs",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents WHERE doc_id < 60),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(greatest(0, len(toks) - 2)),
                    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
      FROM t),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b, i.n_common,
           i.n_common * 1.0 / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
                 JOIN sizes sb ON sb.doc_id = i.doc_b
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Word-3-gram shingle Jaccard between document pairs (shingle equi-join,
    never an O(n²) nested loop; bounded here to doc_id<60 for the oracle)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = _tokens_col()
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(shingles).alias("shingle")).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("n_common") * 1.0 / (F.col("na") + F.col("nb") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
    )


_SIMHASH_BITS = 16
_MIX = 2654435761


@register(
    "simhash_docs",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    tw AS (SELECT doc_id, {_tokhash_sql('w')} AS tid FROM tok),
    bits AS (SELECT unnest(range({_SIMHASH_BITS})) AS b),
    contrib AS (
      SELECT doc_id, b,
             SUM(CASE WHEN ((tid * {_MIX}) >> CAST(b AS INT)) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM tw CROSS JOIN bits GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN 1 << CAST(b AS INT) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM contrib GROUP BY doc_id
    """,
)
def simhash_docs(spark, sf_dir):
    """16-bit SimHash over content-hashed token ids (sign-sum per bit
    plane) — dictionary-free, so the plan is two partial+final aggregates
    and a broadcast of the 16-row bit table; nothing global."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("w")).distinct()
    tw = tok.select("doc_id", tok_hash(F.col("w")).alias("tid"))
    bits = spark.range(_SIMHASH_BITS).select(F.col("id").alias("b"))
    # shiftright/shiftleft builtins take a Python-int bit count — shifting by
    # a *column* needs the SQL operators
    bit_expr = F.expr(f"((tid * {_MIX}) >> CAST(b AS INT)) & 1")
    contrib = (
        tw.crossJoin(F.broadcast(bits))
        .groupBy("doc_id", "b")
        .agg(F.sum(F.when(bit_expr == 1, 1).otherwise(-1)).alias("s"))
    )
    return contrib.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("1 << CAST(b AS INT)")).otherwise(0)
        )
        .cast("long")
        .alias("simhash")
    )


_LSH_ROWS = 2  # minhash rows per LSH band (8 perms -> 4 bands)


_NEARDUP_CTE = f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    tw AS (SELECT DISTINCT doc_id, {_tokhash_sql('w')} AS tid FROM tok),
    perms AS (SELECT unnest(range({_N_PERMS})) AS p),
    mh AS (
      SELECT doc_id, CAST(p AS INT) AS perm,
             CAST(MIN((1000003 * tid + 17 * (p + 1)) % {_MH_PRIME}) AS BIGINT) AS minhash
      FROM tw CROSS JOIN perms GROUP BY doc_id, p),
    bands AS (
      SELECT doc_id, perm // {_LSH_ROWS} AS band,
             CAST(SUM((minhash % 1000000007)
                  * CASE WHEN perm % {_LSH_ROWS} = 0 THEN 131 ELSE 1 END) AS BIGINT)
               AS band_key
      FROM mh GROUP BY doc_id, perm // {_LSH_ROWS}),
    bucket_min AS (
      SELECT band, band_key, MIN(doc_id) AS min_doc
      FROM bands GROUP BY band, band_key),
    star AS (
      SELECT m.min_doc AS doc_a, b.doc_id AS doc_b
      FROM bands b JOIN bucket_min m
        ON b.band = m.band AND b.band_key = m.band_key
      WHERE b.doc_id <> m.min_doc),
    chain AS (
      SELECT LAG(doc_id) OVER (PARTITION BY band, band_key ORDER BY doc_id)
               AS doc_a,
             doc_id AS doc_b
      FROM bands),
    cand AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT doc_a, doc_b FROM star
        UNION ALL
        SELECT doc_a, doc_b FROM chain WHERE doc_a IS NOT NULL)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tw GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c JOIN tw ta ON ta.doc_id = c.doc_a
                  JOIN tw tb ON tb.doc_id = c.doc_b AND tb.tid = ta.tid
      GROUP BY c.doc_a, c.doc_b),
    verified AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
                   JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= 0.5)"""


def _doc_token_ids(docs: DataFrame) -> DataFrame:
    """(doc_id, tid): distinct content-derived token hashes per doc."""
    tok = docs.select("doc_id", F.explode(_tokens_col()).alias("w")).distinct()
    return tok.select("doc_id", tok_hash(F.col("w")).alias("tid")).distinct()


_N_BANDS = 4  # _N_PERMS // _LSH_ROWS; literals live above their SQL twins


def _lsh_doc_rows(docs: DataFrame) -> DataFrame:
    """Fused per-doc LSH front-end: ONE Arrow pass computes, per document,
    the distinct token-id set, its size, and the banded minhash keys —
    replacing the explode → two distincts → perm crossJoin → two groupBys
    pipeline (four shuffles of the exploded token table) with a single
    narrow map (guide §2.3/§4.2). Returns one row per doc WITH ≥1 token:
    (doc_id, tids sorted array<long>, n long, band_keys array<long> indexed
    by band).

    Bit-exactness: the token hash is the same integer fold as tok_hash
    (Python ord == JVM ascii per code point — unicode-pinned in
    tests/test_textops_engine.py), minhash/band arithmetic is pure int64,
    and Python's split(' ') matches F.split(col, ' ') + non-empty filter.
    Equality of every derived table against the HOF reference pipeline is
    pytest-pinned."""
    import pandas as pd

    n_perms, rows_per_band, prime = _N_PERMS, _LSH_ROWS, _MH_PRIME

    def per_batch(it):
        memo: dict[str, int] = {}

        def th(w: str) -> int:
            h = memo.get(w)
            if h is None:
                h = 0
                for ch in w:
                    h = (h * 131 + ord(ch)) % _TOKHASH_P
                memo[w] = h
            return h

        for pdf in it:
            out_id, out_tids, out_n, out_bk = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                tids = sorted({th(w) for w in (text or "").split(" ") if w})
                if not tids:
                    continue
                mh = [
                    min((1000003 * t + 17 * (p + 1)) % prime for t in tids)
                    for p in range(n_perms)
                ]
                bks = [
                    sum(
                        (mh[b * rows_per_band + r] % 1000000007)
                        * (131 if r == 0 else 1)
                        for r in range(rows_per_band)
                    )
                    for b in range(n_perms // rows_per_band)
                ]
                out_id.append(doc_id)
                out_tids.append(tids)
                out_n.append(len(tids))
                out_bk.append(bks)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "tids": pd.Series(out_tids, dtype=object),
                    "n": pd.Series(out_n, dtype="int64"),
                    "band_keys": pd.Series(out_bk, dtype=object),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        per_batch,
        "doc_id bigint, tids array<bigint>, n bigint, band_keys array<bigint>",
    )


def _bands_from_rows(rows: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) exploded from the fused per-doc rows —
    identical rows to _minhash_bands(_doc_token_ids(docs))."""
    return rows.select(
        "doc_id", F.posexplode("band_keys").alias("band", "band_key")
    )


def _minhash_bands(spark, tw: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): banded minhash LSH signatures over the
    token-id table — the bucket assignment shared by candidate generation
    and the scale-stress diagnostics."""
    perms = spark.range(_N_PERMS).select(F.col("id").alias("p"))
    mh = (
        tw.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", F.col("p").cast("int").alias("perm"))
        .agg(
            F.min(
                (1000003 * F.col("tid") + 17 * (F.col("p") + 1)) % _MH_PRIME
            ).alias("minhash")
        )
    )
    return mh.groupBy(
        "doc_id", (F.col("perm") / _LSH_ROWS).cast("int").alias("band")
    ).agg(
        F.sum(
            (F.col("minhash") % 1000000007)
            * F.when(F.col("perm") % _LSH_ROWS == 0, 131).otherwise(1)
        ).alias("band_key")
    )


def neardup_candidate_stats(spark, docs: DataFrame) -> dict:
    """Scale-stress diagnostics for the candidate generator: the linear
    star+chain edge count vs the quadratic within-bucket all-pairs
    counterfactual (Σ per-bucket n·(n−1)/2 over bands), plus the largest
    bucket. A candidate-explosion regression — any change that silently
    reverts to quadratic behaviour on a mega-cluster — shows up as these
    two numbers converging."""
    sizes = (
        _bands_from_rows(_lsh_doc_rows(docs))
        .groupBy("band", "band_key")
        .count()
        .agg(
            F.sum((F.col("count") * (F.col("count") - 1) / 2).cast("long")).alias(
                "allpairs"
            ),
            # star (n-1) + chain (n-1) per bucket, before cross-band dedup
            F.sum(
                F.greatest(2 * (F.col("count") - 1), F.lit(0)).cast("long")
            ).alias("starchain"),
            F.max("count").alias("max_bucket"),
        )
        .first()
    )
    return {
        "allpairs_counterfactual": int(sizes["allpairs"] or 0),
        "starchain_edges": int(sizes["starchain"] or 0),
        "max_bucket": int(sizes["max_bucket"] or 0),
    }


def neardup_verified_pairs(
    spark, docs: DataFrame, candidates: str = "star_chain"
) -> DataFrame:
    """MinHash-LSH verified near-duplicate pairs (doc_a < doc_b): token-set
    minhash → banded LSH candidates → exact Jaccard ≥0.5 verify on
    candidates only. Shared by the canonicalization and
    connected-components queries.

    `candidates` picks the candidate generator:
    - "star_chain" (default, the 100-TB shape): each doc pairs with its LSH
      bucket's MINIMUM doc_id (star) AND with its nearest-lower-id bucket
      neighbour (chain) — still O(docs × bands) candidate edges no matter
      how large a duplicate cluster grows. A mega-cluster of n
      near-identical docs (observed in the sf0.1 fixture: ~3.6k docs →
      6.5M all-pairs) yields ≤2n edges per band instead of n²/2 pairs;
      overlapping buckets are merged downstream by the connected-
      components fixpoint, which restores the transitive cluster without
      ever materializing the quadratic pair set. The chain edges exist
      because star alone has a RECALL hazard (ADVICE r3): if a bucket's
      min-id member is an LSH false positive, every star edge of that
      bucket fails Jaccard verification and the remaining members — who may
      be true near-dups of each other — would never be tested; the chain
      links consecutive members directly, so within-bucket connectivity
      survives a false-positive minimum. (Recall still is not the
      within-bucket all-pairs closure: a bucket whose min AND an interior
      chain member are both false positives can split one true cluster —
      the residual price of linear candidates; more bands shrink it.)
    - "star": star edges only (the r3 default, kept for comparison).
    - "pairs": the full within-bucket self-join — exact pair LISTING for
      small/verification workloads; intrinsically quadratic in cluster
      size, so never the scale path.

    Plan shape (round 6): the fused Arrow front-end (_lsh_doc_rows)
    computes token sets + band keys in one narrow pass, materialized once
    (localCheckpoint — ~50 compact bytes/doc) and reused by candidate
    generation AND verification; Jaccard verification joins each candidate
    pair to the per-doc token-set rows and counts the overlap inline with
    array_intersect — no exploded-token shuffle joins. Outputs are
    bit-identical to the HOF reference pipeline (pytest-pinned)."""
    rows = _lsh_doc_rows(docs).localCheckpoint()
    bands = _bands_from_rows(rows)
    if candidates in ("star", "star_chain"):
        bucket_min = bands.groupBy("band", "band_key").agg(
            F.min("doc_id").alias("min_doc")
        )
        cand = (
            bands.join(bucket_min, ["band", "band_key"])
            .filter(F.col("doc_id") != F.col("min_doc"))
            .select(
                F.col("min_doc").alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
            )
        )
        if candidates == "star_chain":
            from pyspark.sql import Window

            w = Window.partitionBy("band", "band_key").orderBy("doc_id")
            chain = (
                bands.select(
                    F.lag("doc_id").over(w).alias("doc_a"),
                    F.col("doc_id").alias("doc_b"),
                )
                .filter(F.col("doc_a").isNotNull())
            )
            cand = cand.unionByName(chain)
        cand = cand.distinct()
    else:
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    sets_a = rows.select(
        F.col("doc_id").alias("doc_a"), F.col("tids").alias("_ta"),
        F.col("n").alias("na"),
    )
    sets_b = rows.select(
        F.col("doc_id").alias("doc_b"), F.col("tids").alias("_tb"),
        F.col("n").alias("nb"),
    )
    return (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .withColumn(
            "n_common", F.size(F.array_intersect("_ta", "_tb")).cast("long")
        )
        .filter(
            F.col("n_common") * 1.0
            / (F.col("na") + F.col("nb") - F.col("n_common"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )


@register(
    "neardup_canonical_docs",
    _NEARDUP_CTE + """,
    nbrs AS (
      SELECT doc_a AS doc_id, doc_b AS nbr FROM verified
      UNION ALL SELECT doc_b AS doc_id, doc_a AS nbr FROM verified)
    SELECT d.doc_id,
           CAST(LEAST(d.doc_id, COALESCE(MIN(n.nbr), d.doc_id)) AS BIGINT) AS canonical_id,
           CAST(COALESCE(MIN(n.nbr), d.doc_id) < d.doc_id AS BOOLEAN) AS is_dup
    FROM documents d LEFT JOIN nbrs n ON n.doc_id = d.doc_id
    GROUP BY d.doc_id
    """,
)
def neardup_canonical_docs(spark, sf_dir):
    """The full MinHash-LSH dedup pipeline as ONE driver-checked query:
    token-set minhash (8 perms) → 4-band LSH star+chain candidates (each
    doc vs its bucket's min id AND its nearest-lower-id bucket neighbour —
    O(docs × bands) edges even for a mega-cluster of near-identical docs;
    the quadratic within-bucket pair set never materializes, and the chain
    edges keep within-bucket recall when the bucket minimum is an LSH
    false positive) → exact Jaccard verify (≥0.5) on candidates only →
    min-id canonicalization over the 1-hop neighbourhood (the components
    query iterates the same edges to the fixpoint). Every stage is
    partial+final aggregates and equi-joins — no global structure, no
    single-reducer exchange."""
    d = _t(spark, sf_dir, "documents")
    verified = neardup_verified_pairs(spark, d)
    nbrs = verified.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nbr")
    ).unionByName(
        verified.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr"))
    )
    min_nbr = F.min("nbr")
    return (
        d.select("doc_id")
        .join(nbrs, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.least(F.col("doc_id"), F.coalesce(min_nbr, F.col("doc_id")))
            .cast("long")
            .alias("canonical_id"),
            (F.coalesce(F.min("nbr"), F.col("doc_id")) < F.col("doc_id")).alias(
                "is_dup"
            ),
        )
    )


# GPT-2-flavoured but engine-portable (Java regex and RE2 agree on these
# constructs): contraction suffixes, letter runs, 1-3 digit runs, single
# non-alnum marks
_BPE_PATTERN = r"'(?:s|t|re|ve|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"
_BPE_SQL = _BPE_PATTERN.replace("'", "''")  # SQL-literal escaping


@register(
    "bpe_token_counts",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars2,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS n_words,
           CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_bpe,
           CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) * 1.0
             / CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS bpe_per_word
    FROM documents
    WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
    """,
)
def bpe_token_counts(spark, sf_dir):
    """Token counting for training-data budgeting: whitespace words plus a
    BPE-ish regex tokenizer (letter runs / short digit runs / punct marks /
    contraction suffixes) — all JVM-side regexp_extract_all, no UDF."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_col()
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    out = d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars2"),
        F.size(toks).cast("long").alias("n_words"),
        F.size(bpe).cast("long").alias("n_bpe"),
    ).filter(F.col("n_words") > 0)
    return out.select(
        "doc_id", "n_chars2", "n_words", "n_bpe",
        (F.col("n_bpe") * 1.0 / F.col("n_words")).alias("bpe_per_word"),
    )


@register(
    "neardup_components_docs",
    "WITH RECURSIVE _pre AS (SELECT 1)," + _NEARDUP_CTE.split("WITH", 1)[1]
    + """,
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM verified
      UNION ALL SELECT doc_b AS u, doc_a AS v FROM verified),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u)
    SELECT d.doc_id,
           CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
             AS component_id
    FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
    GROUP BY d.doc_id
    """,
)
def neardup_components_docs(spark, sf_dir):
    """Dedup-cluster canonicalization to a FIXPOINT: verified near-dup pairs
    → O(log n)-round connected components (engine/graph.connected_components:
    min-label propagate + double pointer-jump per round, doubling-schedule
    convergence probes, localCheckpoint-bounded lineage) → every doc
    labelled with its component's minimum id. The DuckDB oracle computes
    the same fixpoint via a recursive CTE (transitive closure), so the
    iterative Spark loop is hash-verified end-to-end — the loop is the
    engine's iterative-algorithm surface (GraphX-free connected components)."""
    from .graph import connected_components

    d = _t(spark, sf_dir, "documents")
    verified = neardup_verified_pairs(spark, d)
    comps = connected_components(
        verified.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    return (
        d.select("doc_id")
        .join(comps, d.doc_id == comps.node, "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").cast("long").alias("component_id"),
        )
    )


# ---------------------------------------------------------------------------
# corpus statistics / repetition quality signals
# ---------------------------------------------------------------------------


@register(
    "corpus_vocab_topk",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents)
    SELECT w, CAST(COUNT(*) AS BIGINT) AS df
    FROM tok GROUP BY w
    ORDER BY df DESC, w LIMIT 100
    """,
)
def corpus_vocab_topk(spark, sf_dir):
    """Corpus document-frequency vocabulary: distinct (doc, token) →
    count per token → deterministic top-100 (df DESC, token). Two
    partial+final aggregates and a TakeOrderedAndProject — the standard
    vocab/df sweep a tokenizer-training or idf-weighting pass needs, with
    no global dictionary structure."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("w")).distinct()
    return (
        tok.groupBy("w")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.desc("df"), "w")
        .limit(100)
    )


@register(
    "doc_repetition_scores",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           COUNT(*) * 1.0 / SUM(c) AS unique_ratio,
           MAX(c) * 1.0 / SUM(c) AS top_token_share
    FROM tf GROUP BY doc_id
    """,
)
def doc_repetition_scores(spark, sf_dir):
    """Repetition quality signal: per-doc unique-token ratio and the share
    of the single most-repeated token — low-ratio / high-share docs are
    boilerplate or degenerate generations. Two chained aggregates on the
    same doc_id-prefixed key, so the second needs no extra shuffle."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    return tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_unique"),
        (F.count("*") * 1.0 / F.sum("c")).alias("unique_ratio"),
        (F.max("c") * 1.0 / F.sum("c")).alias("top_token_share"),
    )


# ---------------------------------------------------------------------------
# M97: feature-hashed bag-of-words cosine similarity (hashing trick)
# ---------------------------------------------------------------------------

#: hashed vector dimensionality, bounded query-doc set, and result depth
_HB_DIMS = 64
_HB_QUERY_DOCS = 20
_HB_TOPK = 5

_HB_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents),
vec AS (
  SELECT doc_id, CAST(({_tokhash_sql('w')}) % {_HB_DIMS} AS BIGINT) AS dim,
         COUNT(*) AS cnt
  FROM tok GROUP BY 1, 2),
n2 AS (SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS n2 FROM vec GROUP BY 1),
q AS (SELECT doc_id AS qid, dim, cnt AS qcnt FROM vec
      WHERE doc_id < {_HB_QUERY_DOCS}),
dots AS (
  SELECT q.qid, v.doc_id, CAST(SUM(q.qcnt * v.cnt) AS BIGINT) AS dot
  FROM q JOIN vec v USING (dim) WHERE v.doc_id <> q.qid GROUP BY 1, 2),
sim AS (
  SELECT d.qid, d.doc_id, d.dot,
         d.dot / (sqrt(a.n2) * sqrt(b.n2)) AS cos
  FROM dots d JOIN n2 a ON a.doc_id = d.qid JOIN n2 b ON b.doc_id = d.doc_id),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id)
        AS rn FROM sim)
SELECT qid, doc_id, dot, cos, CAST(rn AS INT) AS rn FROM r WHERE rn <= {_HB_TOPK}
"""


@register("hashed_bow_cosine_topk", _HB_SQL)
def hashed_bow_cosine_topk(spark, sf_dir):
    """M97: document similarity by the HASHING TRICK — each doc becomes a
    fixed-64-dim integer term-frequency vector (dim = portable token hash
    mod _HB_DIMS; no vocabulary, no training, the scale property), and
    similarity is sparse integer dot products: queries are a bounded
    broadcast set joined on `dim`, so the fan-out is |queries|·|corpus|
    postings, never corpus². Because counts, dots and norms² are exact
    integers, the final cosine `dot / (sqrt(n2_q)·sqrt(n2_c))` is the SAME
    correctly-rounded IEEE expression in both engines — the top-k order and
    the hash are bit-deterministic with no rounding step. Complements the
    MinHash (set overlap), SimHash (bit planes) and dense-embedding ANN
    families with the classic streaming-friendly sparse-vector space."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("w"))
    vec = (
        tok.select("doc_id", (tok_hash(F.col("w")) % _HB_DIMS).alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n2 = vec.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("n2")
    )
    q = vec.filter(F.col("doc_id") < _HB_QUERY_DOCS).select(
        F.col("doc_id").alias("qid"), "dim", F.col("cnt").alias("qcnt")
    )
    dots = (
        F.broadcast(q)
        .join(vec, "dim")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.sum(F.col("qcnt") * F.col("cnt")).cast("long").alias("dot"))
    )
    qn = n2.select(F.col("doc_id").alias("qid"), F.col("n2").alias("qn2"))
    sim = (
        dots.join(F.broadcast(qn), "qid")
        .join(n2, "doc_id")
        .select(
            "qid",
            "doc_id",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("n2").cast("double"))
                )
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "doc_id")
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HB_TOPK)
        .select("qid", "doc_id", "dot", "cos", F.col("rn").cast("int").alias("rn"))
    )
