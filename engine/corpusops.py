"""Training-corpus assembly operators over the `documents` table: the ops a
100-TB LLM-pretraining data pipeline runs AFTER cleaning/dedup (textops.py)
and BEFORE the trainer — deterministic dataset splits, exact stratified
sampling, greedy sequence packing into context windows, n-gram benchmark
contamination detection, and token-budget curriculum tranches. Every query
is driver-verified (full row/schema/hash) against a DuckDB oracle.

Portability: where a hash is needed, both engines compute the SAME 60-bit
fingerprint — `conv(substr(md5(x), 1, 15), 16, 10)` in Spark,
`CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` in DuckDB — so split
assignment, shard routing, and gram fingerprints hash-match bit-exactly. In
production you'd swap md5 for xxhash64 (same shape, ~10x cheaper); md5 here
buys a cross-engine oracle for the *logic*, which no engine-private hash can.

100-TB design notes (per operator, also in each docstring):
  * split assignment is a row-local expression — zero shuffles, and the
    assignment is a pure function of the stable doc key, so it never moves
    when the corpus is re-read, re-partitioned, or appended to;
  * stratified sampling is one hash shuffle on the stratum key + a
    per-stratum window — no global sort, no driver collection;
  * sequence packing is sequential ONLY within a shard: shards are the unit
    of parallelism (thousands at scale), each packed in one Arrow batch
    stream, so the "inherently sequential" first-fit scan parallelizes to
    the shard count with a single shuffle;
  * contamination joins 8-byte gram fingerprints (never gram strings) on an
    equi-key — fingerprint cardinality grows with corpus size but the join
    is a plain hash join; the benchmark side is tiny and broadcastable;
  * curriculum tranches use a two-phase distributed prefix sum (within-shard
    running totals + broadcast per-shard offsets) instead of the textbook
    partition-less window, which would serialize the corpus through ONE
    reducer — the classic scale trap this module exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

#: greedy packing context-window budget (tokens) and shard fan-out
PACK_BUDGET = 256
PACK_SHARDS = 8
#: curriculum tranche budget (tokens) and prefix-sum shard width
TRANCHE_BUDGET = 4000
TRANCHE_SHARD_WIDTH = 64


def portable_hash60(col) -> F.Column:
    """60-bit deterministic fingerprint both engines agree on: the first 15
    hex chars of md5, read as an integer. Non-negative, fits a BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def _words_col(text_col: str = "text") -> F.Column:
    """Non-empty whitespace tokens (matches DuckDB list_filter/string_split)."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


_NTOK_SQL = "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)"


def _ntok_col() -> F.Column:
    return F.size(_words_col()).cast("long")


#: contamination n-gram width (words) and minimum shared distinct grams
NGRAM_WORDS = 3
MIN_SHARED = 3


def doc_gram_fps(d: DataFrame) -> DataFrame:
    """Distinct (doc_id, gfp) word-NGRAM_WORDS-gram 60-bit fingerprints per
    document — the shared kernel of the one-shot contamination query and the
    persisted benchmark index (engine/contamindex.py). JVM HOFs end to end;
    grams leave the executor only as 8-byte fingerprints."""
    docs = d.select("doc_id", _words_col().alias("w")).filter(
        F.size("w") >= NGRAM_WORDS
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {NGRAM_WORDS - 1}),"
                f" i -> array_join(slice(w, i, {NGRAM_WORDS}), ' '))"
            )
        ).alias("g"),
    )
    return grams.select(
        "doc_id", portable_hash60(F.col("g")).alias("gfp")
    ).distinct()


# ---------------------------------------------------------------------------
# deterministic dataset split
# ---------------------------------------------------------------------------


@register(
    "corpus_split_assign",
    f"""
    SELECT doc_id, lang,
           CAST(h % 100 AS BIGINT) AS bucket,
           CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, lang, {_hash60_sql('doc_id')} AS h FROM documents)
    """,
)
def corpus_split_assign(spark, sf_dir):
    """Deterministic train/valid/test assignment by hash bucket (80/10/10).

    The split is a pure row-local function of the stable document key: the
    plan is scan -> project with ZERO shuffles, and the assignment survives
    re-partitioning, re-ingestion, and corpus appends unchanged — the
    property that keeps eval sets uncontaminated across pipeline runs. At
    100 TB this is the only split mechanism that needs no coordination at
    all; a random() split is neither reproducible nor append-stable."""
    d = _t(spark, sf_dir, "documents")
    h = portable_hash60(F.col("doc_id"))
    bucket = (h % 100).alias("bucket")
    return d.select(
        "doc_id",
        "lang",
        bucket,
        F.when(h % 100 < 80, "train")
        .when(h % 100 < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# exact stratified sampling
# ---------------------------------------------------------------------------


@register(
    "stratified_sample_docs",
    f"""
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      FROM (SELECT source, doc_id, {_hash60_sql('doc_id')} AS h
            FROM documents))
    WHERE rk <= 5
    """,
)
def stratified_sample_docs(spark, sf_dir):
    """Exact k-per-stratum deterministic sample: the k hash-smallest docs of
    every source (k=5). Hash order gives an unbiased-by-construction,
    reproducible sample; the exact per-stratum count is what df.sampleBy
    (Bernoulli) cannot promise. One hash shuffle on the stratum key, then a
    per-stratum window — no global sort, nothing on the driver. Hot strata
    cost one partition's sort; at 100 TB you'd pre-aggregate candidate keys
    (doc_id, h) only — the text never moves, which this plan already does
    (the sample is keys; hydrate by join afterwards)."""
    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "source", "doc_id", portable_hash60(F.col("doc_id")).alias("h")
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# greedy sequence packing into context windows
# ---------------------------------------------------------------------------


@register(
    "pack_greedy_docs",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             {_hash60_sql('doc_id')} % {PACK_SHARDS} AS shard,
             {_NTOK_SQL} AS n_tok,
             ROW_NUMBER() OVER (
               PARTITION BY {_hash60_sql('doc_id')} % {PACK_SHARDS}
               ORDER BY doc_id) AS rn
      FROM documents),
    packed AS (
      SELECT shard, rn, doc_id, n_tok,
             CAST(1 AS BIGINT) AS pack_id, n_tok AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.shard, t.rn, t.doc_id, t.n_tok,
             CASE WHEN p.fill + t.n_tok > {PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.fill + t.n_tok > {PACK_BUDGET}
                  THEN t.n_tok ELSE p.fill + t.n_tok END
      FROM packed p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1)
    SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_tok, pack_id FROM packed
    """,
)
def pack_greedy_docs(spark, sf_dir):
    """Greedy first-fit sequence packing: documents are routed to shards by
    stable hash, ordered by doc_id within shard, and packed front-to-back
    into context windows of PACK_BUDGET tokens (a doc longer than the budget
    gets a pack of its own; docs are never split). Emits the (shard, pack)
    assignment per document.

    Scale shape: packing is the textbook "inherently sequential" scan, so
    the shard is the unit of parallelism — one shuffle routes docs to
    shards, then each shard packs independently inside a single Arrow
    grouped-map stream (numpy loop over token counts, never over text). At
    100 TB you run thousands of shards; determinism (hash routing + doc_id
    order) makes the pack layout reproducible run-over-run, which training
    checkpoint/resume requires. The DuckDB oracle replays the identical
    greedy recurrence as a recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (portable_hash60(F.col("doc_id")) % PACK_SHARDS).alias("shard"),
        _ntok_col().alias("n_tok"),
    )

    def _pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        pack, fill = 1, 0
        for t in pdf["n_tok"].to_numpy():
            if fill > 0 and fill + t > PACK_BUDGET:
                pack += 1
                fill = int(t)
            else:
                fill += int(t)
            packs.append(pack)
        pdf["pack_id"] = packs
        return pdf[["shard", "doc_id", "n_tok", "pack_id"]]

    return toks.groupBy("shard").applyInPandas(
        _pack, "shard long, doc_id long, n_tok long, pack_id long"
    )


# ---------------------------------------------------------------------------
# n-gram benchmark contamination
# ---------------------------------------------------------------------------


@register(
    "ngram_contamination",
    f"""
    WITH grams AS (
      SELECT doc_id, {_hash60_sql('g')} AS gfp
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 2),
                 i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS g
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents)
        WHERE len(w) >= 3)
      GROUP BY doc_id, gfp)
    SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
    FROM grams c JOIN grams b ON c.gfp = b.gfp
    WHERE c.doc_id % 11 <> 0 AND b.doc_id % 11 = 0
    GROUP BY c.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
    """,
)
def ngram_contamination(spark, sf_dir):
    """Benchmark contamination detection: flag corpus documents sharing >= 3
    distinct word-3-grams with any held-out benchmark document (here the
    deterministic doc_id % 11 == 0 subset stands in for the eval suite).

    Scale shape: grams are joined as 60-bit fingerprints (8 bytes), never as
    strings — the corpus side is O(total tokens) fingerprint rows feeding a
    plain equi-hash-join, and the benchmark side (eval suites are ~1e5 docs,
    not 1e9) broadcasts. Distinct-per-doc first, so a gram repeated inside
    one document can't inflate its overlap count. This is the decontam pass
    every pretraining corpus runs before training; the oracle recomputes it
    from the same fingerprints in DuckDB."""
    d = _t(spark, sf_dir, "documents")
    fps = doc_gram_fps(d)
    corpus = fps.filter(F.col("doc_id") % 11 != 0)
    bench = fps.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"), "gfp"
    )
    return (
        corpus.join(bench, "gfp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# token-budget curriculum tranches (distributed prefix sum)
# ---------------------------------------------------------------------------


@register(
    "token_prefix_tranches",
    f"""
    SELECT doc_id, n_tok,
           CAST(SUM(n_tok) OVER w AS BIGINT) AS cum_tokens,
           CAST(FLOOR((SUM(n_tok) OVER w - 1) / {TRANCHE_BUDGET}.0) AS BIGINT)
             AS tranche
    FROM (SELECT doc_id, {_NTOK_SQL} AS n_tok FROM documents)
    WINDOW w AS (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def token_prefix_tranches(spark, sf_dir):
    """Token-budget curriculum tranches: running corpus token total in
    doc_id order, cut into TRANCHE_BUDGET-token tranches (epoch slices /
    data-mixture curriculum units).

    The oracle is the textbook partition-less running sum — which in Spark
    would compile to `Window [unpartitioned]` behind an Exchange
    SinglePartition: the whole corpus through ONE reducer. This
    implementation is the distributed prefix sum instead: (1) shard the sort
    key into ordered ranges, (2) within-shard running sums behind one hash
    shuffle, (3) per-shard totals (one row per shard) prefix-summed via a
    broadcast `shard' < shard` self-join, (4) broadcast offsets back. Data
    crosses the cluster once; the only non-equi join touches #shards rows
    (metadata scale — at 10^12 turns that's the range-partition count, a few
    thousand). Shard ranges here come from a fixed key width; production
    uses repartitionByRange's sampled boundaries, same algebra."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", _ntok_col().alias("n_tok")).withColumn(
        "shard", F.floor(F.col("doc_id") / TRANCHE_SHARD_WIDTH)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = toks.withColumn("cum_in", F.sum("n_tok").over(w))
    totals = toks.groupBy("shard").agg(F.sum("n_tok").alias("tot"))
    prior = totals.select(F.col("shard").alias("s2"), F.col("tot").alias("tot2"))
    offsets = (
        totals.join(F.broadcast(prior), F.col("s2") < F.col("shard"), "left")
        .groupBy("shard")
        .agg(F.coalesce(F.sum("tot2"), F.lit(0)).alias("off"))
    )
    cum = F.col("cum_in") + F.col("off")
    return (
        within.join(F.broadcast(offsets), "shard")
        .select(
            "doc_id",
            "n_tok",
            cum.alias("cum_tokens"),
            F.floor((cum - 1) / TRANCHE_BUDGET).cast("long").alias("tranche"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic data-mixture upsampling (fractional epochs)
# ---------------------------------------------------------------------------

#: cap on per-source repetition (epochs) in the balanced mixture
MIX_MAX_EPOCHS = 3.0


@register(
    "corpus_mixture_upsample",
    f"""
    WITH sizes AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
    eps AS (
      SELECT lang,
             LEAST({MIX_MAX_EPOCHS}, (SELECT MAX(n_s) FROM sizes) * 1.0 / n_s)
               AS epochs
      FROM sizes)
    SELECT doc_id, lang,
           CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy_idx
    FROM (
      SELECT d.doc_id, d.lang,
             CAST(FLOOR(e.epochs) AS BIGINT)
             + CASE WHEN ({_hash60_sql("d.doc_id || ':mix'")} % 1000000)
                         / 1000000.0
                        < e.epochs - FLOOR(e.epochs)
                    THEN 1 ELSE 0 END AS copies
      FROM documents d JOIN eps e USING (lang))
    """,
)
def corpus_mixture_upsample(spark, sf_dir):
    """Deterministic balanced data-mixture with fractional epochs: every
    language is upsampled toward the largest language's row count (epochs =
    max_size / size, capped at MIX_MAX_EPOCHS; the fixture's languages are
    genuinely skewed, ~3.4x, so every cap/floor/fraction branch is live). A
    group needing e.g. 2.7 epochs emits 2 copies of every doc plus a third
    copy of a deterministic hash-chosen 70% subset — the standard
    pretraining mixture primitive (repeat small high-quality slices, never
    at random).

    Scale shape: per-group sizes are one partial+final aggregate; the
    group->epochs table (cardinality = #groups, tens not billions)
    broadcasts back onto the corpus, and the copy fan-out is a JVM-side
    explode(sequence(...)) — no Python, no shuffle after the size agg. The
    global MAX feeding the balance target is the allowlisted
    partial-aggregate-fed single-row reduction; determinism (hash-threshold
    subset, not rand()) makes the mixture reproducible run-over-run and
    append-stable."""
    d = _t(spark, sf_dir, "documents")
    sizes = d.groupBy("lang").agg(F.count("*").alias("n_s"))
    mx = sizes.agg(F.max("n_s").alias("m"))
    eps = sizes.join(F.broadcast(mx)).select(
        "lang",
        F.least(F.lit(MIX_MAX_EPOCHS), F.col("m") / F.col("n_s")).alias(
            "epochs"
        ),
    )
    hfrac = (
        portable_hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":mix")))
        % 1000000
    ) / 1000000.0
    copies = (
        F.floor(F.col("epochs")).cast("long")
        + F.when(hfrac < F.col("epochs") - F.floor(F.col("epochs")), 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        d.select("doc_id", "lang")
        .join(F.broadcast(eps), "lang")
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), copies)).alias(
                "copy_idx"
            ),
        )
    )


# ---------------------------------------------------------------------------
# overlapping context-window chunking
# ---------------------------------------------------------------------------

#: chunk window / stride in words (stride < window => overlapping context)
CHUNK_W = 32
CHUNK_STRIDE = 24


@register(
    "doc_chunks_overlap",
    f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents),
    s AS (
      SELECT doc_id, words,
             CAST(unnest(range(0, CAST(greatest(len(words), 1) AS BIGINT),
                               {CHUNK_STRIDE})) AS BIGINT) AS st
      FROM d)
    SELECT doc_id,
           CAST(st / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           st AS start_word,
           CAST(len(words[st + 1 : st + {CHUNK_W}]) AS BIGINT) AS n_words,
           array_to_string(words[st + 1 : st + {CHUNK_W}], ' ') AS chunk_text
    FROM s
    """,
)
def doc_chunks_overlap(spark, sf_dir):
    """M35 overlapping context-window chunking: every document split into
    CHUNK_W-word windows advancing by CHUNK_STRIDE (8-word overlap) — the
    standard preprocessing that turns variable-length documents into
    training/RAG context windows without losing cross-boundary n-grams.

    Row-local: split → sequence of starts → explode → slice, a pure
    scan→generate plan with ZERO shuffles regardless of corpus size (the
    fan-out is bounded by words/stride per doc). Short docs emit exactly
    one (possibly short) chunk; the final chunk is allowed to be shorter
    than the window rather than re-reading the tail (deterministic,
    append-stable chunk ids)."""
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    starts = d.select(F.col("doc_id"), words.alias("words")).select(
        "doc_id",
        "words",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.size("words") - 1, F.lit(0)).cast("long"),
                F.lit(CHUNK_STRIDE).cast("long"),
            )
        ).alias("st"),
    )
    chunk = F.slice("words", (F.col("st") + 1).cast("int"), CHUNK_W)
    return starts.select(
        "doc_id",
        (F.col("st") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("st").alias("start_word"),
        F.size(chunk).cast("long").alias("n_words"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# vocabulary construction with scale-safe global ranking
# ---------------------------------------------------------------------------


@register(
    "vocab_token_ids",
    """
    WITH w AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents),
    v AS (
      SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM w GROUP BY token)
    SELECT token, tf, df,
           CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT)
             AS token_id
    FROM v
    """,
)
def vocab_token_ids(spark, sf_dir):
    """M36 vocabulary construction: corpus-wide term/document frequencies
    plus a DENSE GLOBAL ID assigned by frequency rank (tf desc, token) —
    the tokenizer-vocab step of a training pipeline.

    The oracle's ROW_NUMBER() OVER (ORDER BY ...) is the textbook global
    rank — in Spark that compiles to an Exchange SinglePartition: the whole
    vocabulary through one reducer. This implementation is the distributed
    sort-rank instead: (1) one explode+agg for (tf, df) per token, (2)
    WITHIN-(tf, prefix-shard) row_number — the window key includes a token
    prefix so the tf=1 long tail (most of any real vocabulary) spreads
    across shards instead of funneling into one, (3) a (tf, prefix)-level
    count table (metadata scale: bounded by distinct-tf × shards, not by
    vocab size) prefix-summed via broadcast non-equi self-join gives each
    shard its global offset. Data crosses the cluster once; no single
    reducer anywhere."""
    return dense_freq_rank(token_counts(_t(spark, sf_dir, "documents")))


def token_counts(docs) -> "F.DataFrame":
    """(token, tf, df) over a document set — the vocabulary aggregate."""
    words = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    return (
        docs.select("doc_id", F.explode(words).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
    )


def dense_freq_rank(v) -> "F.DataFrame":
    """Attach `token_id` = dense global row_number by (tf desc, token)
    WITHOUT an Exchange SinglePartition: within-(tf, token-prefix)
    row_number + a metadata-scale (tf, prefix) count table prefix-summed
    via broadcast non-equi self-join. Input needs (token, tf) columns;
    all input columns pass through."""
    from pyspark.sql import Window

    v = v.withColumn("pfx", F.substring("token", 1, 1))
    w = (
        Window.partitionBy("tf", "pfx")
        .orderBy("token")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = v.withColumn("rk_in", F.count("*").over(w))
    cells = v.groupBy("tf", "pfx").agg(F.count("*").alias("cnt"))
    prior = cells.select(
        F.col("tf").alias("tf2"), F.col("pfx").alias("pfx2"),
        F.col("cnt").alias("cnt2"),
    )
    before = (F.col("tf2") > F.col("tf")) | (
        (F.col("tf2") == F.col("tf")) & (F.col("pfx2") < F.col("pfx"))
    )
    offsets = (
        cells.join(F.broadcast(prior), before, "left")
        .groupBy("tf", "pfx")
        .agg(F.coalesce(F.sum("cnt2"), F.lit(0)).alias("off"))
    )
    passthrough = [c for c in v.columns if c not in ("pfx",)]
    return (
        within.join(F.broadcast(offsets), ["tf", "pfx"])
        .select(
            *passthrough,
            (F.col("off") + F.col("rk_in")).cast("long").alias("token_id"),
        )
    )
