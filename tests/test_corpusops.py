"""Corpus-assembly operators (engine/corpusops.py): brute-force parity,
determinism/stability properties, and scale-shape plan assertions beyond the
global plan gate in test_plans.py."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from engine import io as eio
from engine.corpusops import (
    PACK_BUDGET,
    PACK_SHARDS,
    TRANCHE_BUDGET,
    corpus_split_assign,
    ngram_contamination,
    pack_greedy_docs,
    portable_hash60,
    stratified_sample_docs,
    token_prefix_tranches,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_pdf(spark):
    return (
        eio.read_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .toPandas()
    )


# ---------------------------------------------------------------------------
# split assignment
# ---------------------------------------------------------------------------


def test_split_assign_is_partitioning_stable(spark):
    """The split is a pure function of doc_id: re-partitioning the input
    arbitrarily cannot move any document across splits."""
    base = corpus_split_assign(spark, SF_DIR).toPandas().set_index("doc_id")
    docs = eio.read_table(spark, SF_DIR, "documents").repartition(13, "lang")
    h = portable_hash60(F.col("doc_id"))
    re_split = (
        docs.select(
            "doc_id",
            F.when(h % 100 < 80, "train")
            .when(h % 100 < 90, "valid")
            .otherwise("test")
            .alias("split"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert (base["split"] == re_split["split"].reindex(base.index)).all()


def test_split_assign_covers_and_ratios(spark):
    pdf = corpus_split_assign(spark, SF_DIR).toPandas()
    counts = pdf["split"].value_counts()
    assert set(counts.index) <= {"train", "valid", "test"}
    assert counts.sum() == len(pdf)
    # 80/10/10 by bucket: train strictly dominates at any fixture size
    assert counts["train"] > counts.get("valid", 0)
    assert counts["train"] > counts.get("test", 0)


def test_split_assign_plan_has_no_shuffle(spark):
    p = (
        corpus_split_assign(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p, f"row-local split must not shuffle:\n{p}"


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_counts_and_determinism(spark):
    pdf = stratified_sample_docs(spark, SF_DIR).toPandas()
    per = pdf.groupby("source").size()
    n_src = (
        eio.read_table(spark, SF_DIR, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(per) == n_src
    # exactly min(5, stratum size) per stratum; ranks are 1..k
    docs = _docs_pdf(spark)
    sizes = docs.groupby("source").size()
    for src, k in per.items():
        assert k == min(5, sizes[src])
        got = sorted(pdf[pdf["source"] == src]["rk"])
        assert got == list(range(1, k + 1))
    # deterministic under re-run
    again = stratified_sample_docs(spark, SF_DIR).toPandas()
    assert sorted(pdf["doc_id"]) == sorted(again["doc_id"])


# ---------------------------------------------------------------------------
# greedy packing
# ---------------------------------------------------------------------------


def _brute_pack(docs):
    """Reference greedy first-fit in plain Python over (doc_id, n_tok)."""
    out = {}
    for shard in sorted({s for s, _, _ in docs}):
        rows = sorted((d, t) for s, d, t in docs if s == shard)
        pack, fill = 1, 0
        for doc_id, t in rows:
            if fill > 0 and fill + t > PACK_BUDGET:
                pack, fill = pack + 1, t
            else:
                fill += t
            out[doc_id] = (shard, pack)
    return out


def test_pack_greedy_matches_bruteforce(spark):
    got = pack_greedy_docs(spark, SF_DIR).toPandas()
    docs = _docs_pdf(spark)
    docs["n_tok"] = docs["text"].str.split().str.len()
    import hashlib

    def h60(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    triples = [
        (h60(r.doc_id) % PACK_SHARDS, r.doc_id, r.n_tok)
        for r in docs.itertuples()
    ]
    ref = _brute_pack(triples)
    assert len(got) == len(ref)
    for r in got.itertuples():
        assert ref[r.doc_id] == (r.shard, r.pack_id), r.doc_id


def test_pack_greedy_invariants(spark):
    pdf = pack_greedy_docs(spark, SF_DIR).toPandas()
    fills = pdf.groupby(["shard", "pack_id"])["n_tok"].agg(["sum", "count"])
    # a pack only exceeds the budget when it holds a single oversized doc
    over = fills[fills["sum"] > PACK_BUDGET]
    assert (over["count"] == 1).all()
    # pack ids are contiguous from 1 within every shard
    for shard, grp in pdf.groupby("shard"):
        ids = sorted(grp["pack_id"].unique())
        assert ids == list(range(1, len(ids) + 1))


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_matches_bruteforce(spark):
    got = ngram_contamination(spark, SF_DIR).toPandas()
    docs = _docs_pdf(spark)
    grams = {}
    for r in docs.itertuples():
        w = [x for x in r.text.split(" ") if x != ""]
        grams[r.doc_id] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    expect = {}
    for cid, cg in grams.items():
        if cid % 11 == 0:
            continue
        for bid, bg in grams.items():
            if bid % 11 != 0:
                continue
            n = len(cg & bg)
            if n >= 3:
                expect[(cid, bid)] = n
    have = {
        (r.doc_id, r.bench_id): r.n_shared for r in got.itertuples()
    }
    assert have == expect


# ---------------------------------------------------------------------------
# prefix-sum tranches
# ---------------------------------------------------------------------------


def test_tranches_match_single_reducer_window(spark):
    """The distributed prefix sum must equal the textbook partition-less
    running sum it replaces (computed here via pandas cumsum)."""
    got = (
        token_prefix_tranches(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = _docs_pdf(spark).sort_values("doc_id").reset_index(drop=True)
    docs["n_tok"] = docs["text"].str.split().str.len()
    cum = docs["n_tok"].cumsum()
    assert (got["cum_tokens"].to_numpy() == cum.to_numpy()).all()
    assert (
        got["tranche"].to_numpy() == ((cum - 1) // TRANCHE_BUDGET).to_numpy()
    ).all()


def test_tranches_plan_has_no_single_partition_window(spark):
    p = (
        token_prefix_tranches(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in p, p


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    vals = ["0", "123", "abc def", "42"]
    sdf = spark.createDataFrame([(v,) for v in vals], "x string").select(
        "x", portable_hash60(F.col("x")).alias("h")
    )
    got = {r["x"]: r["h"] for r in sdf.collect()}
    con = duckdb.connect()
    for v in vals:
        (ref,) = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)", [v]
        ).fetchone()
        assert got[v] == ref, v


# ---------------------------------------------------------------------------
# mixture upsampling
# ---------------------------------------------------------------------------


def test_mixture_upsample_matches_bruteforce(spark):
    import hashlib
    import math

    from engine.corpusops import MIX_MAX_EPOCHS, corpus_mixture_upsample

    got = corpus_mixture_upsample(spark, SF_DIR).toPandas()
    docs = (
        eio.read_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang")
        .toPandas()
    )
    sizes = docs.groupby("lang").size()
    m = sizes.max()
    expect = {}
    for r in docs.itertuples():
        eps = min(MIX_MAX_EPOCHS, m / sizes[r.lang])
        h = int(
            hashlib.md5(f"{r.doc_id}:mix".encode()).hexdigest()[:15], 16
        )
        frac = (h % 1000000) / 1000000.0
        expect[r.doc_id] = int(math.floor(eps)) + (
            1 if frac < eps - math.floor(eps) else 0
        )
    have = got.groupby("doc_id").size().to_dict()
    assert have == expect
    # the skewed fixture must actually exercise upsampling
    assert sum(expect.values()) > len(expect)
    assert set(expect) == set(have)
    for doc_id, grp in got.groupby("doc_id"):
        assert sorted(grp["copy_idx"]) == list(
            range(1, expect[doc_id] + 1)
        )


# ---------------------------------------------------------------------------
# overlapping chunking (M35)
# ---------------------------------------------------------------------------


def test_chunks_match_bruteforce(spark):
    from engine.corpusops import CHUNK_STRIDE, CHUNK_W, doc_chunks_overlap

    got = {}
    for r in doc_chunks_overlap(spark, SF_DIR).collect():
        got[(r["doc_id"], r["chunk_idx"])] = (
            r["start_word"], r["n_words"], r["chunk_text"]
        )
    exp = {}
    for _, row in _docs_pdf(spark).iterrows():
        words = [w for w in row["text"].split(" ") if w]
        starts = list(range(0, max(len(words), 1), CHUNK_STRIDE))
        for i, s in enumerate(starts):
            chunk = words[s:s + CHUNK_W]
            exp[(row["doc_id"], i)] = (s, len(chunk), " ".join(chunk))
    assert got == exp
    # overlap invariant: consecutive full chunks share W - stride words
    assert CHUNK_W > CHUNK_STRIDE


def test_chunks_plan_has_no_shuffle(spark):
    """Chunking is row-local scan→generate: any Exchange would mean the
    corpus gets shuffled just to slice strings."""
    from engine.corpusops import doc_chunks_overlap

    p = doc_chunks_overlap(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_chunks_cover_every_word(spark):
    """Every word index of every doc falls inside at least one chunk."""
    from engine.corpusops import doc_chunks_overlap

    rows = doc_chunks_overlap(spark, SF_DIR).collect()
    cover = {}
    for r in rows:
        cover.setdefault(r["doc_id"], []).append(
            (r["start_word"], r["start_word"] + r["n_words"])
        )
    for _, row in _docs_pdf(spark).iterrows():
        n = len([w for w in row["text"].split(" ") if w])
        spans = sorted(cover[row["doc_id"]])
        covered = set()
        for a, b in spans:
            covered.update(range(a, b))
        assert covered == set(range(n)), row["doc_id"]


# ---------------------------------------------------------------------------
# vocabulary ids (M36)
# ---------------------------------------------------------------------------


def test_vocab_ids_match_bruteforce(spark):
    from engine.corpusops import vocab_token_ids

    got = {
        r["token"]: (r["tf"], r["df"], r["token_id"])
        for r in vocab_token_ids(spark, SF_DIR).collect()
    }
    tf, df = {}, {}
    for _, row in _docs_pdf(spark).iterrows():
        words = [w for w in row["text"].split(" ") if w]
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        for w in set(words):
            df[w] = df.get(w, 0) + 1
    order = sorted(tf, key=lambda t: (-tf[t], t))
    exp = {t: (tf[t], df[t], i + 1) for i, t in enumerate(order)}
    assert got == exp
    # dense, gapless, unique ids
    ids = sorted(v[2] for v in got.values())
    assert ids == list(range(1, len(got) + 1))


def test_vocab_plan_has_no_single_partition(spark):
    """The global rank must come from the two-phase offset join, never an
    Exchange SinglePartition funneling the vocabulary through one reducer."""
    from engine.corpusops import vocab_token_ids

    p = vocab_token_ids(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in p, p
