"""Persisted incremental vocabulary index (engine/vocabindex.py): frozen-id
stability, dense append-only growth, no-op re-ingest, re-roll semantics,
and encode() round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F

from engine import io as eio
from engine.vocabindex import VocabIndex

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return eio.read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _vocab_dict(idx):
    return {
        r["token"]: (r["token_id"], r["tf"], r["df"])
        for r in idx.vocab().collect()
    }


def test_incremental_totals_and_id_stability(spark, tmp_path):
    """Two-batch ingest: totals == one-shot aggregate; batch-0 tokens keep
    their ids after batch 1; new tokens extend densely past the max."""
    d = _docs(spark)
    idx = VocabIndex(spark, str(tmp_path / "v"))
    mid = (d.agg(F.max("doc_id")).first()[0] + 1) // 2
    b0, b1 = d.filter(F.col("doc_id") < mid), d.filter(F.col("doc_id") >= mid)

    r0 = idx.ingest(b0, "b0")
    assert r0["ingested"] and r0["new_tokens"] > 0
    after0 = _vocab_dict(idx)

    r1 = idx.ingest(b1, "b1")
    assert r1["ingested"]
    after1 = _vocab_dict(idx)

    # frozen ids
    for tok, (tid, _, _) in after0.items():
        assert after1[tok][0] == tid, tok
    # dense gapless ids
    ids = sorted(v[0] for v in after1.values())
    assert ids == list(range(1, len(after1) + 1))
    # new tokens all ranked after batch-0's max
    max0 = max(v[0] for v in after0.values())
    for tok, (tid, _, _) in after1.items():
        if tok not in after0:
            assert tid > max0, tok

    # totals equal the one-shot aggregate
    from engine.corpusops import token_counts

    exp = {
        r["token"]: (r["tf"], r["df"]) for r in token_counts(d).collect()
    }
    got = {t: (tf, df) for t, (_, tf, df) in after1.items()}
    assert got == exp


def test_unchanged_reingest_is_noop(spark, tmp_path):
    d = _docs(spark)
    idx = VocabIndex(spark, str(tmp_path / "v"))
    idx.ingest(d, "all")
    before = _vocab_dict(idx)
    r = idx.ingest(d, "all")
    assert not r["ingested"]
    assert _vocab_dict(idx) == before


def test_reroll_freezes_ids_and_updates_counts(spark, tmp_path):
    """A changed batch re-rolls its counts partition; vanished tokens keep
    their frozen ids at tf=df=0; genuinely new tokens append."""
    rows = [(1, "alpha beta beta"), (2, "alpha gamma")]
    d = lambda r: spark.createDataFrame(r, "doc_id long, text string")  # noqa: E731
    idx = VocabIndex(spark, str(tmp_path / "v"))
    idx.ingest(d(rows), "b")
    before = _vocab_dict(idx)
    assert set(before) == {"alpha", "beta", "gamma"}

    # beta disappears, delta arrives
    idx.ingest(d([(1, "alpha alpha"), (2, "alpha delta")]), "b")
    after = _vocab_dict(idx)
    assert after["alpha"][0] == before["alpha"][0]
    assert after["beta"][0] == before["beta"][0], "id revoked on re-roll"
    assert after["beta"][1:] == (0, 0)
    assert after["delta"][0] == len(before) + 1
    assert after["alpha"][1:] == (3, 2)


def test_first_build_matches_oneshot_ranking(spark, tmp_path):
    from engine.corpusops import dense_freq_rank, token_counts

    d = _docs(spark)
    idx = VocabIndex(spark, str(tmp_path / "v"))
    idx.ingest(d, "all")
    got = _vocab_dict(idx)
    exp = {
        r["token"]: (r["token_id"], r["tf"], r["df"])
        for r in dense_freq_rank(token_counts(d)).collect()
    }
    assert got == exp


def test_encode_roundtrip(spark, tmp_path):
    """encode(): ordered id arrays; decoding through the vocab reproduces
    the original word sequence (no UNKs when encoding the training set
    itself); an unseen token maps to 0."""
    d = _docs(spark)
    idx = VocabIndex(spark, str(tmp_path / "v"))
    idx.ingest(d, "all")
    inv = {tid: tok for tok, (tid, _, _) in _vocab_dict(idx).items()}
    enc = {r["doc_id"]: r["token_ids"] for r in idx.encode(d).collect()}
    pdf = d.toPandas()
    for _, row in pdf.head(50).iterrows():
        words = [w for w in row["text"].split(" ") if w]
        assert [inv[t] for t in enc[row["doc_id"]]] == words, row["doc_id"]
    unseen = spark.createDataFrame(
        [(999999, "zzz-never-seen alpha")], "doc_id long, text string"
    )
    got = idx.encode(unseen).collect()[0]["token_ids"]
    assert got[0] == 0
