"""Product-quantization coarse re-rank (engine/pq.py + SimIndex pq_m):
deterministic training/encoding, exact-path parity when nothing is pruned,
recall at a fixed probe budget, incremental==oneshot code tables, and the
column-pruning plan evidence (the lists scan must not read vectors)."""

import re
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine import io as eio  # noqa: E402
from engine.pq import encode_codes, train_codebooks  # noqa: E402
from engine.simindex import SimIndex  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def em(spark):
    df = eio.read_table(spark, SF_DIR, "embeddings")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def idx(spark, em, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pqidx") / "root")
    ix = SimIndex(spark, root, pq_m=16, pq_ks=32)
    ix.ingest(em, "all")
    return ix


def test_train_and_encode_deterministic(spark, em):
    c1 = train_codebooks(em, 16, 32)
    c2 = train_codebooks(em, 16, 32)
    assert c1.shape == (16, 32, 4)
    assert np.array_equal(c1, c2)
    v = em.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    e1 = sorted(map(tuple, encode_codes(v, c1).select("vec_id", "codes").collect()))
    e2 = sorted(map(tuple, encode_codes(v, c1).select("vec_id", "codes").collect()))
    assert e1 == e2
    codes = dict(e1)
    assert all(len(c) == 16 and all(0 <= j < 32 for j in c) for c in codes.values())


def test_pq_approx_dot_tracks_true_dot(spark, em):
    """The einsum-table score used by pq_prune equals sum of subspace
    codebook dots, and correlates strongly with the true dot product."""
    cbs = train_codebooks(em, 16, 32)
    rows = (
        encode_codes(
            em.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            ),
            cbs,
        )
        .orderBy("vec_id")
        .limit(100)
        .collect()
    )
    X = np.array([r["e"] for r in rows])
    C = np.array([r["codes"] for r in rows])
    q = X[0]
    table = np.einsum("md,mkd->mk", q.reshape(16, 4), cbs)
    approx = table[np.arange(16)[None, :], C].sum(axis=1)
    true = X @ q
    corr = np.corrcoef(approx, true)[0, 1]
    assert corr > 0.8, corr


def test_pq_rerank_all_equals_exact_path(idx):
    """keep >= candidate count -> the PQ stage prunes nothing and the
    output equals the exact re-rank bit-for-bit (same rounding, same
    tie-breaks)."""
    exact = sorted(
        map(tuple, idx.ivf_topk(F.col("vec_id") < 10, nprobe=4, topk=5).collect())
    )
    viapq = sorted(
        map(
            tuple,
            idx.ivf_topk(
                F.col("vec_id") < 10, nprobe=4, topk=5, pq_rerank=10**6
            ).collect(),
        )
    )
    assert viapq == exact


def test_pq_rerank_recall_at_fixed_budget(idx):
    """At the same probe budget, an 8x-topk PQ prune keeps most of the
    exact top-5 (recall is the quality metric — the point of the prune is
    reading 8 int codes instead of 64 doubles per candidate)."""
    exact = idx.ivf_topk(F.col("vec_id") < 10, nprobe=4, topk=5).collect()
    viapq = idx.ivf_topk(
        F.col("vec_id") < 10, nprobe=4, topk=5, pq_rerank=40
    ).collect()
    want = {(r["qid"], r["cid"]) for r in exact}
    got = {(r["qid"], r["cid"]) for r in viapq}
    recall = len(want & got) / len(want)
    assert recall >= 0.85, recall


def test_pq_incremental_codes_equal_oneshot(spark, em, tmp_path):
    cut = 400
    a = SimIndex(spark, str(tmp_path / "a"), pq_m=16, pq_ks=32)
    a.build_pq(em)  # train on the FULL corpus sample before any ingest
    a.ingest(em.filter(F.col("vec_id") < cut), "b0")
    a.ingest(em.filter(F.col("vec_id") >= cut), "b1")
    b = SimIndex(spark, str(tmp_path / "b"), pq_m=16, pq_ks=32)
    b.build_pq(em)
    b.ingest(em, "all")
    cols = ["vec_id", "cid", "codes", "nrm"]
    ra = sorted(map(tuple, a._read("ivf").select(*cols).collect()))
    rb = sorted(map(tuple, b._read("ivf").select(*cols).collect()))
    assert ra == rb


def test_pq_candidate_scan_prunes_vector_column(idx):
    """100-TB evidence: in the PQ path the inverted-list scan reads
    (vec_id, nrm, codes) but NOT the 64-double vector column — only the
    survivors' join against the vector store does."""
    df = idx.ivf_topk(F.col("vec_id") < 10, nprobe=4, topk=5, pq_rerank=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet \[(.*?)\].*?Location.*?(\S*/(?:ivf|vectors)/\S*)", plan)
    ivf_cols = [cols for cols, loc in scans if "/ivf/" in loc]
    assert ivf_cols, plan
    for cols in ivf_cols:
        assert "codes" in cols
        assert re.search(r"\be#", cols) is None, cols


def test_pq_requires_flag(spark, em, tmp_path):
    ix = SimIndex(spark, str(tmp_path / "noflag"))
    ix.ingest(em, "all")
    with pytest.raises(ValueError, match="pq_m"):
        ix.ivf_topk(F.col("vec_id") < 10, pq_rerank=10).collect()
