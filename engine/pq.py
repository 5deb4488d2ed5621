"""Product quantization (PQ) for the persisted similarity index — the
asymmetric-distance coarse re-rank that makes IVF search I/O-viable at
100 TB (Jégou et al., "Product Quantization for Nearest Neighbor Search",
public literature; re-implemented from scratch).

Why: the exact IVF re-rank reads the FULL float vector of every candidate
in every probed list — at 1024-dim float32 that is 4 KB/candidate, and
candidate reads dominate search cost long before FLOPs do. PQ stores an
m-byte code per vector (subspace codebook ids); the search scores
candidates from codes alone via one per-query lookup table (built once per
query: m·ks sub-dot-products), keeps the top R, and only THOSE survivors'
full vectors are fetched for the exact top-k. The candidate scan then
reads (vec_id, codes, nrm) — a column-pruned sliver of the list table —
instead of the vector column.

Determinism: codebooks train with numpy Lloyd on the lowest-`n_train`
vec_ids (codebook training is sample-based in every production PQ system;
the sample is a bounded, documented driver collect — n_train·d doubles,
default 256·64 = 128 KB) with first-ks init and argmin tie→lowest-id, so
training, encoding, and scoring are bit-reproducible. With `keep` ≥ the
candidate count the PQ stage prunes nothing and the final top-k equals
the exact path's output exactly (the parity pytest pins this).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

PQ_ITERS = 8


def train_codebooks(
    em: DataFrame, m: int, ks: int, n_train: int = 256, iters: int = PQ_ITERS
) -> np.ndarray:
    """Train m per-subspace codebooks of ks centroids each on the lowest
    `n_train` vec_ids. Returns float64 array (m, ks, d/m)."""
    rows = (
        em.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(n_train)
        .collect()
    )
    X = np.array([r["e"] for r in rows], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        raise ValueError("empty training sample")
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if X.shape[0] < ks:
        raise ValueError(f"training sample {X.shape[0]} < ks={ks}")
    cbs = np.empty((m, ks, dsub), dtype=np.float64)
    for mi in range(m):
        sub = X[:, mi * dsub : (mi + 1) * dsub]
        cb = sub[:ks].copy()  # deterministic first-ks init
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # ties -> lowest code id
            for j in range(ks):
                pts = sub[a == j]
                if len(pts):
                    cb[j] = pts.mean(axis=0)
                # empty cell: keep the previous centroid (deterministic)
        cbs[mi] = cb
    return cbs


def codebooks_to_df(spark: SparkSession, cbs: np.ndarray) -> DataFrame:
    """(m, ks, dsub) → rows (sub int, code int, ce array<double>) for
    snapshot persistence."""
    rows = [
        (int(mi), int(j), [float(x) for x in cbs[mi, j]])
        for mi in range(cbs.shape[0])
        for j in range(cbs.shape[1])
    ]
    return spark.createDataFrame(rows, "sub int, code int, ce array<double>")


def df_to_codebooks(df: DataFrame) -> np.ndarray:
    rows = df.collect()  # m·ks rows — metadata-scale
    m = max(r["sub"] for r in rows) + 1
    ks = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["ce"])
    cbs = np.empty((m, ks, dsub), dtype=np.float64)
    for r in rows:
        cbs[r["sub"], r["code"]] = r["ce"]
    return cbs


def encode_codes(df: DataFrame, cbs: np.ndarray, vec_col: str = "e") -> DataFrame:
    """Add `codes` (array<int>, length m): per-subspace nearest codebook
    entry. One Arrow-batched pandas_udf — the argmin over ks runs as one
    numpy matmul per subspace per batch, no per-row Python."""
    m, ks, dsub = cbs.shape
    cb_sq = (cbs**2).sum(axis=2)  # (m, ks)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(col: pd.Series) -> pd.Series:
        X = np.array(col.tolist(), dtype=np.float64)  # (n, d)
        if X.size == 0:
            return pd.Series([], dtype=object)
        out = np.empty((X.shape[0], m), dtype=np.int32)
        for mi in range(m):
            sub = X[:, mi * dsub : (mi + 1) * dsub]
            # ||x-c||² = ||c||² - 2x·c (+||x||², constant per row)
            d2 = cb_sq[mi][None, :] - 2.0 * (sub @ cbs[mi].T)
            out[:, mi] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in out])

    return df.withColumn("codes", enc(F.col(vec_col)))


def pq_prune(cand: DataFrame, cbs: np.ndarray, keep: int) -> DataFrame:
    """Asymmetric-distance coarse re-rank: `cand` rows
    (qid, qe array<double>, qnrm, vec_id, nrm, codes) → the `keep` best
    per query by PQ-approximated cosine. Per query group the lookup table
    is built ONCE (m·ks sub-dots), then every candidate costs m table
    lookups — numpy fancy indexing over the whole Arrow batch."""
    m, ks, dsub = cbs.shape

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        q = np.array(pdf["qe"].iloc[0], dtype=np.float64).reshape(m, dsub)
        qnrm = float(pdf["qnrm"].iloc[0])
        # (m, ks) table of q_sub · codebook entry
        table = np.einsum("md,mkd->mk", q, cbs)
        codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
        approx_dot = table[np.arange(m)[None, :], codes].sum(axis=1)
        sim = approx_dot / (qnrm * pdf["nrm"].to_numpy(dtype=np.float64))
        return pd.DataFrame(
            {"qid": pdf["qid"], "vec_id": pdf["vec_id"], "pq_sim": sim}
        )

    scored = cand.groupBy("qid").applyInPandas(
        score, "qid bigint, vec_id bigint, pq_sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("pq_sim"), "vec_id")
    return (
        scored.withColumn("_prn", F.row_number().over(w))
        .filter(F.col("_prn") <= keep)
        .drop("_prn")
    )
