"""Bit-exactness pins for the Arrow-vectorized hot paths (guide §4.2).

Every numpy reformulation in simsearch/simindex claims the SAME float64
left-fold addition order as the original interpreted HOF expressions —
these tests compare each vectorized path against its JVM reference on the
real embeddings fixture and require EXACT equality (not tolerance): any
reordering of float additions would show up as a mismatch here before it
could reach an oracle hash.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from engine import io as eio  # noqa: E402
from engine.simsearch import (  # noqa: E402
    _dot,
    _vec_d,
    assign_centroids,
    lsh_table_buckets,
    lsh_table_buckets_hof,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    df = eio.read_table(spark, SF_DIR, "embeddings")
    df.cache().count()
    return df


def test_lsh_buckets_bit_identical_to_hof(spark, embeddings):
    fast = lsh_table_buckets(embeddings, 6, 5).toPandas()
    ref = lsh_table_buckets_hof(embeddings, 6, 5).toPandas()
    key = ["vec_id", "tbl"]
    fast = fast.sort_values(key, ignore_index=True)
    ref = ref.sort_values(key, ignore_index=True)
    assert fast.equals(ref)


def _hof_assignment(em, cents, n_queries, nprobe):
    """The original crossJoin + interpreted-dot + row_number formulation
    (the plan assign_centroids replaced), as the exactness reference."""
    v = em.select("vec_id", _vec_d("embedding").alias("e")).withColumn(
        "nrm", F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    c = cents.withColumn("cnrm", F.sqrt(_dot(F.col("ce"), F.col("ce"))))
    sim_c = _dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cnrm"))
    w_v = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cid")
    return (
        v.crossJoin(F.broadcast(c.select("cid", "ce", "cnrm")))
        .select("vec_id", "nrm", "cid", sim_c.alias("sim"))
        .withColumn("crn", F.row_number().over(w_v))
        .filter(
            (F.col("crn") == 1)
            | ((F.col("vec_id") < n_queries) & (F.col("crn") <= nprobe))
        )
        .select("vec_id", "nrm", "cid", "sim", "crn")
    )


@pytest.mark.parametrize("n_queries,nprobe", [(0, 1), (10, 4)])
def test_assign_centroids_bit_identical_to_hof(
    spark, embeddings, n_queries, nprobe
):
    cents = (
        embeddings.select("vec_id", _vec_d("embedding").alias("ce"))
        .orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cid"), "ce")
    )
    fast = (
        assign_centroids(
            embeddings.select("vec_id", _vec_d("embedding").alias("e")),
            cents,
            n_queries=n_queries,
            nprobe=nprobe,
        )
        .select("vec_id", "nrm", "cid", "sim", "crn")
        .toPandas()
    )
    ref = _hof_assignment(embeddings, cents, n_queries, nprobe).toPandas()
    key = ["vec_id", "crn"]
    fast = fast.sort_values(key, ignore_index=True)
    ref = ref.sort_values(key, ignore_index=True)
    # exact: same assignments, same tie-breaks, bit-identical sims + norms
    assert fast[["vec_id", "cid", "crn"]].equals(ref[["vec_id", "cid", "crn"]])
    assert (fast["sim"].to_numpy() == ref["sim"].to_numpy()).all()
    assert (fast["nrm"].to_numpy() == ref["nrm"].to_numpy()).all()
