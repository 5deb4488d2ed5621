"""Iterative DataFrame algorithms: connected components by min-label
propagation (the dedup-cluster canonicalizer).

The loop is the Spark-idiomatic iterative pattern: per round, every node
takes the min of its own label and its neighbours' labels (one equi-join +
partial/final min-agg — no global structure), with `localCheckpoint` cutting
lineage growth and a changed-row count as the convergence test. Converges in
O(graph diameter) rounds; near-dup clusters are near-cliques, so 2-4 rounds
in practice. At 100 TB each round is one shuffle on the node key — the same
cost model GraphX/GraphFrames pay, without the dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """edges(u, v) undirected → (node, component_id) where component_id is
    the minimum node id in the component. Nodes appear iff they touch an
    edge — left-join the full entity table afterwards for singletons."""
    # materialize the edge set ONCE: `sym` is referenced by every round's
    # join, and without the checkpoint each iteration would re-execute the
    # caller's full upstream lineage (for near-dup edges that's the whole
    # minhash→LSH→verify pipeline — measured 80s/round at 5k docs)
    sym = (
        edges.select("u", "v")
        .unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    lbl = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(lbl, sym.v == lbl.node)
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        new = (
            lbl.join(nbr, lbl.node == nbr.u, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nbr_min", "lbl")).alias("new_lbl"),
                "lbl",
            )
        ).localCheckpoint()
        changed = new.filter(F.col("new_lbl") < F.col("lbl")).count()
        lbl = new.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    else:
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    return lbl.select("node", F.col("lbl").alias("component_id"))
