"""Persisted, incrementally-maintained document dedup index — the MinHash-
LSH near-duplicate pipeline (engine/textops.py) restructured so that a new
document batch costs O(batch + touched buckets), never O(corpus).

`neardup_canonical_docs` / `neardup_components_docs` recompute token
hashing, minhash banding, candidate generation, Jaccard verification and
the component fixpoint from the whole corpus on every run. At 100 TB the
index state is the asset; `DocDedupIndex` persists it under the same
snapshot-store + fingerprint-manifest machinery as the tier pipeline:

    <root>/
      _manifest/  # per-batch fingerprints (content + config token)
      tokens/     # (doc_id, tids sorted array<long>, n) by batch —
                  #   the verification store (exact Jaccard needs sets)
      bands/      # (doc_id, band_key) by (batch, band, kb) where
                  #   kb = pmod(band_key, N_KB) — the LSH bucket index
      cand/       # star+chain candidate edges by (band, kb) — REWRITTEN
                  #   per touched partition, never appended
      verified/   # Jaccard-verified edges by (band, kb), mirroring cand
      labels/     # (node, component_id) — min-id component labels over
                  #   the verified pair graph

Refresh contract (`ingest(docs_batch, batch_id)`):

1. token arrays + band signatures are computed for the NEW batch only and
   appended under `batch=<id>` partitions;
2. the TOUCHED bucket partitions — the ≤ n_bands × N_KB (band, kb) dirs
   containing any new doc (plus, on a re-roll, the batch's old dirs) —
   are recomputed WHOLLY: star+chain candidates depend on the bucket's
   full membership and id order (a new doc can rewire a chain edge away),
   so per-bucket rewrite is what keeps the candidate set BIT-EXACT equal
   to a full rebuild's. The bands scan for this is partition-pruned to
   the touched dirs;
3. verification runs on the touched partitions' candidates only —
   candidate-bounded joins against the token store (array_intersect,
   JVM-side);
4. component labels are recomputed over the VERIFIED PAIR GRAPH — O(pairs
   + dup-cluster nodes), not O(corpus): candidate deletion (the rewired
   chain) can split a component, which union-only incremental labeling
   cannot express, so the fixpoint re-runs — but over dup pairs only,
   typically a small fraction of the corpus, with the O(log n)
   pointer-jumping loop (engine/graph.py).

The resulting `pairs()` and `components()` equal the full-rebuild
`neardup_verified_pairs` / `connected_components` outputs bit-exactly
(pytest + a driver query pinned to the recursive-CTE oracle). Re-ingesting
an unchanged batch is a fingerprint no-op; a changed batch re-rolls its
own partitions plus its buckets.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .checkpoint import Manifest, new_run_id, pending_rows, work_manifest
from .simindex import MERGED_BATCH
from .snapstore import SnapStore

#: band_key -> directory bucket (band_key cardinality is unbounded; kb
#: folds it to a partition-friendly range while keeping refresh scans
#: pruned to ≤ n_bands × N_KB dirs)
N_KB = 16
_JACCARD = 0.5


class DocDedupIndex:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.manifest = Manifest(spark, os.path.join(root, "_manifest"))

    # -- stores (same snapshot mechanics as SimIndex) -----------------------
    def _store(self, name: str) -> SnapStore:
        return SnapStore(os.path.join(self.root, name))

    def _has(self, name: str) -> bool:
        return self._store(name).current_id() is not None

    def _has_data(self, name: str) -> bool:
        store = self._store(name)
        sid = store.current_id()
        if sid is None:
            return False
        p = store.snapshot_path(sid)
        return any(os.path.isdir(os.path.join(p, d)) for d in os.listdir(p))

    def _read(self, name: str) -> DataFrame:
        return self._store(name).read(self.spark)

    def _write(
        self,
        name: str,
        df: DataFrame,
        partition_cols: list[str],
        drop_first: str | None = None,
        drop_dirs: list[str] | None = None,
    ) -> None:
        store = self._store(name)
        sid = store.begin("ingest:" + ",".join(partition_cols))
        try:
            for d in [drop_first] if drop_first else []:
                shutil.rmtree(
                    os.path.join(store.snapshot_path(sid), d),
                    ignore_errors=True,
                )
            # a recomputed bucket that came out EMPTY writes no partition,
            # so its stale files must be dropped explicitly — dynamic
            # overwrite only replaces partitions present in the new data
            for d in drop_dirs or []:
                shutil.rmtree(
                    os.path.join(store.snapshot_path(sid), d),
                    ignore_errors=True,
                )
            (
                df.write.option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_cols)
                .mode("overwrite")
                .parquet(store.snapshot_path(sid))
            )
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)

    # -- ingest --------------------------------------------------------------
    def ingest(self, docs: DataFrame, batch_id: str, run_id: str | None = None) -> dict:
        from .textops import _doc_token_ids, _minhash_bands

        run_id = run_id or new_run_id()
        work = work_manifest(
            docs.withColumn("_b", F.lit(batch_id)),
            F.col("_b"),
            ["doc_id", "text"],
            "batch",
            extra_token=f"kb:{N_KB}|j:{_JACCARD}",
        )
        pending = pending_rows(work.collect(), self.manifest, "dedupindex")
        if not pending:
            return {"batch": batch_id, "ingested": False}
        if batch_id == MERGED_BATCH:
            raise ValueError(f"{MERGED_BATCH!r} is reserved for compact()")
        self._refuse_compacted_reroll(batch_id)

        tw = _doc_token_ids(docs)
        toks = tw.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("tid")).alias("tids"),
            F.count("*").alias("n"),
        )
        bands = _minhash_bands(self.spark, tw).withColumn(
            "kb", F.pmod("band_key", F.lit(N_KB)).cast("int")
        )
        bands = bands.localCheckpoint()

        # touched buckets: the new rows' dirs, plus this batch's OLD dirs on
        # a re-roll (its docs leave those buckets; their candidates must be
        # recomputed without them) — ≤ n_bands × N_KB values, metadata-scale
        touched = {
            (r["band"], r["kb"])
            for r in bands.select("band", "kb").distinct().collect()
        }
        drop = f"batch={batch_id}"
        if self._has_data("bands"):
            touched |= {
                (r["band"], r["kb"])
                for r in self._read("bands")
                .filter(F.col("batch") == batch_id)
                .select("band", "kb")
                .distinct()
                .collect()
            }

        bcol = F.lit(batch_id).alias("batch")
        self._write(
            "tokens", toks.select(bcol, "doc_id", "tids", "n"), ["batch"],
            drop_first=drop,
        )
        self._write(
            "bands",
            bands.select(bcol, "doc_id", "band", "kb", "band_key"),
            ["batch", "band", "kb"],
            drop_first=drop,
        )

        if touched:
            self._rebuild_buckets(sorted(touched))
        self._rebuild_labels()
        self.manifest.commit(
            [
                {
                    "run_id": run_id,
                    "stage": "dedupindex",
                    "partition_key": r["partition_key"],
                    "rows_in": r["rows_in"],
                    "input_snapshot_id": r["input_snapshot_id"],
                    "output_snapshot_id": self.root,
                    "lineage": "ingest",
                }
                for r in pending
            ]
        )
        return {
            "batch": batch_id,
            "ingested": True,
            "touched_buckets": len(touched),
        }

    def _refuse_compacted_reroll(self, batch_id: str) -> None:
        """A pending-but-previously-committed batch whose partition dirs
        were merged by compact() can no longer be re-rolled surgically: the
        touched-bucket discovery reads `batch == batch_id` rows that no
        longer exist, so its old buckets would silently keep stale
        candidates. Refuse instead."""
        store = self._store("tokens")
        sid = store.current_id()
        if sid is None or os.path.isdir(
            os.path.join(store.snapshot_path(sid), f"batch={batch_id}")
        ):
            return
        was_committed = (
            self.manifest.committed_keys("dedupindex")
            .filter(F.col("partition_key") == f"batch={batch_id}")
            .count()
            > 0
        )
        if was_committed:
            raise ValueError(
                f"batch {batch_id!r} was merged by compact(); re-roll it as "
                "a NEW batch id or rebuild the index root"
            )

    def compact(self) -> dict[str, int]:
        """Merge per-batch `tokens`/`bands` partitions into one
        ``batch=__base__`` partition — the small-files lifecycle step after
        steady incremental ingestion. `cand`/`verified`/`labels` carry no
        batch dimension and are untouched. Reads answer identically before
        and after (batch never enters query logic); unchanged re-ingests
        stay fingerprint no-ops; content re-rolls of compacted history are
        refused by ingest(). Returns per-table merged-partition counts."""
        out: dict[str, int] = {}
        for name, pcols in (
            ("tokens", ["batch"]),
            ("bands", ["batch", "band", "kb"]),
        ):
            if not self._has_data(name):
                continue
            store = self._store(name)
            cur = store.snapshot_path(store.current_id())
            old_dirs = [
                d
                for d in os.listdir(cur)
                if d.startswith("batch=") and d != f"batch={MERGED_BATCH}"
            ]
            if not old_dirs:
                out[name] = 0
                continue
            # the scan lists files in the CURRENT snapshot; the staged dir
            # is a separate hardlink tree, so dropping batch dirs there
            # never touches the inodes being read
            merged = self._read(name).withColumn("batch", F.lit(MERGED_BATCH))
            self._write(name, merged, pcols, drop_dirs=old_dirs)
            out[name] = len(old_dirs)
        return out

    def _rebuild_buckets(self, touched: list[tuple[int, int]]) -> None:
        """Recompute candidates + verification for exactly the touched
        (band, kb) partitions. The bands scan prunes to those dirs (filter
        on partition columns); every later join is candidate-bounded."""
        from functools import reduce

        # OR-chain of (band, kb) conjunctions: plain comparisons on the
        # partition columns reach the scan as PartitionFilters (a struct
        # isin would not), so only the touched dirs are read
        cond = reduce(
            lambda a, b: a | b,
            [
                (F.col("band") == b) & (F.col("kb") == k)
                for b, k in touched
            ],
        )
        rows = self._read("bands").filter(cond)
        bucket_min = rows.groupBy("band", "kb", "band_key").agg(
            F.min("doc_id").alias("min_doc")
        )
        star = (
            rows.join(bucket_min, ["band", "kb", "band_key"])
            .filter(F.col("doc_id") != F.col("min_doc"))
            .select(
                "band", "kb",
                F.col("min_doc").alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
            )
        )
        w = Window.partitionBy("band", "kb", "band_key").orderBy("doc_id")
        chain = (
            rows.select(
                "band", "kb",
                F.lag("doc_id").over(w).alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
            )
            .filter(F.col("doc_a").isNotNull())
        )
        cand = star.unionByName(chain).distinct().localCheckpoint()
        touched_dirs = [f"band={b}/kb={k}" for b, k in touched]
        self._write("cand", cand, ["band", "kb"], drop_dirs=touched_dirs)

        toks = self._read("tokens").select("doc_id", "tids", "n")
        ids_a = cand.select(F.col("doc_a").alias("doc_id")).distinct()
        ids_b = cand.select(F.col("doc_b").alias("doc_id")).distinct()
        ta = toks.join(F.broadcast(ids_a), "doc_id").select(
            F.col("doc_id").alias("doc_a"),
            F.col("tids").alias("ta"), F.col("n").alias("na"),
        )
        tb = toks.join(F.broadcast(ids_b), "doc_id").select(
            F.col("doc_id").alias("doc_b"),
            F.col("tids").alias("tb"), F.col("n").alias("nb"),
        )
        common = F.size(F.array_intersect("ta", "tb"))
        verified = (
            cand.join(ta, "doc_a")
            .join(tb, "doc_b")
            .withColumn("n_common", common)
            .filter(
                F.col("n_common") * 1.0
                / (F.col("na") + F.col("nb") - F.col("n_common"))
                >= _JACCARD
            )
            .select("band", "kb", "doc_a", "doc_b")
        )
        self._write("verified", verified, ["band", "kb"], drop_dirs=touched_dirs)

    def _rebuild_labels(self) -> None:
        """Component fixpoint over the verified PAIR graph — O(dup pairs),
        not O(corpus); O(log n) rounds via pointer jumping."""
        from .graph import connected_components

        pairs = self.pairs()
        store = self._store("labels")
        sid = store.begin("labels")
        try:
            if pairs.isEmpty():
                shutil.rmtree(
                    os.path.join(store.snapshot_path(sid), "data"),
                    ignore_errors=True,
                )
            else:
                comps = connected_components(
                    pairs.select(
                        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
                    )
                )
                comps.write.mode("overwrite").parquet(
                    os.path.join(store.snapshot_path(sid), "data")
                )
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)

    # -- reads ---------------------------------------------------------------
    def pairs(self) -> DataFrame:
        """Verified near-dup pairs (doc_a < doc_b), deduped across bands —
        bit-exact equal to neardup_verified_pairs over the full corpus."""
        if not self._has_data("verified"):
            return self.spark.createDataFrame([], "doc_a bigint, doc_b bigint")
        return self._read("verified").select("doc_a", "doc_b").distinct()

    def expire(self, keep_last: int = 1) -> dict[str, list[str]]:
        out = {}
        for name in ("tokens", "bands", "cand", "verified", "labels"):
            if self._has(name):
                out[name] = self._store(name).expire(keep_last=keep_last)
        return out

    def components(self) -> DataFrame:
        """(node, component_id) for every doc in a dup cluster; singletons
        are absent (join the doc table with coalesce for full labels)."""
        store = self._store("labels")
        sid = store.current_id()
        if sid is None or not os.path.isdir(
            os.path.join(store.snapshot_path(sid), "data")
        ):
            return self.spark.createDataFrame([], "node bigint, component_id bigint")
        return self.spark.read.parquet(
            os.path.join(store.snapshot_path(sid), "data")
        )


# ---------------------------------------------------------------------------
# driver query: the persisted incremental index must answer identically to
# the full-rebuild components query — pinned to the same recursive-CTE
# oracle, so the hash gate re-proves incremental == rebuild every round.
# ---------------------------------------------------------------------------

from . import textops as _textops  # noqa: E402,F401  (registers the oracle)
from .queries import ORACLE_SQL, _t, register  # noqa: E402


@register(
    "dedupindex_components_docs", ORACLE_SQL["neardup_components_docs"]
)
def dedupindex_components_docs(spark, sf_dir):
    """Connected-component labels served from the PERSISTED dedup index
    after two incremental batch ingests — same oracle as the full-rebuild
    neardup_components_docs."""
    import tempfile

    d = _t(spark, sf_dir, "documents")
    idx = DocDedupIndex(spark, tempfile.mkdtemp(prefix="dedupindex-q-"))
    mid = (d.agg(F.max("doc_id")).first()[0] + 1) // 2
    idx.ingest(d.filter(F.col("doc_id") < mid), "b0")
    idx.ingest(d.filter(F.col("doc_id") >= mid), "b1")
    comps = idx.components()
    return (
        d.select("doc_id")
        .join(comps, d.doc_id == comps.node, "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").cast("long").alias("component_id"),
        )
    )
