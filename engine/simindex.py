"""Persisted, incrementally-maintained similarity indexes (VERDICT r3 #1).

At 100 TB the similarity index IS the asset: rebuilding LSH buckets or IVF
inverted lists from the full corpus on every query run (what
`engine/simsearch.py` does per call) re-pays O(corpus) work that an
ingestion pipeline should pay once per NEW batch. `SimIndex` stores the
index state as snapshot-versioned tables (engine/snapstore.py) gated by the
same fingerprint manifest the tier pipeline uses (engine/checkpoint.py):

    <root>/
      _manifest/   # per-batch fingerprints: resume + config gate
      lsh/         # (vec_id) partitioned by batch, tbl, bucket
      ivf/         # inverted lists WITH vectors: (vec_id, e, nrm)
                   #   partitioned by batch, cid — the FAISS shape: probing
                   #   a list reads everything re-rank needs, no join back
      vectors/     # (vec_id, e, nrm) partitioned by batch — re-rank store
                   #   for LSH pair verification
      centroids/   # k rows (cid, ce) — FROZEN at build time
      pairs/       # verified near-dup pairs, partitioned by batch

Incremental maintenance contract:

- `ingest(em_batch, batch_id)` hashes and assigns ONLY the new batch
  (O(batch) compute; one shuffle each for the lsh/ivf group-bys), writes
  its `batch=<id>/...` partitions, and — because the LSH hyperplanes and
  the frozen centroids are deterministic — the resulting index state is
  BIT-EXACT equal to a full rebuild over the union of batches (pytest'd).
- The per-batch manifest fingerprint covers the batch rows AND the index
  config (plane counts + a centroid-content token), so re-ingesting an
  unchanged batch is a no-op and retraining centroids marks every batch
  pending for re-assignment — config evolution as a fingerprint change,
  the same pattern as TierPipeline.sketch_cols. A re-rolled batch's old
  partitions are dropped inside the same snapshot commit (dynamic
  overwrite alone would leave stale sub-partitions the new data no longer
  touches).
- New-vs-index candidates (`pairs` maintenance) join the new batch's
  bucket rows (broadcast) against the STORED lsh table on its PARTITION
  columns (tbl, bucket): partition pruning restricts the stored scan to
  colliding bucket directories — the inverted-list read pattern — so a
  refresh never rescans the whole index. Pairs discovered at batch N
  involve at least one batch-N vector; unioning the per-batch pair
  partitions therefore reproduces the full-rebuild pair set exactly
  (every pair is emitted exactly once, at the LATER member's ingest).
  Caveat: batches are treated as append-only corpus growth — re-rolling
  an OLD batch with different content refreshes that batch's own
  partitions but does not retroactively re-verify pair partitions of
  later batches; a content rewrite of history warrants `rebuild_pairs()`.
- `expire(keep_last=N)` GCs old snapshots per table.

The LSH partition layout (tbl, bucket) holds while bucket cardinality
(2^planes_per_table × n_tables) stays directory-friendly; with many more
planes the same design swaps partitionBy for bucketBy(bucket) hash
buckets. LSH pair verification broadcasts the per-refresh candidate set,
restricts the vector store to candidate ids broadcast-side, and only then
joins — every join in the refresh is bounded by the candidate count, never
by the corpus.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .checkpoint import Manifest, new_run_id, pending_rows, work_manifest
from .simsearch import _dot, _vec_d, lsh_table_buckets
from .io import spread_partitions
from .snapstore import SnapStore

_PAIR_THRESHOLD = 0.5

#: partition value `compact()` merges history into — reserved, not a valid
#: user batch id
MERGED_BATCH = "__base__"

#: row-block size for the gemm candidate screen in _verify_bucket_pairs —
#: bounds the similarity block at ~BLOCK × bucket_size doubles
_VERIFY_BLOCK = 512
#: screening margin: pairs whose FAST (pairwise-sum) similarity is within
#: this of the threshold are decided by the exact left-fold recompute. The
#: reordering error of a 64-term float64 dot is ≤ 64·eps·Σ|aᵢbᵢ| ≤
#: 64·2.3e-16·(na·nb) (Cauchy–Schwarz), i.e. < 1.5e-14 on the cosine —
#: 1e-9 over-covers it by 4+ orders, so the fast screen can never drop a
#: pair the exact computation would keep.
_VERIFY_MARGIN = 1e-9


def _fold_dots(EA, EB):
    """Row-wise dot products with the same float64 left-fold addition order
    as the engine's `_dot` JVM expression (aggregate over zip_with): acc
    starts at 0.0 and adds a[d]·b[d] in ascending d — bit-identical
    results, vectorized across rows."""
    import numpy as np

    acc = np.zeros(EA.shape[0], dtype=np.float64)
    for d in range(EA.shape[1]):
        acc = acc + EA[:, d] * EB[:, d]
    return acc


def _verify_bucket_pairs(pdf):
    """Grouped-map verifier for one (tbl, bucket) group: rows are that
    bucket's members (vec_id, e, is_new). Emits every near-dup pair
    touching a NEW member — new×new once (lower id first) plus new×stored —
    with sim ≥ _PAIR_THRESHOLD, as (vec_a=min_id, vec_b=max_id, sim).

    Two-phase exactness: a blocked gemm computes fast similarities for
    SCREENING only (margin-widened threshold, see _VERIFY_MARGIN); every
    surviving pair's similarity is then recomputed with the exact left-fold
    order (_fold_dots) and the exact value both decides the threshold and
    is emitted. Output is therefore bit-identical to evaluating the `_dot`
    JVM expression per pair, at dgemm speed."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "vec_a": np.array([], dtype=np.int64),
            "vec_b": np.array([], dtype=np.int64),
            "sim": np.array([], dtype=np.float64),
        }
    )
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    is_new = pdf["is_new"].to_numpy(dtype=bool)
    n = len(ids)
    if n < 2 or not is_new.any():
        return empty
    E = np.asarray(pdf["e"].tolist(), dtype=np.float64)
    nrm = np.sqrt(_fold_dots(E, E))  # exact fold + IEEE sqrt == JVM
    new_idx = np.flatnonzero(is_new)
    thresh = _PAIR_THRESHOLD - _VERIFY_MARGIN
    sel_a: list = []
    sel_b: list = []
    with np.errstate(divide="ignore", invalid="ignore"):
        for s in range(0, len(new_idx), _VERIFY_BLOCK):
            blk = new_idx[s : s + _VERIFY_BLOCK]
            S = (E[blk] @ E.T) / (nrm[blk][:, None] * nrm[None, :])
            ii, jj = np.nonzero(S >= thresh)
            gi, gj = blk[ii], jj
            # j stored: keep any order; j new: keep only id_i < id_j so each
            # new×new pair is enumerated exactly once; never self-pairs
            keep = (~is_new[gj]) | (ids[gi] < ids[gj])
            keep &= ids[gi] != ids[gj]
            sel_a.append(gi[keep])
            sel_b.append(gj[keep])
    ia = np.concatenate(sel_a) if sel_a else np.array([], dtype=np.int64)
    if len(ia) == 0:
        return empty
    ib = np.concatenate(sel_b)
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = _fold_dots(E[ia], E[ib]) / (nrm[ia] * nrm[ib])
    m = sims >= _PAIR_THRESHOLD
    if not m.any():
        return empty
    ia, ib, sims = ia[m], ib[m], sims[m]
    a_ids, b_ids = ids[ia], ids[ib]
    return pd.DataFrame(
        {
            "vec_a": np.minimum(a_ids, b_ids),
            "vec_b": np.maximum(a_ids, b_ids),
            "sim": sims,
        }
    )


class SimIndex:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_tables: int = 6,
        planes_per_table: int = 5,
        k: int = 16,
        pq_m: int = 0,
        pq_ks: int = 16,
    ):
        """`pq_m` > 0 enables product-quantization codes on the inverted
        lists (engine/pq.py): every ingested vector also stores an
        m-subspace code, and `ivf_topk(pq_rerank=R)` scores candidates
        from codes alone before fetching full vectors for the exact
        top-k — the I/O shape that survives 1000× vector-store growth."""
        self.spark = spark
        self.root = root
        self.n_tables = n_tables
        self.planes_per_table = planes_per_table
        self.k = k
        self.pq_m = pq_m
        self.pq_ks = pq_ks
        self.manifest = Manifest(spark, os.path.join(root, "_manifest"))

    # -- stores --------------------------------------------------------------
    def _store(self, name: str) -> SnapStore:
        return SnapStore(os.path.join(self.root, name))

    def _read(self, name: str) -> DataFrame:
        return self._store(name).read(self.spark)

    def _write_partitions(
        self,
        name: str,
        df: DataFrame,
        partition_cols: list[str],
        drop_first: str | None = None,
    ) -> None:
        """Dynamic-partition overwrite into a fresh published snapshot —
        concurrent readers keep their pinned pre-refresh view. `drop_first`
        removes a partition subtree (e.g. ``batch=b1``) inside the staged
        snapshot before the write, so a re-rolled batch leaves no stale
        sub-partitions the new data no longer touches."""
        store = self._store(name)
        sid = store.begin("ingest")
        try:
            if drop_first is not None:
                shutil.rmtree(
                    os.path.join(store.snapshot_path(sid), drop_first),
                    ignore_errors=True,
                )
            (
                spread_partitions(df, partition_cols)
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_cols)
                .mode("overwrite")
                .parquet(store.snapshot_path(sid))
            )
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)

    def _has(self, name: str) -> bool:
        return self._store(name).current_id() is not None

    # -- centroids (frozen at build; retrain = config change) ----------------
    def build_centroids(self, em: DataFrame, mode: str = "first_k") -> str:
        """Train and persist the IVF coarse quantizer. `first_k` freezes the
        k lowest vec_ids (deterministic, DuckDB-replayable); `kmeans` runs
        the kmeans-lite trainer (engine/simsearch.kmeans_centroids).
        Returns the centroid content token that enters every batch
        fingerprint — retraining changes the token, which marks every
        ingested batch pending for re-assignment."""
        if mode == "first_k":
            cents = (
                em.select("vec_id", _vec_d("embedding").alias("ce"))
                .orderBy("vec_id")
                .limit(self.k)
                .select(F.col("vec_id").alias("cid"), "ce")
            )
        elif mode == "kmeans":
            from .simsearch import kmeans_centroids

            cents = kmeans_centroids(em, k=self.k)
        else:
            raise ValueError(mode)
        store = self._store("centroids")
        sid = store.begin("train")
        try:
            # a "data" subdir keeps the snapshot's meta.json out of the
            # overwrite's blast radius
            cents.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(store.snapshot_path(sid), "data")
            )
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)
        return self.centroid_token()

    def centroids(self) -> DataFrame:
        return self._read("centroids")

    def centroid_token(self) -> str:
        """Order-insensitive content fingerprint of the centroid table —
        k rows, metadata-scale."""
        if not self._has("centroids"):
            return "cent:none"
        r = (
            self.centroids()
            .select(F.xxhash64("cid", F.col("ce").cast("string")).alias("h"))
            .agg(F.bit_xor("h").alias("x"), F.count("*").alias("n"))
            .first()
        )
        return f"cent:{r['n']}:{r['x']}"

    # -- PQ codebooks (frozen at build; retrain = config change) -------------
    def build_pq(self, em: DataFrame) -> str:
        """Train and persist the PQ sub-codebooks (engine/pq.py). Returns
        the codebook content token; like centroid retraining, a codebook
        change alters every batch fingerprint and marks the index for
        re-encoding."""
        from .pq import codebooks_to_df, train_codebooks

        cbs = train_codebooks(em, self.pq_m, self.pq_ks)
        store = self._store("pq")
        sid = store.begin("train")
        try:
            codebooks_to_df(self.spark, cbs).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(store.snapshot_path(sid), "data"))
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)
        return self.pq_token()

    def pq_codebooks(self):
        from .pq import df_to_codebooks

        return df_to_codebooks(self._read("pq"))

    def pq_token(self) -> str:
        if not self._has("pq"):
            return "pq:none"
        r = (
            self._read("pq")
            .select(
                F.xxhash64("sub", "code", F.col("ce").cast("string")).alias("h")
            )
            .agg(F.bit_xor("h").alias("x"), F.count("*").alias("n"))
            .first()
        )
        return f"pq:{self.pq_m}x{self.pq_ks}:{r['n']}:{r['x']}"

    def _config_token(self) -> str:
        tok = f"lsh:{self.n_tables}x{self.planes_per_table}|{self.centroid_token()}"
        if self.pq_m:
            tok += f"|{self.pq_token()}"
        return tok

    # -- ingest --------------------------------------------------------------
    def ingest(self, em: DataFrame, batch_id: str, run_id: str | None = None) -> dict:
        """Index one batch: O(batch) hashing/assignment, `batch=<id>`
        partition writes, and incremental near-dup pair maintenance.
        Fingerprint-gated: an unchanged (batch, config) is a no-op; a
        changed batch or config re-rolls exactly that batch's partitions.
        `batch_id` must be a filesystem-safe token."""
        if batch_id == MERGED_BATCH:
            raise ValueError(f"{MERGED_BATCH!r} is reserved for compact()")
        if not self._has("centroids"):
            self.build_centroids(em)
        if self.pq_m and not self._has("pq"):
            self.build_pq(em)
        run_id = run_id or new_run_id()
        work = work_manifest(
            em.withColumn("_b", F.lit(batch_id)),
            F.col("_b"),
            ["vec_id", "embedding"],
            "batch",
            extra_token=self._config_token(),
        )
        pending = pending_rows(work.collect(), self.manifest, "simindex")
        if not pending:
            return {"batch": batch_id, "ingested": False}
        self._refuse_compacted_reroll(batch_id)

        bcol = F.lit(batch_id).alias("batch")
        new_buckets = lsh_table_buckets(
            em, self.n_tables, self.planes_per_table
        ).localCheckpoint()

        # IVF assignment against the FROZEN centroids, vectorized: ONE
        # Arrow pass computes every vector's norm + best-centroid
        # assignment with the exact left-fold float order (bit-identical
        # nrm/cid/sim to the former n×k crossJoin + interpreted HOF dot +
        # row_number window — see simsearch.assign_centroids). The
        # materialized result feeds the ivf write, the vectors write AND
        # the pair verifier, so the batch is scanned/hashed once, not
        # three times.
        from .simsearch import assign_centroids

        asn = assign_centroids(
            em.select("vec_id", _vec_d("embedding").alias("e")),
            self.centroids(),
        ).select("vec_id", "e", "nrm", "cid").localCheckpoint()
        v = asn.select("vec_id", "e", "nrm")

        # near-dup pairs BEFORE appending the batch: new-vs-stored uses the
        # partition-pruned stored index (excluding this batch's own prior
        # rows on a re-roll); new-vs-new collides locally. Every cross-batch
        # pair is emitted exactly once — at the later ingest.
        pairs = self._pairs_for_batch(v, new_buckets, batch_id)

        drop = f"batch={batch_id}"
        # the four tables live in independent snapshot stores and their
        # inputs are already pinned (buckets localCheckpoint'd, centroids
        # broadcast, pairs' candidate set checkpointed) — submit the write
        # jobs from 4 threads so one batch ingest pays max(job) wall time,
        # not the sum of four scheduler round-trips. Spark's scheduler is
        # explicitly multi-thread-submission safe; each write touches only
        # its own store directory.
        from concurrent.futures import ThreadPoolExecutor

        ivf_rows = asn.select(bcol, "vec_id", "e", "nrm", "cid")
        if self.pq_m:
            from .pq import encode_codes

            ivf_rows = encode_codes(ivf_rows, self.pq_codebooks())
        writes = [
            (
                "lsh",
                new_buckets.select(bcol, "vec_id", "tbl", "bucket"),
                ["batch", "tbl", "bucket"],
            ),
            ("ivf", ivf_rows, ["batch", "cid"]),
            ("vectors", v.select(bcol, "vec_id", "e", "nrm"), ["batch"]),
            ("pairs", pairs.select(bcol, "vec_a", "vec_b", "sim"), ["batch"]),
        ]
        with ThreadPoolExecutor(max_workers=len(writes)) as ex:
            futs = [
                ex.submit(
                    self._write_partitions, n, df, pc, drop_first=drop
                )
                for n, df, pc in writes
            ]
            for f in futs:
                f.result()
        self.manifest.commit(
            [
                {
                    "run_id": run_id,
                    "stage": "simindex",
                    "partition_key": r["partition_key"],
                    "rows_in": r["rows_in"],
                    "input_snapshot_id": r["input_snapshot_id"],
                    "output_snapshot_id": self.root,
                    "lineage": "ingest",
                }
                for r in pending
            ]
        )
        return {"batch": batch_id, "ingested": True}

    def _pairs_for_batch(
        self, v_new: DataFrame, new_buckets: DataFrame, batch_id: str
    ) -> DataFrame:
        """Verified near-dup pairs touching the new batch, computed
        per-bucket inside one grouped Arrow pass (guide §4.2 / §8): the
        bucket rows carry their vectors into the group, pair enumeration +
        exact-cosine verification happen batch-vectorized in numpy, and only
        the surviving (vec_a, vec_b, sim) rows ever leave the worker.

        The previous shape materialized the full candidate-pair id set
        (quadratic per bucket — 163M rows for 20k vectors at sf1),
        distinct'd and localCheckpoint'd it, then joined vectors back on and
        evaluated an interpreted 64-element HOF dot per pair (~168 s).
        This shape shuffles only the bucket rows themselves (O(corpus ·
        n_tables) small rows, 66 MB at sf1) and emits ~1.7k verified rows.

        Semantics are unchanged and bit-exact: the verifier recomputes every
        emitted (and every near-threshold) similarity with the same float64
        left-fold addition order as the _dot JVM expression (see
        _verify_bucket_pairs), so sims, the ≥ threshold set, and the rounded
        values are identical to the old plan — pytest-pinned against the
        registered embedding_neardup_pairs oracle query.

        Stored-side reads stay partition-pruned: the stored LSH scan is
        joined against the broadcast (tbl, bucket) key set of the new batch
        (dynamic partition pruning restricts it to colliding bucket
        directories), and only those rows pull their vectors."""
        nbv = (
            new_buckets.join(v_new.select("vec_id", "e"), "vec_id")
            .select("tbl", "bucket", "vec_id", "e", F.lit(True).alias("is_new"))
        )
        rows = nbv
        if self._has("lsh"):
            keys = F.broadcast(
                new_buckets.select("tbl", "bucket").distinct()
            )
            pruned = (
                self._read("lsh")
                .filter(F.col("batch") != batch_id)
                .join(keys, ["tbl", "bucket"])
                .select("tbl", "bucket", "vec_id")
            )
            sv = (
                self._read("vectors")
                .filter(F.col("batch") != batch_id)
                .select("vec_id", "e")
            )
            stored_rows = pruned.join(sv, "vec_id").select(
                "tbl", "bucket", "vec_id", "e", F.lit(False).alias("is_new")
            )
            rows = nbv.unionByName(stored_rows)
        pairs = rows.groupBy("tbl", "bucket").applyInPandas(
            _verify_bucket_pairs, "vec_a bigint, vec_b bigint, sim double"
        )
        # a pair colliding in several tables is emitted once per bucket with
        # a bitwise-identical sim — dedup AFTER the (tiny) verified set
        return pairs.distinct().select(
            "vec_a", "vec_b", F.round("sim", 6).alias("sim")
        )

    def _refuse_compacted_reroll(self, batch_id: str) -> None:
        """A pending batch that was ALREADY committed is a re-roll (content
        or config changed). After compact() merged its rows into the base
        partition, drop-first can no longer surgically remove just that
        batch — refuse rather than silently duplicate or orphan rows."""
        store = self._store("vectors")
        sid = store.current_id()
        if sid is None or os.path.isdir(
            os.path.join(store.snapshot_path(sid), f"batch={batch_id}")
        ):
            return
        was_committed = (
            self.manifest.committed_keys("simindex")
            .filter(F.col("partition_key") == f"batch={batch_id}")
            .count()
            > 0
        )
        if was_committed:
            raise ValueError(
                f"batch {batch_id!r} was merged by compact(); its rows can "
                "no longer be re-rolled in place — ingest the new content "
                "as a NEW batch id, or rebuild the index root (content "
                "rewrites of compacted history, like centroid retrains "
                "after compact, need a full rebuild)"
            )

    def compact(self) -> dict[str, int]:
        """Merge every per-batch partition into one ``batch=__base__``
        partition per table — the small-files lifecycle step: steady
        ingestion at one partition tree per batch accumulates directory
        fan-out and per-file overhead; compaction rewrites the accumulated
        state once, inside fresh published snapshots (concurrent readers
        keep their pinned pre-compact view, same CoW discipline as
        engine/retention.compact_partition).

        Semantics are untouched: `batch` never enters query logic (searches
        and pair reads drop it), so every read answers identically before
        and after — pytest'd bit-exact. The manifest keeps its per-batch
        fingerprint rows, so re-ingesting an UNCHANGED batch remains a
        no-op; a CONTENT re-roll of a compacted batch is refused by
        ingest() (the escape hatch is a fresh root rebuild). New batches
        ingest on top of the base exactly as before — compaction is
        invisible to the incremental contract. Returns per-table counts of
        batch partitions merged."""
        specs = {
            "lsh": ["batch", "tbl", "bucket"],
            "ivf": ["batch", "cid"],
            "vectors": ["batch"],
            "pairs": ["batch"],
        }
        out: dict[str, int] = {}
        for name, pcols in specs.items():
            if not self._has(name):
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
            # the read plan lists files in the CURRENT snapshot dir; the
            # staged dir is a separate hardlink tree, so dropping batch
            # dirs there never touches the inodes the scan reads
            merged = self._read(name).withColumn("batch", F.lit(MERGED_BATCH))
            sid = store.begin("compact")
            try:
                for d in old_dirs:
                    shutil.rmtree(
                        os.path.join(store.snapshot_path(sid), d),
                        ignore_errors=True,
                    )
                (
                    merged.write.option("partitionOverwriteMode", "dynamic")
                    .partitionBy(*pcols)
                    .mode("overwrite")
                    .parquet(store.snapshot_path(sid))
                )
            except Exception:
                store.abort(sid)
                raise
            store.publish(sid)
            out[name] = len(old_dirs)
        return out

    def rebuild_pairs(self) -> None:
        """Recompute the whole pair table from the stored index (one full
        self-join over bucket partitions) — the escape hatch after
        rewriting historical batches in place."""
        lsh = self._read("lsh")
        a, b = lsh.alias("a"), lsh.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                # attribute the pair to the LATER member's batch, matching
                # the incremental emission rule
                F.greatest(F.col("a.batch"), F.col("b.batch")).alias("batch"),
            )
            .groupBy("vec_a", "vec_b")
            .agg(F.max("batch").alias("batch"))
        )
        vs = self._read("vectors").select("vec_id", "e", "nrm")
        a_v = vs.select(
            F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
            F.col("nrm").alias("na"),
        )
        b_v = vs.select(
            F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
        pairs = (
            cand.join(a_v, "vec_a")
            .join(b_v, "vec_b")
            .withColumn("sim", sim)
            .filter(F.col("sim") >= _PAIR_THRESHOLD)
            .select("batch", "vec_a", "vec_b", F.round("sim", 6).alias("sim"))
        )
        self._write_partitions("pairs", pairs, ["batch"])

    # -- reads ---------------------------------------------------------------
    def lsh_buckets(self) -> DataFrame:
        return self._read("lsh").select("vec_id", "tbl", "bucket")

    def inverted_lists(self) -> DataFrame:
        return self._read("ivf").select("vec_id", "cid")

    def vectors(self) -> DataFrame:
        return self._read("vectors").select("vec_id", "e", "nrm")

    def verified_pairs(self) -> DataFrame:
        """The maintained near-dup pair set — union of per-batch pair
        partitions; equals a full rebuild's pair set bit-exactly. A corpus
        with no near-dups leaves every batch's pair partition empty (the
        write emits no files), so the store holds no readable schema —
        return a typed empty frame instead of asking Spark to infer one."""
        store = self._store("pairs")
        sid = store.current_id()
        has_dirs = sid is not None and any(
            os.path.isdir(os.path.join(store.snapshot_path(sid), d))
            for d in os.listdir(store.snapshot_path(sid))
        )
        if not has_dirs:
            return self.spark.createDataFrame(
                [], "vec_a bigint, vec_b bigint, sim double"
            )
        return self._read("pairs").select("vec_a", "vec_b", "sim")

    def ivf_topk(
        self, query_filter, nprobe: int = 4, topk: int = 5,
        pq_rerank: int | None = None,
    ) -> DataFrame:
        """IVF search against the STORED lists: queries (vector-store rows
        matching `query_filter`) are assigned to their nprobe nearest
        frozen centroids (broadcast k rows); only those inverted-list
        partitions are scanned — and because list rows carry their vectors,
        re-rank happens in the probe scan itself with no join back to a
        vector store. Per query, nprobe/k of the corpus is read."""
        q = self.vectors().filter(query_filter).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        c = self.centroids().withColumn(
            "cnrm", F.sqrt(_dot(F.col("ce"), F.col("ce")))
        )
        sim_qc = _dot(F.col("qe"), F.col("ce")) / (F.col("qnrm") * F.col("cnrm"))
        w_q = Window.partitionBy("qid").orderBy(F.desc("sim"), "cid")
        probes = (
            q.crossJoin(F.broadcast(c.select("cid", "ce", "cnrm")))
            .select("qid", "qe", "qnrm", "cid", sim_qc.alias("sim"))
            .withColumn("crn", F.row_number().over(w_q))
            .filter(F.col("crn") <= nprobe)
            .select("qid", "qe", "qnrm", F.col("cid").alias("qcid"))
        )
        lists = self._read("ivf")
        sim_x = _dot(F.col("qe"), F.col("e")) / (F.col("qnrm") * F.col("nrm"))
        w_r = Window.partitionBy("qid").orderBy(F.desc("sim"), "cid2")
        if pq_rerank is not None:
            # PQ coarse re-rank (engine/pq.py): the probe scan reads only
            # (vec_id, codes, nrm) from the lists — NOT the vector column —
            # scores candidates from codes, and only the `pq_rerank`
            # survivors per query fetch their full vectors for the exact
            # top-k. With pq_rerank ≥ the candidate count this equals the
            # exact path bit-for-bit (pytest-pinned).
            if not self.pq_m:
                raise ValueError("pq_rerank requires SimIndex(pq_m>0)")
            from .pq import pq_prune

            cand = (
                lists.join(F.broadcast(probes), lists.cid == probes.qcid)
                .filter(F.col("vec_id") != F.col("qid"))
                .select("qid", "qe", "qnrm", "vec_id", "nrm", "codes")
            )
            kept = pq_prune(cand, self.pq_codebooks(), pq_rerank)
            vecs = self.vectors().select(
                F.col("vec_id"), F.col("e"), F.col("nrm")
            )
            qs = probes.select("qid", "qe", "qnrm").distinct()
            return (
                kept.join(vecs, "vec_id")
                .join(F.broadcast(qs), "qid")
                .select(
                    "qid", F.col("vec_id").alias("cid2"), sim_x.alias("sim")
                )
                .withColumn("rn", F.row_number().over(w_r))
                .filter(F.col("rn") <= topk)
                .select(
                    "qid", F.col("cid2").alias("cid"),
                    F.round("sim", 6).alias("sim"), F.col("rn").cast("int"),
                )
            )
        return (
            lists.join(F.broadcast(probes), lists.cid == probes.qcid)
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid", F.col("vec_id").alias("cid2"), sim_x.alias("sim")
            )
            .withColumn("rn", F.row_number().over(w_r))
            .filter(F.col("rn") <= topk)
            .select(
                "qid", F.col("cid2").alias("cid"),
                F.round("sim", 6).alias("sim"), F.col("rn").cast("int"),
            )
        )

    def expire(self, keep_last: int = 1) -> dict[str, list[str]]:
        out = {}
        for name in ("lsh", "ivf", "vectors", "centroids", "pairs", "pq"):
            if self._has(name):
                out[name] = self._store(name).expire(keep_last=keep_last)
        return out


# ---------------------------------------------------------------------------
# driver-registered queries: the PERSISTED index must answer identically to
# the per-run-rebuild queries, so both reuse those queries' oracle SQL —
# the hash gate thereby pins the incremental-ingest == full-rebuild property
# at every driver round, not just in pytest.
# ---------------------------------------------------------------------------

from .queries import ORACLE_SQL, _t, register  # noqa: E402


def _ingest_halves(spark, sf_dir: str) -> SimIndex:
    """Fresh index root, corpus ingested as two incremental batches (the
    lower half first, so auto-built first_k centroids match a full-corpus
    build)."""
    import tempfile

    em = _t(spark, sf_dir, "embeddings")
    idx = SimIndex(spark, tempfile.mkdtemp(prefix="simindex-q-"))
    mid = (em.agg(F.max("vec_id")).first()[0] + 1) // 2
    idx.ingest(em.filter(F.col("vec_id") < mid), "b0")
    idx.ingest(em.filter(F.col("vec_id") >= mid), "b1")
    return idx


@register("simindex_neardup_pairs", ORACLE_SQL["embedding_neardup_pairs"])
def simindex_neardup_pairs(spark, sf_dir):
    """The MAINTAINED near-dup pair table after two incremental batch
    ingests — verified against the same oracle as embedding_neardup_pairs
    (which rebuilds from the full corpus): persistence changes where the
    work happens, never the answers."""
    return _ingest_halves(spark, sf_dir).verified_pairs()


@register("simindex_ivf_topk", ORACLE_SQL["ivf_cosine_topk"])
def simindex_ivf_topk(spark, sf_dir):
    """IVF search over the PERSISTED inverted lists (built across two
    incremental ingests, frozen first-K centroids) — same oracle as the
    per-run-rebuild ivf_cosine_topk."""
    return _ingest_halves(spark, sf_dir).ivf_topk(F.col("vec_id") < 10)
