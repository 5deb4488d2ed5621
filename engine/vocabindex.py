"""Persisted, incrementally-maintained vocabulary index (M38).

`vocab_token_ids` (engine/corpusops.py) builds a tokenizer vocabulary in
one shot. In a production pretraining pipeline the corpus arrives in
batches forever, and the vocabulary's contract is the opposite of
rebuild-from-scratch: **ids, once shipped, are frozen** — every artifact
downstream (tokenized shards, embedding rows, cached features) references
them. The index persists vocabulary state under the same snapshot-store +
fingerprint-manifest machinery as the similarity / dedup / contamination
indexes:

    <root>/
      _manifest/     # per-batch content fingerprints
      counts/        # (token, tf, df) per batch, partitioned by batch=
      assignments/   # (token, token_id), partitioned by aseq= — APPEND-ONLY

Contract:

* `ingest(docs, batch_id)` — fingerprint-gated: an unchanged batch
  re-offer is a no-op. A new batch contributes its (token, tf, df) counts
  partition, and tokens never seen by ANY prior ingest get fresh ids
  appended AFTER the current max id, ordered by (batch tf desc, token) via
  the distributed sort-rank (no single reducer). The first ingest therefore
  reproduces `vocab_token_ids` exactly.
* Re-ingesting a CHANGED batch overwrites that batch's counts partition
  (exact re-roll, like every fingerprinted stage) but NEVER revokes or
  reassigns ids: assignment partitions are append-only, so tokens whose
  last occurrence disappeared keep their frozen ids (tf drops to 0). This
  is the append-only tokenizer-vocab property: id → token is immutable
  history, counts are current state.
* `vocab()` — assignments LEFT JOIN summed counts: (token, token_id, tf,
  df). tf/df are history-independent (equal to the one-shot aggregate over
  the live batches — driver-oracle-pinned); token_id is by design
  history-DEPENDENT (arrival order matters), pinned by the stability
  pytest instead.
* Ids are dense 1..N with no gaps and no reuse (pytest).

Batches must partition the corpus (a doc in two batches would double-count
df); that is the same disjointness contract as the dedup/contamination
indexes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import Manifest, new_run_id, pending_rows, work_manifest
from .corpusops import dense_freq_rank, token_counts
from .snapstore import SnapStore

_STAGE = "vocabindex"


class VocabIndex:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.manifest = Manifest(spark, os.path.join(root, "_manifest"))

    def _store(self, name: str) -> SnapStore:
        return SnapStore(os.path.join(self.root, name))

    def _has_data(self, name: str) -> bool:
        store = self._store(name)
        sid = store.current_id()
        if sid is None:
            return False
        p = store.snapshot_path(sid)
        return any(
            os.path.isdir(os.path.join(p, d)) for d in os.listdir(p)
        )

    def _read(self, name: str) -> DataFrame:
        return self._store(name).read(self.spark)

    def _write(self, name: str, df: DataFrame, part: str, value: str) -> None:
        """Dynamic-overwrite ONE partition inside a fresh CoW snapshot."""
        store = self._store(name)
        sid = store.begin(f"ingest:{part}={value}")
        try:
            (
                df.withColumn(part, F.lit(value))
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy(part)
                .mode("overwrite")
                .parquet(store.snapshot_path(sid))
            )
        except Exception:
            store.abort(sid)
            raise
        store.publish(sid)

    # ------------------------------------------------------------------ API

    def ingest(
        self, docs: DataFrame, batch_id: str, run_id: str | None = None
    ) -> dict:
        """Fold one corpus batch into the index: counts partition overwrite
        + append-only id assignment for never-seen tokens."""
        run_id = run_id or new_run_id()
        work = work_manifest(
            docs.withColumn("_b", F.lit(batch_id)),
            F.col("_b"),
            ["doc_id", "text"],
            "batch",
        )
        pending = pending_rows(work.collect(), self.manifest, _STAGE)
        if not pending:
            return {"batch": batch_id, "ingested": False, "new_tokens": 0}

        counts = token_counts(docs)
        if self._has_data("assignments"):
            known = self._read("assignments")
            base = known.agg(F.max("token_id")).first()[0]
            fresh = counts.join(
                known.select("token"), "token", "left_anti"
            )
        else:
            base = 0
            fresh = counts
        assign = dense_freq_rank(fresh.select("token", "tf")).select(
            "token", (F.col("token_id") + F.lit(base)).cast("long").alias("token_id")
        )
        n_new = assign.count()
        if n_new:
            # aseq is unique per assignment commit (append-only history):
            # the store's monotonic snapshot id disambiguates re-rolls of
            # the same batch, and identical rebuild histories produce
            # identical layouts
            cur = self._store("assignments").current_id() or "0"
            aseq = f"{cur}-{batch_id}"
            self._write("assignments", assign, "aseq", aseq)
        self._write("counts", counts, "batch", batch_id)
        self.manifest.commit(
            [
                {
                    "run_id": run_id,
                    "stage": _STAGE,
                    "partition_key": r["partition_key"],
                    "rows_in": r["rows_in"],
                    "input_snapshot_id": r["input_snapshot_id"],
                    "output_snapshot_id": self.root,
                    "lineage": f"ingest:{batch_id}",
                }
                for r in pending
            ]
        )
        return {"batch": batch_id, "ingested": True, "new_tokens": int(n_new)}

    def vocab(self) -> DataFrame:
        """(token, token_id, tf, df): frozen ids + live totals. Tokens whose
        batches were re-rolled away keep their ids with tf = df = 0."""
        if not self._has_data("assignments"):
            return self.spark.createDataFrame(
                [], "token string, token_id bigint, tf bigint, df bigint"
            )
        assign = self._read("assignments").select("token", "token_id")
        totals = (
            self._read("counts")
            .groupBy("token")
            .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
        )
        return assign.join(totals, "token", "left").select(
            "token",
            "token_id",
            F.coalesce("tf", F.lit(0)).cast("long").alias("tf"),
            F.coalesce("df", F.lit(0)).cast("long").alias("df"),
        )

    def encode(self, docs: DataFrame) -> DataFrame:
        """Tokenize documents against the frozen vocabulary: (doc_id,
        token_ids array in word order). Unknown tokens map to id 0 (UNK) —
        at 100 TB this is a broadcast-or-bucketed dictionary join plus an
        ordered regather, never a driver-side dict."""
        vocab = self.vocab().select("token", "token_id")
        words = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
        pos = docs.select(
            "doc_id", F.posexplode(words).alias("pos", "token")
        )
        return (
            pos.join(F.broadcast(vocab), "token", "left")
            .groupBy("doc_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token_id"))
                    ),
                    lambda s: F.coalesce(s.token_id, F.lit(0).cast("long")),
                ).alias("token_ids")
            )
        )


# ---------------------------------------------------------------------------
# driver queries: (a) totals through the incremental index == the one-shot
# vocabulary aggregate; (b) a single-batch build == vocab_token_ids ids.
# ---------------------------------------------------------------------------

from .queries import ORACLE_SQL, _t, register  # noqa: E402


@register(
    "vocabindex_totals",
    """
    WITH w AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents)
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM w GROUP BY token
    """,
)
def vocabindex_totals(spark, sf_dir):
    """M38 persisted vocabulary: tf/df totals served from the index after
    two incremental batch ingests — history-independent, so the one-shot
    DuckDB aggregate is the oracle (incremental == rebuild, re-proven
    every round)."""
    import tempfile

    d = _t(spark, sf_dir, "documents")
    idx = VocabIndex(spark, tempfile.mkdtemp(prefix="vocabindex-q-"))
    mid = (d.agg(F.max("doc_id")).first()[0] + 1) // 2
    idx.ingest(d.filter(F.col("doc_id") < mid), "b0")
    idx.ingest(d.filter(F.col("doc_id") >= mid), "b1")
    return idx.vocab().select("token", "tf", "df")


@register("vocabindex_ids_oneshot", ORACLE_SQL["vocab_token_ids"])
def vocabindex_ids_oneshot(spark, sf_dir):
    """M38 first-build semantics: a single-batch index build assigns ids
    exactly like the one-shot vocab_token_ids ranking — same oracle."""
    import tempfile

    d = _t(spark, sf_dir, "documents")
    idx = VocabIndex(spark, tempfile.mkdtemp(prefix="vocabindex-q1-"))
    idx.ingest(d, "all")
    return idx.vocab().select("token", "tf", "df", "token_id")
