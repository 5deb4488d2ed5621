"""Snapshot-keyed query result cache — serve repeated dashboard queries
from materialized results, invalidated by table version, not by time.

The serving layer of a tier engine answers the same handful of dashboard
queries (monthly rollup view, top-N series, realtime range) over and over
between pipeline runs. Re-planning and re-scanning tier tables for every
refresh is wasted work while the underlying snapshots haven't moved — and
*exactly* when they move, a TTL cache would serve stale data. Keying the
cache on the dependency tables' SNAPSHOT IDS (engine/snapstore.py pointers)
makes staleness structural: a hit is provably identical to recomputation
(the inputs are immutable CoW snapshots), and any pipeline run, retention
drop, compaction, or rollback flips a pointer and misses the next read.

Layout (all under `<root>/_resultcache/`):

    <digest>/          one entry per (query key, deps, schema) digest
      result.parquet/  the materialized result (written once, atomic via
                       temp dir + os.replace; the parquet tree is immutable)
      meta.json        {key, deps, created_unix, rows}

Entries are immutable — a changed dependency produces a NEW digest, so a
reader mid-scan of an old entry is never torn (same discipline as the CoW
snapshot store). `evict(keep_last_n)` GCs superseded digests per key,
oldest first, never the newest for any live key.

At 100 TB the cache holds RESULTS (dashboard-sized: thousands of rows), not
data; one digest read replaces a multi-tier scan. This is the same shape as
Snowflake's result reuse / Trino's materialized-view freshness check, built
on the snapshot pointers the engine already maintains.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ResultCache:
    DIR = "_resultcache"

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.join(root, self.DIR)
        os.makedirs(self.root, exist_ok=True)

    # -- keys -----------------------------------------------------------------

    @staticmethod
    def deps_of(stores: dict) -> dict[str, str]:
        """Snapshot-pointer fingerprint of a set of SnapStores
        ({table_name: SnapStore}); uncommitted tables hash as '<none>'."""
        return {
            name: (store.current_id() or "<none>")
            for name, store in sorted(stores.items())
        }

    @staticmethod
    def _digest(key: str, deps: dict[str, str]) -> str:
        blob = json.dumps({"key": key, "deps": deps}, sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:32]

    def _entry(self, digest: str) -> str:
        return os.path.join(self.root, digest)

    # -- API ------------------------------------------------------------------

    def serve(
        self, key: str, deps: dict[str, str], build
    ) -> tuple[DataFrame, bool]:
        """Return (result, hit). On miss, run `build()` (a () -> DataFrame
        thunk), materialize it atomically under the digest, and serve the
        materialized copy — so a hit and the original miss read literally
        the same bytes."""
        digest = self._digest(key, deps)
        entry = self._entry(digest)
        data = os.path.join(entry, "result.parquet")
        if os.path.exists(os.path.join(entry, "meta.json")):
            return self.spark.read.parquet(data), True
        df = build()
        tmp = entry + f".tmp.{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(os.path.join(tmp, "result.parquet"))
        rows = self.spark.read.parquet(
            os.path.join(tmp, "result.parquet")
        ).count()
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(
                {"key": key, "deps": deps, "created_unix": time.time(),
                 "rows": rows},
                f,
            )
        try:
            os.replace(tmp, entry)  # atomic publish; loser of a race cleans up
        except OSError:
            if os.path.exists(os.path.join(entry, "meta.json")):
                shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
            else:
                raise
        return self.spark.read.parquet(data), False

    def entries(self) -> list[dict]:
        out = []
        for d in sorted(os.listdir(self.root)):
            mf = os.path.join(self.root, d, "meta.json")
            if os.path.exists(mf):
                with open(mf) as f:
                    meta = json.load(f)
                meta["digest"] = d
                out.append(meta)
        return out

    def evict(self, keep_last_n: int = 1) -> list[str]:
        """Per query key, keep the newest `keep_last_n` entries (by created
        time) and remove the rest — superseded-snapshot results only; the
        newest entry for every key always survives."""
        by_key: dict[str, list[dict]] = {}
        for meta in self.entries():
            by_key.setdefault(meta["key"], []).append(meta)
        removed = []
        for metas in by_key.values():
            metas.sort(key=lambda m: m["created_unix"], reverse=True)
            for meta in metas[keep_last_n:]:
                shutil.rmtree(self._entry(meta["digest"]), ignore_errors=True)
                removed.append(meta["digest"])
        return removed
