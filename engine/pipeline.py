"""EP2 — the full tiering batch job (SURVEY.md §3):

    ingest -> dedup/order -> hourly -> daily -> monthly -> gap-fill ->
    compress -> (retention) with a manifest commit after every stage.

Each stage materializes to its table and commits per-partition lineage rows
carrying an order-insensitive *input fingerprint*, deliberately mirroring the
reference's write-GeoTIFF-then-skip-on-rerun checkpoint idiom generalized to
mutable inputs: a rerun recomputes a partition iff it is uncommitted OR its
input fingerprint changed (late/backfilled rows — J4). Because each stage
fingerprints its own input tier, one late raw row cascades exactly the
affected day → its month → the touched conv_buckets, and nothing else.

Resume granularity per stage:
    hourly/daily  -> bucket_date (day)      key 'day=YYYY-MM-DD'
    monthly       -> month                   key 'month=YYYY-MM'
    gapfill/compress -> conv_bucket          key 'cb=<n>'   (series must be
                        whole per conversation: LOCF/interp cross months)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import io as eio
from .bucket import dedup_turns, mask_valid
from .checkpoint import (
    DELETED_SNAPSHOT,
    Manifest,
    new_run_id,
    pending_rows,
    stale_keys,
    work_manifest,
)
from .codec.chunks import make_chunks
from .gapfill import gapfill, hourly_series
from .rollup import (
    STATE_COLS,
    densify_hourly_locf,
    observed_state,
    rollup_hourly,
    rollup_up,
    tier_view,
)
from .skew import rollup_hourly_salted

N_CONV_BUCKETS = 64

#: hourly/daily tier-state content columns hashed into stage fingerprints
_STATE_HASH_COLS = ["conv_id", "bucket_start", *STATE_COLS]


def _conv_bucket(col="conv_id", n=N_CONV_BUCKETS):
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def _write(df: DataFrame, path: str, partition_cols: list[str]):
    # routes through the io seam: parquet dynamic-partition overwrite in the
    # sandbox, Iceberg overwritePartitions when a catalog is configured
    eio.write_tier(df, path, tuple(partition_cols), mode="overwrite")


class TierPipeline:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        salted: bool | str = False,
        n_salts: int = 16,
        auto_salt_opts: dict | None = None,
        fill_method: str = "locf",
        fill_tiers: bool = True,
        bucketed: bool = False,
        n_buckets: int = 64,
        snapshots: bool = False,
        sketch_cols: list[str] | None = None,
        hist_cols: dict | None = None,
        firstlast_cols: list[str] | None = None,
        sumsq_cols: list[str] | None = None,
        sumprod_cols: list | None = None,
        freq_cols: list[str] | None = None,
        hh_cols: dict[str, int] | None = None,
        kmv_cols: dict[str, int] | None = None,
        session_gaps: list[int] | None = None,
        statedur_cols: list[str] | None = None,
        twa_cols: list[str] | None = None,
        qsk_cols: list[str] | None = None,
        topn_cols: dict[str, int] | None = None,
        botn_cols: dict[str, int] | None = None,
        wap: bool = False,
        wap_audit=None,
        hourly_layout: int = 1,
        lease: bool = True,
        lease_ttl_s: float = 3600.0,
    ):
        self.spark = spark
        self.root = root
        if salted not in (True, False, "auto"):
            raise ValueError("salted must be True, False, or 'auto'")
        self.salted = salted
        #: choose_salted() thresholds for salted='auto' (ratio_threshold,
        #: min_hot_rows, frac, seed) — defaults are the production sizing
        self.auto_salt_opts = dict(auto_salt_opts or {})
        self.n_salts = n_salts
        self.fill_method = fill_method
        #: write flagged intra-day LOCF rows into the hourly tier
        #: (SURVEY §1.2 filled/fill_method on tier rows)
        self.fill_tiers = fill_tiers
        #: maintain a conv_id-bucketed mirror of the hourly tier so the
        #: gapfill + compress stages read co-located series (zero Exchange)
        self.bucketed = bucketed
        self.n_buckets = n_buckets
        #: snapshot-versioned tables (engine/snapstore.py): every stage
        #: write / retention drop / compaction publishes an immutable CoW
        #: snapshot behind an atomic pointer — concurrent readers are never
        #: torn, re-rolls are time-travelable, drops roll back
        self.snapshots = snapshots
        #: raw columns sketched into mergeable HLL tier state (`<col>_hll`,
        #: engine/rollup.py): the tier algebra's non-algebraic member.
        #: The sketch spec is folded into the day-stage fingerprint, so
        #: enabling (or disabling) sketches on an existing root triggers a
        #: one-time manifest-gated incremental backfill of every tier —
        #: schema evolution as just another fingerprint change.
        self.sketch_cols = list(sketch_cols or [])
        #: exact mergeable histogram tier state: {raw_col: (origin, width,
        #: n_bins)} adds a `<col>_hist` array<long> of bin counts per tier
        #: row (engine/rollup.py hist_partial_aggs). Unlike the HLL columns
        #: this state is exact, so it joins the tier-state fingerprint as
        #: its raw array; the spec folds into the day token the same way —
        #: enabling histograms on an existing root is a one-time
        #: manifest-gated backfill.
        self.hist_cols = dict(hist_cols or {})
        #: exact first/last (open/close) tier state per raw column, carried
        #: with its unique (ts, turn_idx) order keys so it composes across
        #: tiers and salts bit-identically (engine/rollup.py
        #: firstlast_partial_aggs). Fingerprint + migration story identical
        #: to hist_cols.
        self.firstlast_cols = sorted(firstlast_cols or [])
        #: exact sum-of-squares tier state per raw column (`<col>_sumsq`,
        #: engine/rollup.py sumsq_partial_aggs): Σx² composes by long
        #: addition across tiers and salts, so variance/stddev are served
        #: from any tier with one final float expression. Fingerprint +
        #: migration story identical to hist_cols.
        self.sumsq_cols = sorted(sumsq_cols or [])
        #: exact cross-product tier state per (a, b) column pair
        #: (`<a>_x_<b>_sumprod`, engine/rollup.py sumprod_partial_aggs):
        #: Σxy composes by addition, completing the second-moment algebra —
        #: covariance/correlation/slope served from tiers. Fingerprint +
        #: migration story identical to sumsq_cols.
        self.sumprod_cols = sorted(tuple(p) for p in (sumprod_cols or []))
        #: exact categorical frequency tier state per raw column
        #: (`<col>_freq` map<string,long>, engine/rollup.py freq_maps):
        #: value→count maps compose across tiers and salts by key-union
        #: addition — exact heavy-hitters / distribution-over-categories
        #: served from any tier. Fingerprint hashes the SORTED entry array
        #: (map internal order is merge-order-dependent); migration story
        #: identical to hist_cols.
        self.freq_cols = sorted(freq_cols or [])
        #: BOUNDED heavy-hitter tier state per raw column ({col: cap},
        #: `<col>_hh{cap}` Misra–Gries map + `<col>_hhn{cap}` total,
        #: engine/heavyhitters.py): the freq_cols variant whose per-bucket
        #: state is hard-capped for high-cardinality columns; composes
        #: across tiers (exact union-add fold + one truncation per row) and
        #: salts (fine-keyed pre-agg, bit-identical to unsalted). Fingerprint
        #: hashes the sorted entry array as JSON like freq; migration story
        #: identical to hist_cols.
        self.hh_cols = {c: int(k) for c, k in sorted((hh_cols or {}).items())}
        #: KMV distinct sketches per raw column ({col: k}, `<col>_kmv{k}`
        #: sorted bottom-k distinct-hash arrays, engine/kmv.py): the
        #: set-algebra member of the tier algebra — supports intersection /
        #: Jaccard / overlap between buckets, which the HLL columns cannot.
        #: Merge is exact-deterministic (sorted-union-truncate), so tier
        #: composition and the salted leaf are bit-identical to a direct
        #: build; exact below k distincts per bucket. Fingerprint hashes
        #: the canonical array as JSON (empty arrays must stay visible);
        #: migration story identical to hist_cols.
        self.kmv_cols = {c: int(k) for c, k in sorted((kmv_cols or {}).items())}
        #: mergeable sessionization state per gap threshold in minutes
        #: (`sessions_g{G}` structs, engine/sessionstate.py): per-bucket
        #: island counts + boundary timestamps composing hourly→daily→
        #: monthly by time-ordered monoid fold — session counts served
        #: from any tier equal a fresh gaps-and-islands scan of raw.
        #: Fingerprint hashes the struct as JSON; migration like hist_cols.
        self.session_gaps = sorted({int(g) for g in (session_gaps or [])})
        #: duration-in-state structs per categorical column
        #: (`statedur_{col}`, engine/statedur.py): the TimescaleDB
        #: state_agg — time-in-state maps composing across tiers by the
        #: same ordered-monoid fold as sessions. Fingerprint hashes the
        #: struct with its entries canonicalized; migration like hist_cols.
        self.statedur_cols = sorted(set(statedur_cols or []))
        #: time-weighted-average structs per numeric column (`twa_{col}`,
        #: engine/twa.py): the TimescaleDB time_weight('locf')/gauge_agg
        #: pair — exact integer LOCF integrals composing across tiers by
        #: the ordered-monoid fold (boundary gaps weighted by the earlier
        #: span's last value). Fingerprint hashes the struct as JSON;
        #: migration like hist_cols.
        self.twa_cols = sorted(set(twa_cols or []))
        #: integer log-bucket quantile-sketch maps per numeric column
        #: (`{col}_qsk`, engine/qsketch.py): DDSketch-style mergeable
        #: quantile state with a hard ≤1/32 relative-error bound, exact
        #: below 32; merge is key-union count addition (the freq fold),
        #: so composition is exact as a multiset. Fingerprint hashes the
        #: canonical sorted entry array as JSON (the freq lesson);
        #: migration like hist_cols.
        self.qsk_cols = sorted(set(qsk_cols or []))
        #: exact top/bottom-N value state per numeric column
        #: (`{col}_top{n}`/`{col}_bot{n}` arrays of (v, u, i) structs,
        #: engine/topn.py): the n extremes with their timestamps, merge =
        #: flatten+sort+truncate — bit-exact composition (the KMV
        #: argument order-reversed). Fingerprint hashes the canonical
        #: array as JSON; migration like hist_cols.
        self.topn_cols = {
            c: int(n) for c, n in sorted((topn_cols or {}).items())
        }
        self.botn_cols = {
            c: int(n) for c, n in sorted((botn_cols or {}).items())
        }
        #: write-audit-publish (requires snapshots): a run writes every
        #: stage into STAGED (unpublished) snapshots with manifest commits
        #: deferred; at the seal, `wap_audit(pipe)` (if given) inspects the
        #: staged state — reads inside the run resolve to it — and then all
        #: tables publish + the manifest lands. A crash or audit failure
        #: leaves published tables AND the manifest untouched.
        if wap and not snapshots:
            raise ValueError("wap=True requires snapshots=True")
        self.wap = wap
        self.wap_audit = wap_audit
        #: hourly tier partition SPEC version (VERDICT r3 #7 — Iceberg
        #: partition-spec evolution): 1 = day dirs only, 2 = day/conv_bucket
        #: sub-partitioning (conv-scoped reads prune within a day; retention
        #: and compaction keep day granularity). The layout version folds
        #: into the day-stage fingerprint, so switching it on an existing
        #: root is a one-time manifest-gated re-roll of every day — and
        #: because tier-state fingerprints hash rows, not layout, the
        #: daily/monthly/gapfill/compress stages do NOT cascade. In snapshot
        #: mode the pre-migration snapshots keep their old layout and stay
        #: readable via time travel.
        if hourly_layout not in (1, 2):
            raise ValueError("hourly_layout must be 1 or 2")
        self.hourly_layout = hourly_layout
        #: single-writer mutual exclusion around run(): two concurrent runs
        #: on one root would double-write pending partitions (engine/lease.py)
        self.use_lease = lease
        self.lease_ttl_s = lease_ttl_s
        self._wap_active = False
        self._staged: dict[str, str] = {}
        self._staged_mirror: str | None = None
        self._buffered_rows: list[dict] = []
        self.manifest = Manifest(spark, os.path.join(root, "_manifest"))
        #: right-to-be-forgotten tombstones (engine/forget.py): ingest
        #: anti-joins the input against this set, so a deletion re-rolls
        #: exactly the affected days via the ordinary fingerprint machinery
        #: and tombstoned conversations can never resurrect from late data
        from .forget import TombstoneStore

        self.tombstones = TombstoneStore(root)

    @property
    def _sketch_token(self) -> str:
        return (
            "sketch:" + ",".join(sorted(self.sketch_cols))
            if self.sketch_cols
            else ""
        )

    @property
    def _day_token(self) -> str:
        """Day-stage fingerprint configuration token: sketch spec + hourly
        partition-spec version. Empty at the defaults, keeping historical
        fingerprints byte-identical."""
        parts = [self._sketch_token]
        if self.hist_cols:
            parts.append(
                "hist:"
                + ";".join(
                    f"{c}={o},{w},{k}"
                    for c, (o, w, k) in sorted(self.hist_cols.items())
                )
            )
        if self.firstlast_cols:
            parts.append("fl:" + ";".join(self.firstlast_cols))
        if self.sumsq_cols:
            parts.append("sq:" + ";".join(self.sumsq_cols))
        if self.sumprod_cols:
            parts.append(
                "sp:" + ";".join(f"{a}*{b}" for a, b in self.sumprod_cols)
            )
        if self.freq_cols:
            parts.append("fq:" + ";".join(self.freq_cols))
        if self.hh_cols:
            parts.append(
                "hh:" + ";".join(f"{c}={k}" for c, k in self.hh_cols.items())
            )
        if self.kmv_cols:
            parts.append(
                "kmv:" + ";".join(f"{c}={k}" for c, k in self.kmv_cols.items())
            )
        if self.session_gaps:
            parts.append(
                "sess:" + ";".join(str(g) for g in self.session_gaps)
            )
        if self.statedur_cols:
            parts.append("sd:" + ";".join(self.statedur_cols))
        if self.twa_cols:
            parts.append("twa:" + ";".join(self.twa_cols))
        if self.qsk_cols:
            parts.append("qsk:" + ";".join(self.qsk_cols))
        if self.topn_cols:
            parts.append(
                "topn:"
                + ";".join(f"{c}={n}" for c, n in self.topn_cols.items())
            )
        if self.botn_cols:
            parts.append(
                "botn:"
                + ";".join(f"{c}={n}" for c, n in self.botn_cols.items())
            )
        if self.hourly_layout != 1:
            parts.append(f"layout:{self.hourly_layout}")
        return "|".join(p for p in parts if p)

    def hourly_partition_cols(self) -> list[str]:
        return (
            ["bucket_date"]
            if self.hourly_layout == 1
            else ["bucket_date", "conv_bucket"]
        )

    def _tier_hash_cols(self) -> list:
        """Fingerprint columns for tier-state inputs (daily/monthly/mirror).
        Sketch columns join the fingerprint as their ESTIMATE (a
        deterministic double) — raw sketch bytes can vary with aggregation
        order and would cause spurious re-rolls. The gapfill/compress
        fingerprints deliberately stay sketch-free (_STATE_HASH_COLS): those
        outputs don't read sketches, so sketch-only changes must not re-roll
        them."""
        return (
            _STATE_HASH_COLS
            + [
                F.hll_sketch_estimate(f"{c}_hll")
                for c in sorted(self.sketch_cols)
            ]
            # hist arrays are exact + deterministic — hash them raw
            + [F.col(f"{c}_hist") for c in sorted(self.hist_cols)]
            # first/last values are exact + deterministic (unique order
            # keys) — hash them raw too
            + [
                F.col(f"{c}_{side}")
                for c in self.firstlast_cols
                for side in ("first", "last")
            ]
            # Σx²/Σxy are exact + deterministic — hash raw
            + [F.col(f"{c}_sumsq") for c in self.sumsq_cols]
            + [F.col(f"{a}_x_{b}_sumprod") for a, b in self.sumprod_cols]
            # freq maps are exact as MULTISETS of entries but internally
            # merge-order-dependent — hash the canonical sorted entry array,
            # AS JSON: xxhash64 skips empty arrays entirely (like nulls), so
            # a raw empty array would make enable/disable migrations miss
            # every all-empty-map day (mixed-schema tiers); the "[]" string
            # is never hash-invisible
            + [
                F.to_json(F.sort_array(F.map_entries(f"{c}_freq")))
                for c in self.freq_cols
            ]
            # hh maps: same canonical-JSON argument as freq (deterministic
            # given the input multiset — see engine/heavyhitters.py merge
            # strategy); the companion total is a plain long
            + [
                e
                for c, k in self.hh_cols.items()
                for e in (
                    F.to_json(F.sort_array(F.map_entries(f"{c}_hh{k}"))),
                    F.col(f"{c}_hhn{k}"),
                )
            ]
            # KMV arrays are sorted + exact-deterministic — but hash them
            # AS JSON, not raw: xxhash64 skips empty arrays (the freq
            # lesson), and an all-null bucket's state is exactly []
            + [
                F.to_json(F.col(f"{c}_kmv{k}"))
                for c, k in self.kmv_cols.items()
            ]
            # session structs are deterministic (the merge fold is ordered)
            # — JSON for the same empty-visibility reason as the others
            + [
                F.to_json(F.col(f"sessions_g{g}"))
                for g in self.session_gaps
            ]
            # statedur structs: canonicalize the internal map to sorted
            # entries before hashing (merge-order-independent multiset,
            # the freq lesson applies to the nested map too)
            + [
                e
                for c in self.statedur_cols
                for e in (
                    F.col(f"statedur_{c}")["first_us"],
                    F.col(f"statedur_{c}")["last_us"],
                    F.col(f"statedur_{c}")["last_state"],
                    F.to_json(
                        F.sort_array(
                            F.map_entries(F.col(f"statedur_{c}")["durs"])
                        )
                    ),
                )
            ]
            # twa structs are flat + deterministic (unique order keys at
            # the leaf, ordered fold upward) — JSON so an all-null
            # bucket's NULL struct stays hash-visible
            + [F.to_json(F.col(f"twa_{c}")) for c in self.twa_cols]
            # qsk maps: canonical sorted entries AS JSON (the freq lesson
            # — xxhash64 skips raw empty arrays, and all-null buckets
            # carry exactly an empty map)
            + [
                F.to_json(F.sort_array(F.map_entries(f"{c}_qsk")))
                for c in self.qsk_cols
            ]
            # top/bot-N arrays are already canonically ordered — JSON so
            # empty arrays stay hash-visible
            + [
                F.to_json(F.col(f"{c}_top{n}"))
                for c, n in self.topn_cols.items()
            ]
            + [
                F.to_json(F.col(f"{c}_bot{n}"))
                for c, n in self.botn_cols.items()
            ]
        )

    # -- paths -------------------------------------------------------------
    def tier_path(self, tier: str) -> str:
        return os.path.join(self.root, "tiers", tier)

    @property
    def gapfill_path(self) -> str:
        return os.path.join(self.root, "gapfill")

    @property
    def chunks_path(self) -> str:
        return os.path.join(self.root, "chunks")

    def table_path(self, name: str) -> str:
        if name in ("hourly", "daily", "monthly"):
            return self.tier_path(name)
        if name == "gapfill":
            return self.gapfill_path
        if name in ("chunks", "compress"):
            return self.chunks_path
        raise KeyError(name)

    def _store(self, path: str):
        from .snapstore import SnapStore

        return SnapStore(path)

    def _read_path(self, path: str) -> DataFrame:
        if self.snapshots:
            # inside a WAP run, reads resolve to this run's staged state so
            # later stages (and the audit) see the in-flight snapshots
            return self._store(path).read(
                self.spark, as_of=self._staged.get(path)
            )
        return eio.read_tier(self.spark, path)

    def read_table(self, name: str) -> DataFrame:
        """Snapshot-aware read of any pipeline table by logical name."""
        return self._read_path(self.table_path(name))

    def tier_data_path(self, tier: str) -> str:
        """The concrete directory holding the tier's CURRENT files — the
        published snapshot dir in snapshot mode, the tier dir otherwise.
        This is the anchor a FileIndex (engine/fileindex.py) indexes:
        snapshot flips keep relpaths and hardlinked (size, mtime) identity,
        so unchanged partitions' index rows survive pointer advances."""
        p = self.tier_path(tier)
        if not self.snapshots:
            return p
        store = self._store(p)
        cur = store.current_id()
        if cur is None:
            from .snapstore import SnapshotError

            raise SnapshotError(f"{p}: no published snapshot to index")
        return store.snapshot_path(cur)

    def read_tier(self, tier: str) -> DataFrame:
        if self.snapshots:
            # snapshot commits are atomic pointer flips — nothing to heal
            return self._read_path(self.tier_path(tier))
        # self-heal a compaction that crashed between its promotion renames
        from .retention import recover_compaction

        recover_compaction(self.tier_path(tier))
        return eio.read_tier(self.spark, self.tier_path(tier))

    @staticmethod
    def _tree_partition_depth(root: str) -> int | None:
        """Nesting depth of k=v partition dirs in an existing parquet tree
        (None when absent/empty). Detects a partition-SPEC mismatch between
        what is on disk and what this pipeline is configured to write."""
        try:
            entries = [
                d
                for d in os.listdir(root)
                if "=" in d and os.path.isdir(os.path.join(root, d))
            ]
        except FileNotFoundError:
            return None
        if not entries:
            return None
        sub = os.path.join(root, entries[0])
        has_sub = any(
            "=" in d and os.path.isdir(os.path.join(sub, d))
            for d in os.listdir(sub)
        )
        return 2 if has_sub else 1

    @staticmethod
    def _clear_partition_dirs(root: str) -> None:
        import shutil

        for d in os.listdir(root):
            if "=" in d and os.path.isdir(os.path.join(root, d)):
                shutil.rmtree(os.path.join(root, d))

    def _write_table(
        self, df: DataFrame, path: str, partition_cols: list[str]
    ) -> None:
        if not self.snapshots:
            # partition-spec evolution (plain mode): dynamic overwrite only
            # replaces the LEAF partitions the new data touches, so a
            # depth change would leave old-layout files mixed into the same
            # day dirs — clear the tree first (every partition re-rolls on
            # a spec change anyway: the layout token is in the fingerprint)
            depth = self._tree_partition_depth(path)
            if depth is not None and depth != len(partition_cols):
                self._clear_partition_dirs(path)
            _write(df, path, partition_cols)
            return
        out = df
        if "bucket_date" in partition_cols and "bucket_date" not in df.columns:
            out = out.withColumn("bucket_date", F.to_date("bucket_start"))
        store = self._store(path)
        # WAP: reuse this run's staged snapshot for the path (a stale-input
        # drop may have staged it already); never publish until the seal
        sid = self._staged.get(path) if self._wap_active else None
        fresh = sid is None
        if fresh:
            sid = store.begin(
                ("wap-staged" if self._wap_active else "write")
                + ":" + ",".join(partition_cols)  # records the spec per snapshot
            )
        try:
            # spec evolution (snapshot mode): the staged CoW tree inherits
            # the OLD layout's files — clear them so the new snapshot is
            # homogeneous at the new depth; prior snapshots keep the old
            # layout and stay readable via time travel
            snap = store.snapshot_path(sid)
            depth = self._tree_partition_depth(snap)
            if depth is not None and depth != len(partition_cols):
                self._clear_partition_dirs(snap)
            (
                eio.spread_partitions(out, partition_cols)
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_cols)
                .mode("overwrite")
                .parquet(snap)
            )
        except Exception:
            if fresh:
                store.abort(sid)
            raise
        if self._wap_active:
            self._staged[path] = sid
        else:
            store.publish(sid)

    # -- cross-table run barrier (snapshot mode) -----------------------------
    TABLE_NAMES = ("hourly", "daily", "monthly", "gapfill", "chunks")

    def _commit(self, rows: list[dict]) -> None:
        """Manifest commit, deferred to the seal inside a WAP run so a
        crashed or audit-failed run leaves no fingerprint claims behind."""
        if self._wap_active:
            self._buffered_rows.extend(rows)
        else:
            self.manifest.commit(rows)

    def _begin_wap(self) -> None:
        # sweep leftovers of a previously crashed WAP run (staged-never-
        # published snapshots), then start clean
        for name in self.TABLE_NAMES:
            self._store(self.table_path(name)).clean_stale_staging()
        if self.bucketed:
            self._mirror_sweep_staged()
        self._staged = {}
        self._staged_mirror = None
        self._buffered_rows = []
        self._wap_active = True

    def _abort_wap(self) -> None:
        for path, sid in self._staged.items():
            self._store(path).abort(sid)
        if self._staged_mirror is not None:
            import shutil

            self.spark.sql(
                f"DROP TABLE IF EXISTS {self._mirror_tbl(self._staged_mirror)}"
            )
            shutil.rmtree(
                self._mirror_ver_path(self._staged_mirror), ignore_errors=True
            )
        self._staged = {}
        self._staged_mirror = None
        self._buffered_rows = []
        self._wap_active = False

    def _finish_run(
        self,
        run_id: str,
        done: dict,
        scans: dict | None = None,
        left: dict | None = None,
    ) -> dict:
        """Seal a run. In snapshot mode, record each table's published
        snapshot id under stage='snapshot' — the cross-table consistency
        barrier: `read_consistent(run_id)` later pins EVERY table to the
        ids this run ended with, so a reader never mixes an hourly tier
        from run N+1 with a daily tier from run N (Iceberg's multi-table
        transaction emulated at run granularity).

        WAP seal order: audit (over the staged view) → publish every staged
        snapshot → commit the buffered manifest + barrier. Publishes are
        per-table atomic pointer flips; the cross-table window is
        milliseconds of renames, and a crash inside it is safe — the
        manifest lands last, so interrupted work simply re-rolls."""
        if self._wap_active:
            if self.wap_audit is not None:
                self.wap_audit(self)  # raises to veto; staged state visible
            staged, buffered = self._staged, self._buffered_rows
            staged_mirror = self._staged_mirror
            self._staged, self._buffered_rows = {}, []
            self._staged_mirror = None
            self._wap_active = False
            for path, sid in staged.items():
                self._store(path).publish(sid)
            if staged_mirror is not None:
                self._mirror_publish(staged_mirror)
            if buffered:
                self.manifest.commit(buffered)
        if self.snapshots:
            rows = []
            for name in self.TABLE_NAMES:
                sid = self._store(self.table_path(name)).current_id()
                if sid is not None:
                    rows.append(
                        {
                            "run_id": run_id,
                            "stage": "snapshot",
                            "partition_key": f"table={name}",
                            "input_snapshot_id": sid,
                            "output_snapshot_id": self.table_path(name),
                            "lineage": "run-barrier",
                        }
                    )
            if rows:
                self.manifest.commit(rows)
        return {
            "run_id": run_id,
            "stages": done,
            "scans": scans or {},
            "left": left or {},
        }

    def run_snapshots(self, run_id: str | None = None) -> dict[str, str]:
        """table name -> snapshot id pinned at the end of `run_id` (default:
        the most recently sealed run)."""
        m = self.manifest.read().filter(F.col("stage") == "snapshot")
        if run_id is None:
            last = m.orderBy(F.desc("committed_at")).select("run_id").first()
            if last is None:
                raise ValueError("no sealed snapshot-mode runs in manifest")
            run_id = last["run_id"]
        return {
            r["partition_key"].split("=", 1)[1]: r["input_snapshot_id"]
            for r in m.filter(F.col("run_id") == run_id).collect()
        }

    def read_consistent(self, run_id: str | None = None) -> dict[str, DataFrame]:
        """Every pipeline table pinned to one run's snapshot ids — a
        mutually consistent cross-table view regardless of later runs,
        retention drops, or compactions (valid until those snapshots are
        expired)."""
        return {
            name: self._store(self.table_path(name)).read(self.spark, as_of=sid)
            for name, sid in self.run_snapshots(run_id).items()
        }

    #: fingerprint sentinel committed by rollback_run: matches no real work
    #: fingerprint, so every partition the undone runs had committed re-rolls
    ROLLED_BACK = "<rolled-back>"

    _DATA_STAGES = (
        "hourly", "daily", "monthly", "gapfill", "compress", "hourly_bucketed",
    )

    def rollback_run(self, run_id: str) -> dict[str, str]:
        """Restore every table to the snapshot ids sealed by `run_id` —
        pointer flips only, zero data IO (Iceberg `rollback_to_snapshot`,
        run-granular) — and RE-ARM the resume manifest: a bare pointer flip
        would leave newer fingerprint commits claiming states the tables no
        longer hold, so the next run would wrongly skip those partitions.
        Every (stage, partition) committed after the target barrier gets a
        ROLLED_BACK sentinel fingerprint; the next run re-rolls exactly
        those. Refuses when a retention drop or month-freeze happened after
        the barrier (rolling data back under retention bookkeeping would
        resurrect dropped partitions with live 'dropped' manifest state).
        Returns the restored table→snapshot-id map."""
        if not self.snapshots:
            raise ValueError("rollback_run requires TierPipeline(snapshots=True)")
        snaps = self.run_snapshots(run_id)
        if not snaps:
            raise ValueError(f"run {run_id!r} sealed no snapshot barrier")
        m = self.manifest.read()
        barrier_ts = (
            m.filter((F.col("stage") == "snapshot") & (F.col("run_id") == run_id))
            .agg(F.max("committed_at").alias("t"))
            .first()["t"]
        )
        blockers = (
            m.filter(
                (F.col("committed_at") > F.lit(barrier_ts).cast("timestamp_ntz"))
                & F.col("stage").isin("retention", "frozen")
            ).count()
        )
        if blockers:
            raise ValueError(
                "refusing to roll back across retention/freeze events "
                f"({blockers} newer lifecycle commits)"
            )
        undone = (
            m.filter(
                (F.col("committed_at") > F.lit(barrier_ts).cast("timestamp_ntz"))
                & F.col("stage").isin(*self._DATA_STAGES)
            )
            .select("stage", "partition_key")
            .distinct()
            .collect()
        )
        for name, sid in snaps.items():
            self._store(self.table_path(name)).rollback(sid)
        rb_id = new_run_id()
        rows = [
            {
                "run_id": rb_id,
                "stage": r["stage"],
                "partition_key": r["partition_key"],
                "input_snapshot_id": self.ROLLED_BACK,
                "lineage": f"rollback-of:{run_id}",
            }
            for r in undone
        ]
        # reseal the barrier at the restored ids so read_consistent()
        # defaults to the rolled-back state
        rows += [
            {
                "run_id": rb_id,
                "stage": "snapshot",
                "partition_key": f"table={name}",
                "input_snapshot_id": sid,
                "output_snapshot_id": self.table_path(name),
                "lineage": "run-barrier",
            }
            for name, sid in snaps.items()
        ]
        self.manifest.commit(rows)
        return snaps

    # -- stage driver --------------------------------------------------------
    # -- changelog-pruned work manifests (snapshot mode) ---------------------
    def _progress_file(self, stage: str) -> str:
        return os.path.join(self.root, "_progress", f"{stage}.upstream")

    def _reconciled(self, stage: str) -> tuple[str, str] | None:
        try:
            with open(self._progress_file(stage)) as f:
                sid, _, token = f.read().strip().partition(" ")
                return (sid, token) if sid else None
        except FileNotFoundError:
            return None

    def _record_reconciled(self, stage: str, sid: str) -> None:
        os.makedirs(os.path.dirname(self._progress_file(stage)), exist_ok=True)
        p = self._progress_file(stage)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{sid} {self._day_token}")
        os.replace(tmp, p)

    def _changed_upstream_days(self, stage: str, upstream: str) -> list[str] | None:
        """The O(changed)-not-O(table) resume scan (snapshot mode): day
        values of `upstream` partitions added/rewritten since `stage` last
        reconciled, from the snapshot changelog's inode inventory — no data
        reads. Unchanged partitions are PROVABLY fingerprint-identical
        (their files are the same inodes), so the work manifest only needs
        to re-fingerprint the changed ones. Returns None when pruning is
        unsound and the caller must fall back to the full scan: plain mode,
        WAP (stages read staged snapshots, not the published diff base), no
        pointer yet, pointer token drift (a state-column migration must
        re-fingerprint everything), expired diff base (GC race), or a
        rollback sentinel awaiting heal (its day may be bit-unchanged
        upstream yet still must re-roll)."""
        if not self.snapshots or self.wap:
            return None
        store = self._store(self.table_path(upstream))
        cur = store.current_id()
        if cur is None:
            return None
        rec = self._reconciled(stage)
        if rec is None or rec[1] != self._day_token:
            return None
        sid = rec[0]
        if not os.path.isdir(store.snapshot_path(sid)):
            return None
        # rollback sentinel awaiting heal? — driver-side latest-map lookup
        # (no Spark job; the manifest is a memoized local table)
        if self.ROLLED_BACK in self.manifest.latest_map(stage).values():
            return None
        if sid == cur:
            return []
        d = store.diff(sid, cur)
        return sorted(
            {p.split("=", 1)[1] for p in d["added"] + d["rewritten"]}
        )

    def _upstream_day_inventory(self, upstream: str) -> list[str]:
        """Every day value present in `upstream`'s current snapshot — a
        directory listing, no data reads; feeds stale detection when the
        work manifest is pruned (absence from a pruned work manifest must
        not read as deletion)."""
        store = self._store(self.table_path(upstream))
        snap = store.snapshot_path(store.current_id())
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(snap)
            if os.path.isdir(os.path.join(snap, d))
        )

    def _run_stage(
        self,
        stage: str,
        run_id: str,
        work: DataFrame,  # work_manifest: partition_key, rows_in, input_snapshot_id
        build,  # pending key list -> output DF
        out_path: str,
        partition_cols: list[str],
        lineage: str,
        protect: set[str] | None = None,
        inventory: list[str] | None = None,
        budget: int | None = None,
        left: dict | None = None,
    ) -> int:
        """Run one stage exactly once per pending partition.

        Cost model (the whole point of this structure): the stage transform
        is computed a single time — by the write. Per-key rows_in and the
        input fingerprint come from the `work` manifest scan (one shuffle-
        light partial aggregate over the input); rows_out comes from a
        footer-only read-back of the partitions just written (the count
        references no data columns, so parquet row-group metadata answers
        it). Nothing collects the transformed data to the driver.

        `budget` bounds the pending batch: at most `budget` keys (sorted by
        partition_key — oldest-first for date-keyed stages, deterministic
        for conv-bucket stages) are built this run; the remainder stays
        PENDING in the manifest and `left[stage]` reports the deferral so
        the caller knows to run again. Stale-input drops are never budgeted
        (they are metadata-priced and deferring a deletion is a correctness
        hazard, not a cost saving).

        Resume-algebra cost (round 6): the work manifest is evaluated by
        exactly ONE Spark job (the collect below, or the caller's when it
        passes pre-collected rows); stale detection and the pending/latest
        comparison run driver-side against the memoized local manifest —
        previously each stage paid the input aggregation twice plus four
        metadata-join jobs, which dominated a no-op resume.
        """
        t0 = time.monotonic()
        work_rows = work if isinstance(work, list) else work.collect()
        self._drop_stale(
            stage, run_id, work_rows, out_path, partition_cols[0], lineage,
            protect, inventory=inventory,
        )
        pending = pending_rows(work_rows, self.manifest, stage)
        if not pending:
            return 0
        if budget is not None:
            pending.sort(key=lambda r: r["partition_key"])
            if len(pending) > budget:
                if left is not None:
                    left[stage] = len(pending) - budget
                pending = pending[:budget]
        keys = [r["partition_key"] for r in pending]
        out = build(keys)
        self._write_table(out, out_path, partition_cols)
        part = partition_cols[0]
        vals = [k.split("=", 1)[1] for k in keys]
        rows_out = {
            r["_k"]: r["count"]
            for r in (
                self._read_path(out_path)
                .filter(F.col(part).cast("string").isin(vals))
                .groupBy(F.col(part).cast("string").alias("_k"))
                .count()
                .collect()
            )
        }
        wall = int((time.monotonic() - t0) * 1000)
        self._commit(
            [
                {
                    "run_id": run_id,
                    "stage": stage,
                    "partition_key": r["partition_key"],
                    "rows_in": r["rows_in"],
                    "rows_out": rows_out.get(r["partition_key"].split("=", 1)[1], 0),
                    "wall_ms": wall,
                    "lineage": lineage,
                    "input_snapshot_id": r["input_snapshot_id"],
                    "output_snapshot_id": out_path,
                }
                for r in pending
            ]
        )
        return len(keys)

    def _drop_stale(
        self,
        stage: str,
        run_id: str,
        work_rows: list,
        out_path: str,
        part: str,
        lineage: str,
        protect: set[str] | None = None,
        inventory: list[str] | None = None,
    ) -> int:
        """Invalidate committed outputs whose input partitions vanished
        (ADVICE r2): a fully-deleted input day/month/conv_bucket produces no
        work row, so `pending_partitions` never re-rolls it — drop its output
        partition directory and commit a DELETED_SNAPSHOT row. Resurrection
        re-rolls automatically (the sentinel matches no real fingerprint).
        Driver-side loop is bounded by partition count, never data.
        `protect` exempts keys deliberately absent from the work manifest
        (frozen months finalized by daily retention)."""
        if inventory is not None:
            # pruned work manifests omit unchanged partitions — absence
            # must not read as deletion, so stale detection runs against
            # the upstream's FULL key inventory (already-prefixed
            # partition_key strings from a directory listing)
            keys = set(inventory)
        else:
            keys = {r["partition_key"] for r in work_rows}
        stale = stale_keys(keys, self.manifest, stage)
        if protect:
            stale = [k for k in stale if k not in protect]
        if not stale:
            return 0
        import shutil

        doomed_dirs = []
        rows = []
        for key in stale:
            val = key.split("=", 1)[1]
            if self.snapshots:
                doomed_dirs.append(f"{part}={val}")
            else:
                part_dir = os.path.join(out_path, f"{part}={val}")
                if os.path.exists(part_dir):
                    shutil.rmtree(part_dir)
            rows.append(
                {
                    "run_id": run_id,
                    "stage": stage,
                    "partition_key": key,
                    "rows_in": 0,
                    "rows_out": 0,
                    "lineage": lineage,
                    "input_snapshot_id": DELETED_SNAPSHOT,
                    "output_snapshot_id": out_path,
                }
            )
        if doomed_dirs:
            # one CoW snapshot drops the whole stale batch atomically; the
            # pre-drop state stays time-travelable until expired. In WAP the
            # drop lands in this run's staged snapshot (created here if the
            # stage hasn't staged yet) and publishes only at the seal.
            store = self._store(out_path)
            if self._wap_active:
                import shutil

                sid = self._staged.get(out_path)
                if sid is None:
                    sid = store.begin("wap-staged")
                    self._staged[out_path] = sid
                for d in doomed_dirs:
                    shutil.rmtree(
                        os.path.join(store.snapshot_path(sid), d),
                        ignore_errors=True,
                    )
            else:
                store.drop_partitions(doomed_dirs, op="stale-input")
        self._commit(rows)
        return len(rows)

    def _retention_dropped(self, lineage: str) -> set[str]:
        """Partition keys removed from `lineage`'s table by a retention
        drop (manifest stage='retention') — protected from _drop_stale."""
        return {
            r["partition_key"]
            for r in self.manifest.read()
            .filter(
                (F.col("stage") == "retention") & (F.col("lineage") == lineage)
            )
            .select("partition_key")
            .distinct()
            .collect()
        }

    # -- bucketed hourly mirror (L5 scale path, VERDICT r2 item 3) ----------
    def bucketed_table(self) -> str:
        """Session-catalog name of the mirror, stable per pipeline root."""
        import hashlib

        return "tiers_hourly_b_" + hashlib.md5(self.root.encode()).hexdigest()[:10]

    @property
    def bucketed_path(self) -> str:
        return os.path.join(self.root, "tiers", "hourly_bucketed")

    # In snapshot mode the mirror is VERSIONED like every other table
    # (ADVICE r3): each refresh writes a fresh `_v/<ver>` tree and flips an
    # atomic `_CURRENT` pointer — no in-place saveAsTable overwrite, so
    # concurrent readers are never torn. Inside a WAP run the freshly
    # written version stays UNPUBLISHED (pointer untouched) until the seal;
    # an audit veto or crash leaves the published mirror — like every other
    # published table — byte-untouched, and `_begin_wap` sweeps the
    # orphaned version dirs of a crashed run.
    @property
    def _mirror_versions_dir(self) -> str:
        return os.path.join(self.bucketed_path, "_v")

    @property
    def _mirror_pointer(self) -> str:
        return os.path.join(self.bucketed_path, "_CURRENT")

    def _mirror_current(self) -> str | None:
        try:
            with open(self._mirror_pointer) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _mirror_version_ids(self) -> list[str]:
        try:
            return sorted(
                v
                for v in os.listdir(self._mirror_versions_dir)
                if not v.startswith(".")
            )
        except FileNotFoundError:
            return []

    def _mirror_new_ver(self) -> str:
        import uuid

        prefixes = [
            int(v.split("_", 1)[0])
            for v in self._mirror_version_ids()
            if v.split("_", 1)[0].isdigit()
        ]
        nxt = (max(prefixes) + 1) if prefixes else 0
        return f"{nxt:08d}_{uuid.uuid4().hex[:8]}"

    def _mirror_tbl(self, ver: str) -> str:
        return f"{self.bucketed_table()}_{ver}"

    def _mirror_ver_path(self, ver: str) -> str:
        return os.path.join(self._mirror_versions_dir, ver)

    def _mirror_publish(self, ver: str) -> None:
        import uuid

        open(os.path.join(self._mirror_ver_path(ver), "_PUBLISHED"), "w").close()
        tmp = self._mirror_pointer + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(ver)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._mirror_pointer)
        # prune published versions older than the immediate predecessor
        # (kept for readers pinned pre-flip); the mirror is a derived cache,
        # never a rollback target, so deep history buys nothing
        import shutil

        published = [
            v
            for v in self._mirror_version_ids()
            if os.path.exists(os.path.join(self._mirror_ver_path(v), "_PUBLISHED"))
        ]
        for v in published[:-2]:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._mirror_tbl(v)}")
            shutil.rmtree(self._mirror_ver_path(v), ignore_errors=True)

    def _mirror_sweep_staged(self) -> None:
        """Delete mirror versions a crashed WAP run staged but never
        published (no _PUBLISHED marker, not the pointer target)."""
        import shutil

        cur = self._mirror_current()
        for v in self._mirror_version_ids():
            if v != cur and not os.path.exists(
                os.path.join(self._mirror_ver_path(v), "_PUBLISHED")
            ):
                self.spark.sql(f"DROP TABLE IF EXISTS {self._mirror_tbl(v)}")
                shutil.rmtree(self._mirror_ver_path(v), ignore_errors=True)

    def _mirror_read(self, ver: str) -> DataFrame:
        """Catalog-backed read of one mirror version, re-registering the
        bucketed table after a fresh-process resume (bucket metadata lives
        in the in-memory session catalog; files + pointer survive)."""
        from .bucketed import read_bucketed

        tbl = self._mirror_tbl(ver)
        if not self.spark.catalog.tableExists(tbl):
            vpath = self._mirror_ver_path(ver)
            ddl = self.spark.read.parquet(vpath)._jdf.schema().toDDL()
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING parquet "
                f"CLUSTERED BY (conv_id) SORTED BY (conv_id, bucket_start) "
                f"INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{vpath}'"
            )
        return read_bucketed(self.spark, tbl)

    def series_input(self, run_id: str | None = None) -> DataFrame:
        """Observed hourly state as the gapfill/compress input.

        Plain mode: the day-partitioned tier — each series-keyed stage then
        pays its own conv_id shuffle. Bucketed mode: a bucketBy(conv_id)
        mirror refreshed when the hourly tier's fingerprint changes — ONE
        shuffle at mirror-write time, after which the gap-filler's window,
        the linear-fill FlatMapGroupsInPandas and the chunk compressor's
        aggregation all plan with ZERO Exchange (the bucketed scan's
        HashPartitioning(conv_id) satisfies every (conv_id, …)-clustered
        requirement; asserted in tests/test_bucketed.py). Net at scale: the
        two per-run series shuffles collapse into one amortized write that
        co-locates every later conv-keyed reader too. With an Iceberg
        catalog the same layout is `bucket(N, conv_id)` hidden partitioning.
        """
        hourly = observed_state(self.read_tier("hourly"))
        if not self.bucketed:
            return hourly
        from .bucketed import read_bucketed, write_bucketed

        work = work_manifest(
            hourly.withColumn("_all", F.lit("all")),
            F.col("_all"),
            self._tier_hash_cols(),
            "mirror",
        )
        pending = pending_rows(
            work.collect(), self.manifest, "hourly_bucketed"
        )
        if self.snapshots:
            out_ver = None
            if pending:
                ver = self._mirror_new_ver()
                vpath = self._mirror_ver_path(ver)
                os.makedirs(self._mirror_versions_dir, exist_ok=True)
                write_bucketed(
                    hourly,
                    self._mirror_tbl(ver),
                    n_buckets=self.n_buckets,
                    bucket_col="conv_id",
                    sort_cols=("conv_id", "bucket_start"),
                    path=vpath,
                )
                self._commit(
                    [
                        {
                            "run_id": run_id or new_run_id(),
                            "stage": "hourly_bucketed",
                            "partition_key": r["partition_key"],
                            "rows_in": r["rows_in"],
                            "rows_out": r["rows_in"],
                            "lineage": "hourly",
                            "input_snapshot_id": r["input_snapshot_id"],
                            "output_snapshot_id": vpath,
                        }
                        for r in pending
                    ]
                )
                if self._wap_active:
                    # stays unpublished (pointer untouched) until the seal;
                    # this run's later stages read the staged version below
                    if self._staged_mirror is not None and self._staged_mirror != ver:
                        import shutil

                        self.spark.sql(
                            f"DROP TABLE IF EXISTS {self._mirror_tbl(self._staged_mirror)}"
                        )
                        shutil.rmtree(
                            self._mirror_ver_path(self._staged_mirror),
                            ignore_errors=True,
                        )
                    self._staged_mirror = ver
                else:
                    self._mirror_publish(ver)
                out_ver = ver
            elif self._wap_active and self._staged_mirror:
                out_ver = self._staged_mirror
            else:
                out_ver = self._mirror_current()
            if out_ver is None:
                # mirror never built and nothing pending (e.g. empty hourly)
                return hourly
            return self._mirror_read(out_ver)
        tbl = self.bucketed_table()
        if pending:
            write_bucketed(
                hourly,
                tbl,
                n_buckets=self.n_buckets,
                bucket_col="conv_id",
                sort_cols=("conv_id", "bucket_start"),
                path=self.bucketed_path,
            )
            self._commit(
                [
                    {
                        "run_id": run_id or new_run_id(),
                        "stage": "hourly_bucketed",
                        "partition_key": r["partition_key"],
                        "rows_in": r["rows_in"],
                        "rows_out": r["rows_in"],
                        "lineage": "hourly",
                        "input_snapshot_id": r["input_snapshot_id"],
                        "output_snapshot_id": self.bucketed_path,
                    }
                    for r in pending
                ]
            )
        elif not self.spark.catalog.tableExists(tbl):
            # fresh-process resume: files + manifest survive, the in-memory
            # session catalog does not — re-register the existing layout
            # (no data rewrite; bucket metadata only)
            ddl = self.spark.read.parquet(self.bucketed_path)._jdf.schema().toDDL()
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING parquet "
                f"CLUSTERED BY (conv_id) SORTED BY (conv_id, bucket_start) "
                f"INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{self.bucketed_path}'"
            )
        return read_bucketed(self.spark, tbl)

    # -- stages --------------------------------------------------------------
    ALL_STAGES = ("hourly", "daily", "monthly", "gapfill", "compress")

    def run(
        self,
        t0: DataFrame,
        run_id: str | None = None,
        stages=None,
        budget: int | None = None,
    ) -> dict:
        """Run the batch job. `stages` limits execution to a prefix of
        ALL_STAGES (used by tests to simulate a kill between stages; a later
        run resumes from the manifest). In WAP mode the whole run stages
        unpublished and seals atomically in `_finish_run`; any exception —
        including an audit veto — aborts with published tables and the
        manifest untouched.

        `budget` caps how many pending partitions EACH stage builds this
        run (oldest-first); the rest stays pending and is reported in the
        result's `left` map. This is how a 10^12-turn historical backfill
        runs: bounded, checkpointed increments that each publish a
        consistent prefix, instead of one job that must survive to the end.
        Repeated budgeted runs converge to the exact state of one unbudgeted
        run (fingerprints, not budget bookkeeping, decide what is pending).

        A run lease (engine/lease.py) serializes writers per root: a second
        concurrent run raises LeaseHeldError instead of double-writing the
        same pending partitions; crashed holders are broken as stale."""
        if budget is not None and budget < 1:
            raise ValueError("budget must be >= 1 partition per stage")
        if self.use_lease:
            with self.lease():
                return self._run_locked(t0, run_id, stages, budget)
        return self._run_locked(t0, run_id, stages, budget)

    def run_until_complete(
        self,
        t0: DataFrame,
        budget: int,
        max_runs: int = 1000,
        run_id: str | None = None,
    ) -> list[dict]:
        """Drive budgeted runs until nothing is left pending (a bounded
        backfill orchestrator: each iteration is one crash-recoverable
        increment). Returns every run's result dict, in order.

        Scale note: every increment re-fingerprints the RAW input (one
        count+hash agg pass — the external-input late-data contract;
        derived stages prune via the snapshot changelog), so R increments
        cost R raw fingerprint scans on top of the bounded build work.
        That pass is a cheap columnar aggregation, but at extreme scale
        size `budget` so increments are few-and-large rather than
        many-and-tiny. Do NOT feed partial time slices to successive
        calls: a day absent from the presented input reads as vanished
        and its committed partitions are dropped as stale — the input
        contract is always the full (append-only growing) table."""
        results = []
        for i in range(max_runs):
            rid = f"{run_id}-{i:04d}" if run_id else None
            res = self.run(t0, run_id=rid, budget=budget)
            results.append(res)
            if not res["left"]:
                return results
        raise RuntimeError(
            f"backfill did not converge within {max_runs} budgeted runs"
        )

    def lease(self):
        """The root's writer lease — lifecycle operations running OUTSIDE
        run() (retention sweeps, compaction) can serialize against runs
        with ``with pipe.lease(): ...``."""
        from .lease import RunLease

        return RunLease(self.root, ttl_s=self.lease_ttl_s)

    def compact_manifest(self, prune_superseded: bool = False) -> dict:
        """Rewrite the manifest's accumulated commit files into one (see
        Manifest.compact). Serialized against runs by the writer lease —
        a reader racing the rename/unlink window could otherwise see
        duplicated rows (harmless but unclean) or a torn file list."""
        if self.use_lease:
            with self.lease():
                return self.manifest.compact(prune_superseded)
        return self.manifest.compact(prune_superseded)

    def _run_locked(
        self,
        t0: DataFrame,
        run_id: str | None = None,
        stages=None,
        budget: int | None = None,
    ) -> dict:
        if self.wap:
            self._begin_wap()
            try:
                return self._run_impl(t0, run_id, stages, budget)
            except Exception:
                self._abort_wap()
                raise
        return self._run_impl(t0, run_id, stages, budget)

    def _run_impl(
        self,
        t0: DataFrame,
        run_id: str | None = None,
        stages=None,
        budget: int | None = None,
    ) -> dict:
        stages = tuple(stages or self.ALL_STAGES)
        run_id = run_id or new_run_id()
        t0 = dedup_turns(mask_valid(t0))
        if self.tombstones.has_any():
            # forgotten conversations (engine/forget.py) filter out BEFORE
            # the work manifest, so only days that actually contained them
            # see a fingerprint change; the broadcast anti-join adds no
            # shuffle (the tombstone set is erasure-request-sized)
            t0 = t0.join(
                F.broadcast(self.tombstones.read(self.spark)),
                "conv_id",
                "left_anti",
            )
        t0 = t0.withColumn("bucket_date", F.to_date("ts"))
        # ONE dedup pass per run: dedup_turns is a full-width window shuffle
        # of the raw input, and without pinning it both the day fingerprint
        # scan AND build_hourly would re-execute it (the build's day filter
        # cannot push below the cross-day dedup window). localCheckpoint
        # materializes the deduped rows once; every later consumer filters
        # the pinned partitions (guide §5 — cut lineage when an intermediate
        # is reused; the ingest-once production shape).
        t0 = t0.localCheckpoint()
        done = {}
        scans: dict[str, str] = {}
        # stage -> pending keys deferred past this run's budget. A stage
        # that deferred work must NOT advance its changelog-pruning
        # reconcile pointer below: the pointer asserts "everything changed
        # up to this upstream snapshot is reflected here", which a
        # truncated batch hasn't done — advancing it would prune the
        # deferred keys out of the next run's work manifest forever.
        left: dict[str, int] = {}

        # 1. raw -> hourly, keyed by day. The sketch spec is part of the
        # fingerprint: turning sketches on/off re-rolls each day exactly once.
        day_work = work_manifest(
            t0,
            F.col("bucket_date").cast("string"),
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            "day",
            extra_token=self._day_token,
        )

        def build_hourly(keys):
            days = [k.split("=", 1)[1] for k in keys]
            inp = t0.filter(F.col("bucket_date").cast("string").isin(days))
            salted = self.salted
            if salted == "auto":
                # measurement-driven dispatch (engine/autoskew.py): both
                # paths are bit-identical, so the decision never enters a
                # fingerprint — only cost is at stake. Reported per run.
                from .autoskew import choose_salted

                salted, st = choose_salted(inp, **self.auto_salt_opts)
                scans["salt_auto"] = (
                    f"{'salted' if salted else 'plain'}"
                    f" ratio={st['ratio']:.1f} hot_est={st['hot_est']}"
                )
            roll = (
                rollup_hourly_salted(
                    inp,
                    self.n_salts,
                    sketch_cols=self.sketch_cols,
                    hist_cols=self.hist_cols,
                    firstlast_cols=self.firstlast_cols,
                    sumsq_cols=self.sumsq_cols,
                    sumprod_cols=self.sumprod_cols,
                    freq_cols=self.freq_cols,
                    hh_cols=self.hh_cols,
                    kmv_cols=self.kmv_cols,
                    session_gaps=self.session_gaps,
                    statedur_cols=self.statedur_cols,
                    twa_cols=self.twa_cols,
                    qsk_cols=self.qsk_cols,
                    topn_cols=self.topn_cols,
                    botn_cols=self.botn_cols,
                )
                if salted
                else rollup_hourly(
                    inp,
                    sketch_cols=self.sketch_cols,
                    hist_cols=self.hist_cols,
                    firstlast_cols=self.firstlast_cols,
                    sumsq_cols=self.sumsq_cols,
                    sumprod_cols=self.sumprod_cols,
                    freq_cols=self.freq_cols,
                    hh_cols=self.hh_cols,
                    kmv_cols=self.kmv_cols,
                    session_gaps=self.session_gaps,
                    statedur_cols=self.statedur_cols,
                    twa_cols=self.twa_cols,
                    qsk_cols=self.qsk_cols,
                    topn_cols=self.topn_cols,
                    botn_cols=self.botn_cols,
                )
            )
            if self.fill_tiers:
                roll = densify_hourly_locf(roll)
            return roll.withColumns(
                {
                    "bucket_date": F.to_date("bucket_start"),
                    "conv_bucket": _conv_bucket(),
                }
            )

        done["hourly"] = self._run_stage(
            "hourly", run_id, day_work, build_hourly,
            self.tier_path("hourly"), self.hourly_partition_cols(), "raw",
            budget=budget, left=left,
        )
        if "daily" not in stages:
            return self._finish_run(run_id, done, scans, left)

        # 2. hourly -> daily, keyed by day (observed rows only: gap-filled
        # tier rows carry copied state and must not feed upward aggregation).
        # Days the RETENTION policy removed from the hourly tier are
        # protected from the stale-input cascade: their input vanished by
        # policy, not by data deletion, and their committed daily rollup is
        # exactly what retention preserves.
        hourly = observed_state(self.read_tier("hourly"))
        changed_h = self._changed_upstream_days("daily", "hourly")
        daily_inv = None
        work_src = hourly
        if changed_h is not None:
            daily_inv = [
                f"day={v}" for v in self._upstream_day_inventory("hourly")
            ]
            work_src = hourly.filter(
                F.col("bucket_date").cast("string").isin(changed_h)
            )
            scans["daily"] = f"pruned:{len(changed_h)}/{len(daily_inv)}"
        else:
            scans["daily"] = "full"
        daily_work = work_manifest(
            work_src, F.col("bucket_date").cast("string"),
            self._tier_hash_cols(), "day",
        )
        retained_days = self._retention_dropped("hourly")

        def build_daily(keys):
            days = [k.split("=", 1)[1] for k in keys]
            inp = hourly.filter(F.col("bucket_date").cast("string").isin(days))
            return rollup_up(inp, "daily").withColumns(
                {
                    "bucket_date": F.to_date("bucket_start"),
                    "conv_bucket": _conv_bucket(),
                }
            )

        done["daily"] = self._run_stage(
            "daily", run_id, daily_work, build_daily,
            self.tier_path("daily"), ["bucket_date"], "hourly",
            protect=retained_days,
            inventory=daily_inv,
            budget=budget, left=left,
        )
        if self.snapshots and not self.wap and not left.get("daily"):
            cur_h = self._store(self.table_path("hourly")).current_id()
            if cur_h is not None:
                self._record_reconciled("daily", cur_h)
        if "monthly" not in stages:
            return self._finish_run(run_id, done, scans, left)

        # 3. daily -> monthly, keyed by month. Months finalized by daily
        # retention are FROZEN: their daily days are gone, so a re-roll
        # would aggregate a partial month — excluded from the work manifest
        # (never pending, never stale-dropped) and surfaced to the caller.
        from .retention import frozen_months

        daily = self.read_tier("daily")
        month_of = F.date_format("bucket_start", "yyyy-MM")
        changed_d = self._changed_upstream_days("monthly", "daily")
        month_inv = None
        month_src = daily
        if changed_d is not None:
            changed_months = sorted({d[:7] for d in changed_d})
            month_inv = sorted(
                {f"month={d[:7]}"
                 for d in self._upstream_day_inventory("daily")}
            )
            month_src = daily.filter(month_of.isin(changed_months))
            scans["monthly"] = (
                f"pruned:{len(changed_months)}/{len(month_inv)}"
            )
        else:
            scans["monthly"] = "full"
        month_work = work_manifest(
            month_src, month_of, self._tier_hash_cols(), "month"
        )
        frozen = frozen_months(self.manifest)
        month_work = month_work.collect()
        if frozen:
            pend_frozen = {
                r["partition_key"].split("=", 1)[1]
                for r in pending_rows(month_work, self.manifest, "monthly")
            } & frozen
            if pend_frozen:
                done["frozen_skipped"] = sorted(pend_frozen)
            frozen_keys = {f"month={m}" for m in frozen}
            month_work = [
                r for r in month_work if r["partition_key"] not in frozen_keys
            ]

        def build_monthly(keys):
            months = [k.split("=", 1)[1] for k in keys]
            inp = daily.filter(month_of.isin(months))
            return rollup_up(inp, "monthly").withColumns(
                {
                    "bucket_month": F.date_format("bucket_start", "yyyy-MM"),
                    "conv_bucket": _conv_bucket(),
                }
            )

        def monthly_stage() -> int:
            n = self._run_stage(
                "monthly", run_id, month_work, build_monthly,
                self.tier_path("monthly"), ["bucket_month"], "daily",
                protect={f"month={m}" for m in frozen},
                inventory=month_inv,
                budget=budget, left=left,
            )
            if self.snapshots and not self.wap and not left.get("monthly"):
                cur_d = self._store(self.table_path("daily")).current_id()
                if cur_d is not None:
                    self._record_reconciled("monthly", cur_d)
            return n

        if "gapfill" not in stages:
            done["monthly"] = monthly_stage()
            return self._finish_run(run_id, done, scans, left)

        # 4+5. gap-fill and compress, keyed by conv_bucket (series must stay
        # whole; observed rows only — the gapfill table derives its own
        # fills). In bucketed mode this is the conv_id-bucketed mirror:
        # gapfill and compress below then plan with zero Exchange
        # (series_input).
        # Series-stage short-circuit (snapshot mode): when the hourly
        # snapshot is inode-identical to what BOTH series stages last
        # reconciled, their full-bucket fingerprints cannot have changed
        # and no stale transition is possible — skip the scan, the mirror
        # touch, and both stages outright. (Per-bucket partial pruning is
        # deliberately not attempted: a bucket's fingerprint spans its
        # every day, and layout-1 hourly cannot dir-prune on conv_bucket.)
        def series_stages() -> dict:
            out: dict = {}
            ch_g = self._changed_upstream_days("gapfill", "hourly")
            ch_c = self._changed_upstream_days("compress", "hourly")
            if ch_g == [] and ch_c == [] and "compress" in stages:
                scans["series"] = "pruned-noop"
                return {"gapfill": 0, "compress": 0}
            scans["series"] = "full"
            hourly = self.series_input(run_id)
            # collect the conv-bucket work manifest ONCE: gapfill and
            # compress share the same keys/fingerprints, and passing the
            # DataFrame to both stages would re-execute the full-hourly
            # fingerprint aggregation twice (each _run_stage collects its
            # `work` input)
            cb_work = work_manifest(
                hourly, F.col("conv_bucket").cast("string"),
                _STATE_HASH_COLS, "cb",
            ).collect()

            def build_gapfill(keys):
                cbs = [int(k.split("=", 1)[1]) for k in keys]
                inp = hourly.filter(F.col("conv_bucket").isin(cbs))
                series = hourly_series(inp)
                return gapfill(series, self.fill_method).withColumn(
                    "conv_bucket", _conv_bucket()
                )

            out["gapfill"] = self._run_stage(
                "gapfill", run_id, cb_work, build_gapfill,
                self.gapfill_path, ["conv_bucket"], "hourly",
                budget=budget, left=left,
            )
            if self.snapshots and not self.wap and not left.get("gapfill"):
                cur_h = self._store(self.table_path("hourly")).current_id()
                if cur_h is not None:
                    self._record_reconciled("gapfill", cur_h)
            if "compress" not in stages:
                return out

            def build_compress(keys):
                cbs = [int(k.split("=", 1)[1]) for k in keys]
                inp = hourly.filter(F.col("conv_bucket").isin(cbs))
                return make_chunks(hourly_series(inp), tier="hourly").withColumn(
                    "conv_bucket", _conv_bucket()
                )

            out["compress"] = self._run_stage(
                "compress", run_id, cb_work, build_compress,
                self.chunks_path, ["conv_bucket"], "hourly",
                budget=budget, left=left,
            )
            if self.snapshots and not self.wap and not left.get("compress"):
                cur_h = self._store(self.table_path("hourly")).current_id()
                if cur_h is not None:
                    self._record_reconciled("compress", cur_h)
            return out

        # The monthly stage reads only the DAILY tier; the series stages
        # read only the HOURLY tier and write independent tables — the two
        # legs share no data dependency, so overlap them (guide §2.6:
        # Spark's scheduler runs concurrent driver-thread jobs fine, and
        # the second leg's tasks back-fill the first leg's stragglers).
        # Shared driver state is thread-safe by construction: manifest
        # commits are one-immutable-file-per-commit, done/scans/left
        # writes touch disjoint keys, and the tables/stores are disjoint
        # paths. WAP runs keep the serial order: staged-snapshot
        # bookkeeping (_staged/_buffered_rows/_staged_mirror) is
        # deliberately not made concurrent.
        if self.wap:
            done["monthly"] = monthly_stage()
            done.update(series_stages())
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as ex:
                mf = ex.submit(monthly_stage)
                sf = ex.submit(series_stages)
                series_done = sf.result()
                done["monthly"] = mf.result()
            done.update(series_done)

        return self._finish_run(run_id, done, scans, left)

    # -- EP3: SQL over continuous aggregates ---------------------------------
    def register_views(self):
        for tier in ("hourly", "daily", "monthly"):
            path = self.tier_path(tier)
            if self.snapshots:
                if self._store(path).current_id() is None:
                    continue
            elif not os.path.exists(path):
                continue
            tier_view(self.read_tier(tier), tier).createOrReplaceTempView(
                f"tiers_{tier}"
            )
