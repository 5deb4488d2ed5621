"""Snapshot-versioned parquet table store — the Iceberg-semantics half of
the io seam (SURVEY.md §7.1) that the parquet emulation was missing.

The plain parquet backend overwrites partition directories in place, which
has two honest gaps called out in VERDICT/ADVICE r2: compaction briefly
removes the table path (unsafe against concurrent readers), and there is no
time travel — a re-roll destroys the previous state of the partition. A real
Iceberg catalog fixes both with snapshot commits; this module provides the
same guarantees on a plain filesystem, cheaply:

Layout::

    <table_root>/
      _CURRENT                  # text file: id of the published snapshot
      _snaps/<snap_id>/         # one immutable data tree per snapshot
          meta.json             # {id, parent, op}
          bucket_date=.../part-*.parquet

A new snapshot begins as a **hardlink copy-on-write** of the current one
(`os.link` per file — O(#files) metadata ops, zero data copied; the same
trick Iceberg gets from manifest reuse), the writer mutates only the
partitions it touches (Spark's dynamic partition overwrite unlinks the
staged hardlinks, never the published files), and `publish` flips the
`_CURRENT` pointer with an atomic `os.replace`. Consequences:

- **readers are never torn**: a reader resolves `_CURRENT` once and then
  only ever sees that immutable snapshot tree, regardless of concurrent
  re-rolls, retention drops, or compactions;
- **time travel**: `read(spark, as_of=<id>)` replays any retained snapshot;
- **rollback**: re-publish an older snapshot id (pointer flip, no data IO);
- **expire**: deleting old snapshot trees frees data exactly when the last
  hardlink to a file disappears (Iceberg's `expire_snapshots`);
- **changelog**: `diff(a, b)` lists partitions added/removed/rewritten
  between two snapshots by comparing (file name, inode) inventories —
  hardlinked (shared) files compare equal without reading data.

At 100-TB scale the equivalent structure is object-store manifests rather
than hardlinks, but the *semantics* — CoW partition trees + atomic pointer
swap + snapshot GC — are exactly what the engine's manifest-driven
incremental re-rolls need for safe concurrent readers; only the metadata
operation cost model differs (per-file metadata op here, per-manifest-entry
there). Driver-side loops below touch snapshot *metadata* (file inventory),
never data rows.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAPS = "_snaps"
_CURRENT = "_CURRENT"


#: published-snapshot DataFrame memo: (id(spark), snapshot dir) -> DataFrame.
#: Safe because published snapshot trees are immutable (CoW — every write,
#: drop or compaction begins a NEW snapshot id); bounded by a clear-on-cap.
_READ_CACHE: dict = {}
_READ_CACHE_CAP = 512


class SnapshotError(RuntimeError):
    pass


class SnapStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, _SNAPS), exist_ok=True)

    # -- pointer -----------------------------------------------------------
    @property
    def _current_file(self) -> str:
        return os.path.join(self.root, _CURRENT)

    def current_id(self) -> str | None:
        try:
            with open(self._current_file) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def snapshot_path(self, snap_id: str) -> str:
        return os.path.join(self.root, _SNAPS, snap_id)

    def snapshot_ids(self) -> list[str]:
        """All retained snapshot ids, oldest first (ids sort by creation)."""
        d = os.path.join(self.root, _SNAPS)
        return sorted(s for s in os.listdir(d) if not s.startswith("."))

    def meta(self, snap_id: str) -> dict:
        with open(os.path.join(self.snapshot_path(snap_id), "meta.json")) as f:
            return json.load(f)

    # -- named tags (Iceberg tag refs) ----------------------------------------
    @property
    def _tags_dir(self) -> str:
        return os.path.join(self.root, "_tags")

    def tag(self, name: str, snap_id: str | None = None) -> str:
        """Pin a retained snapshot under a stable name (compliance audits,
        'last-good' serving refs). Tagged snapshots survive `expire` at any
        keep_last. One file per tag, tmp+rename — re-tagging is atomic."""
        if "/" in name or name.startswith("."):
            raise SnapshotError(f"bad tag name {name!r}")
        sid = snap_id or self.current_id()
        if sid is None or not os.path.isdir(self.snapshot_path(sid)):
            raise SnapshotError(f"cannot tag unknown snapshot {sid!r}")
        os.makedirs(self._tags_dir, exist_ok=True)
        p = os.path.join(self._tags_dir, name)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(sid)
        os.replace(tmp, p)
        return sid

    def tags(self) -> dict[str, str]:
        if not os.path.isdir(self._tags_dir):
            return {}
        out = {}
        for n in os.listdir(self._tags_dir):
            if ".tmp-" in n:
                continue
            with open(os.path.join(self._tags_dir, n)) as f:
                out[n] = f.read().strip()
        return out

    def untag(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self._tags_dir, name))
        except FileNotFoundError:
            raise SnapshotError(f"no such tag {name!r}") from None

    def resolve(self, ref: str) -> str:
        """A snapshot id, or a tag name → its pinned id."""
        t = self.tags()
        if ref in t:
            return t[ref]
        if os.path.isdir(self.snapshot_path(ref)):
            return ref
        raise SnapshotError(f"{ref!r} is neither a tag nor a retained snapshot")

    # -- write path ----------------------------------------------------------
    def _new_id(self) -> str:
        # Monotonic prefix: max existing prefix + 1, NOT the count of retained
        # snapshots — after expire() shrinks the set, a count-derived prefix
        # would reuse low numbers and break snapshot_ids()' oldest-first
        # ordering (making expire(keep_last=N) GC genuinely newer snapshots).
        prefixes = [
            int(s.split("-", 1)[0])
            for s in self.snapshot_ids()
            if s.split("-", 1)[0].isdigit()
        ]
        nxt = (max(prefixes) + 1) if prefixes else 0
        return f"{nxt:08d}-{uuid.uuid4().hex[:8]}"

    def begin(self, op: str = "write") -> str:
        """Start a snapshot: CoW-hardlink the current tree into a fresh
        snapshot dir and return its id (unpublished until `publish`)."""
        sid = self._new_id()
        dst = self.snapshot_path(sid)
        parent = self.current_id()
        if parent is not None:
            _hardlink_tree(self.snapshot_path(parent), dst)
        else:
            os.makedirs(dst)
        with open(os.path.join(dst, "meta.json"), "w") as f:
            json.dump({"id": sid, "parent": parent, "op": op}, f)
        return sid

    def publish(self, snap_id: str) -> None:
        """Atomically flip `_CURRENT` to `snap_id` (os.replace: readers see
        either the old pointer or the new one, never a torn file)."""
        if not os.path.isdir(self.snapshot_path(snap_id)):
            raise SnapshotError(f"unknown snapshot {snap_id!r}")
        meta = self.meta(snap_id)
        if not meta.get("published"):
            meta["published"] = True
            mp = os.path.join(self.snapshot_path(snap_id), "meta.json")
            with open(mp + ".tmp", "w") as f:
                json.dump(meta, f)
            os.replace(mp + ".tmp", mp)
        tmp = self._current_file + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(snap_id)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._current_file)

    def clean_stale_staging(self) -> list[str]:
        """Delete snapshots that were staged but never published (a crashed
        write-audit-publish run's leftovers). Never touches the current
        snapshot or anything that was ever published (rollback targets)."""
        cur = self.current_id()
        doomed = [
            s
            for s in self.snapshot_ids()
            if s != cur and not self.meta(s).get("published")
        ]
        for s in doomed:
            shutil.rmtree(self.snapshot_path(s))
        return doomed

    def abort(self, snap_id: str) -> None:
        """Discard an unpublished staging snapshot."""
        if snap_id == self.current_id():
            raise SnapshotError("refusing to abort the published snapshot")
        shutil.rmtree(self.snapshot_path(snap_id), ignore_errors=True)

    def drop_partitions(self, dirnames: list[str], op: str = "drop") -> str:
        """Publish a new snapshot without the named partition directories
        (e.g. ``['bucket_date=2026-01-05']``). Prior snapshots retain them —
        this is how retention deletes stay time-travelable."""
        sid = self.begin(op)
        for d in dirnames:
            shutil.rmtree(os.path.join(self.snapshot_path(sid), d), ignore_errors=True)
        self.publish(sid)
        return sid

    def rollback(self, snap_id: str) -> None:
        """Point the table back at a retained snapshot (pointer flip only)."""
        self.publish(snap_id)

    def expire(
        self, keep_last: int = 1, protected: set[str] | None = None
    ) -> list[str]:
        """GC: delete all but the newest `keep_last` retained snapshots (the
        published one is always kept). File data is freed when its last
        hardlink goes. `protected` ids are never deleted regardless of age —
        callers pass snapshot ids still referenced by sealed run barriers
        (read_consistent / rollback_run targets) or by an incremental
        consumer's _CONSUMED pointer, so keep_last=1 cannot strand a
        rollback target or silently degrade a consumer to full rebuild."""
        keep_last = max(1, keep_last)
        protected = (protected or set()) | set(self.tags().values())
        ids = self.snapshot_ids()
        cur = self.current_id()
        doomed = [s for s in ids[:-keep_last] if s != cur and s not in protected]
        for s in doomed:
            shutil.rmtree(self.snapshot_path(s))
        return doomed

    # -- read path -----------------------------------------------------------
    def read(self, spark: SparkSession, as_of: str | None = None) -> DataFrame:
        """DataFrame over the published (or `as_of`) snapshot. The returned
        plan is pinned to that snapshot's immutable file tree: concurrent
        publishes never change what this reader sees.

        PUBLISHED snapshots are memoized per (session, snapshot dir): their
        trees are immutable by construction (every mutation begins a NEW
        snapshot), so the DataFrame — and crucially its already-computed
        file listing — can be reused by every later consult. A resume run
        re-reads each tier a handful of times per stage; without the memo
        each read re-listed hundreds of partition dirs. Staged (unpublished)
        snapshots are never cached: WAP writes mutate them in place."""
        sid = self.resolve(as_of) if as_of is not None else self.current_id()
        if sid is None:
            raise SnapshotError(f"{self.root}: no published snapshot")
        path = self.snapshot_path(sid)
        if not os.path.isdir(path):
            raise SnapshotError(f"{self.root}: snapshot {sid!r} expired or unknown")
        key = (id(spark), path)
        cached = _READ_CACHE.get(key)
        if cached is not None:
            return cached
        df = spark.read.option("basePath", path).parquet(*_data_dirs(path))
        if self.meta(sid).get("published"):
            if len(_READ_CACHE) >= _READ_CACHE_CAP:
                _READ_CACHE.clear()
            _READ_CACHE[key] = df
        return df

    # -- changelog -----------------------------------------------------------
    def diff(self, snap_a: str, snap_b: str) -> dict[str, list[str]]:
        """Partition-level changelog a→b: ``added`` / ``removed`` /
        ``rewritten`` partition dirnames. Shared (hardlinked) files compare
        equal by (name, inode) without touching data — the CDC seam an
        incremental downstream consumer reads instead of re-scanning."""
        inv_a = _partition_inventory(self.snapshot_path(snap_a))
        inv_b = _partition_inventory(self.snapshot_path(snap_b))
        return {
            "added": sorted(set(inv_b) - set(inv_a)),
            "removed": sorted(set(inv_a) - set(inv_b)),
            "rewritten": sorted(
                p for p in set(inv_a) & set(inv_b) if inv_a[p] != inv_b[p]
            ),
        }

    def read_changes(
        self, spark: SparkSession, since: str, until: str | None = None
    ) -> DataFrame:
        """Rows of every partition added or rewritten after `since` (up to
        `until`, default: published) — partition-pruned to the changed set."""
        until = until or self.current_id()
        d = self.diff(since, until)
        changed = d["added"] + d["rewritten"]
        base = self.snapshot_path(until)
        if not changed:
            return self.read(spark, as_of=until).limit(0)
        return spark.read.option("basePath", base).parquet(
            *(os.path.join(base, p) for p in changed)
        )


def _data_dirs(snap_path: str) -> list[str]:
    """Partition dirs of a snapshot (excludes meta.json); reading these with
    a basePath keeps partition-column discovery + pruning intact while
    tolerating the non-data meta file at the root."""
    dirs = [
        os.path.join(snap_path, d)
        for d in os.listdir(snap_path)
        if os.path.isdir(os.path.join(snap_path, d))
    ]
    return dirs or [snap_path]  # empty snapshot: let Spark raise its usual error


def _hardlink_tree(src: str, dst: str) -> None:
    for dirpath, dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        target = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(target, exist_ok=True)
        for fn in filenames:
            if rel == "." and fn == "meta.json":
                continue  # each snapshot writes its own meta
            os.link(os.path.join(dirpath, fn), os.path.join(target, fn))


def _partition_inventory(snap_path: str) -> dict[str, frozenset]:
    """partition dirname -> frozenset of (relative file name, inode)."""
    out: dict[str, frozenset] = {}
    for d in os.listdir(snap_path):
        full = os.path.join(snap_path, d)
        if not os.path.isdir(full):
            continue
        files = []
        for dirpath, _dn, filenames in os.walk(full):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                files.append((os.path.relpath(p, full), os.stat(p).st_ino))
        out[d] = frozenset(files)
    return out
