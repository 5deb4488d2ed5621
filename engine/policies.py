"""Declarative maintenance policies: TimescaleDB's ``add_*_policy``
background jobs as ONE ordered, idempotent front door over the engine's
lifecycle mechanisms (cagg refresh, tier retention, compaction, manifest
compaction, snapshot GC).

Every mechanism already exists and is safe in isolation; what a policy
adds is the ORDER, which is correctness content, not convenience:

1. **Continuous aggregates refresh first, parents before children.**
   A view can never re-read a retention-dropped hourly day. Refreshing
   BEFORE the drop guarantees every view consumed the day's final state;
   with ``retain_dropped`` views the wrong order freezes a STALE partial
   (late data consumed by the tier but not yet by the view is lost from
   the view forever) — pytest-pinned with the losing counterfactual.
2. **Hourly retention, then daily retention.** Daily drops freeze their
   months; both droppability checks consult the manifest so a partially
   committed lineage is never truncated. After the drops, every view
   refreshes once more so retention is reconciled INSIDE the policy run
   (retain_dropped views record their freeze now, propagating views
   shrink now) — the policy ends with nothing pending.
3. **Compaction after retention** (never compact doomed partitions), and
   manifest compaction after the retention commits it must fold.
4. **Snapshot expiry LAST**, pinning every managed view's and external
   consumer's consumed snapshot — including hierarchical children's pins
   on their parents' versioned partials stores — so GC can never
   silently degrade the next refresh to a full rebuild.

``apply()`` is idempotent: a second run refreshes to noop, finds nothing
droppable, and expires nothing new. Crash-safety is inherited from the
mechanisms (manifest-committed drops, CoW snapshot publishes, lease-
serialized manifest compaction); a policy interrupted between steps
simply completes on the next apply.
"""

from __future__ import annotations

from .cagg import ContinuousAggregate, HierarchicalAggregate


def _depth(c: ContinuousAggregate) -> int:
    d = 0
    while isinstance(c, HierarchicalAggregate):
        d += 1
        c = c.parent
    return d


class MaintenancePolicy:
    """One maintenance cycle's declaration.

    caggs: ContinuousAggregate / HierarchicalAggregate instances to keep
        fresh (refresh order is computed: parents before children).
    consumers: views/consumers NOT refreshed by this policy whose consumed
        snapshots must still survive expiry (lagging dashboards, replicas'
        IncrementalConvSummary instances, or their paths).
    drop_hourly_older_than / drop_daily_older_than: retention horizons
        (YYYY-MM-DD); only manifest-complete lineages drop.
    compact: kwargs dicts for `retention.compact_partition`
        (e.g. {"tier": "hourly", "n_files": 1, "sort_by": ("conv_id",)}).
    compact_manifest / prune_superseded: fold the manifest's per-commit
        files (see Manifest.compact).
    expire_keep_last: snapshot GC depth for every pipeline table and every
        managed versioned partials store; None disables expiry.
    """

    def __init__(
        self,
        *,
        caggs=(),
        consumers=(),
        drop_hourly_older_than: str | None = None,
        drop_daily_older_than: str | None = None,
        compact=(),
        compact_manifest: bool = False,
        prune_superseded: bool = True,
        expire_keep_last: int | None = None,
    ):
        self.caggs = sorted(caggs, key=_depth)
        self.consumers = list(consumers)
        self.drop_hourly_older_than = drop_hourly_older_than
        self.drop_daily_older_than = drop_daily_older_than
        self.compact = [dict(c) for c in compact]
        self.compact_manifest = bool(compact_manifest)
        self.prune_superseded = bool(prune_superseded)
        self.expire_keep_last = expire_keep_last

    # -- the ordered cycle -------------------------------------------------
    def apply(self, pipe, run_id: str = "maintenance") -> dict:
        from .retention import (
            compact_partition,
            drop_daily_partitions,
            drop_hourly_partitions,
            droppable_daily_days,
            droppable_hourly_days,
            expire_snapshots,
        )

        report: dict = {}

        # 1. views consume everything the tiers currently hold
        report["cagg_refresh"] = {c.path: c.refresh() for c in self.caggs}

        # 2. retention (hourly, then daily), then reconcile the views
        if self.drop_hourly_older_than:
            days = droppable_hourly_days(pipe, self.drop_hourly_older_than)
            report["hourly_dropped"] = (
                drop_hourly_partitions(pipe, days, run_id=run_id) if days else []
            )
        if self.drop_daily_older_than:
            days = droppable_daily_days(pipe, self.drop_daily_older_than)
            report["daily_dropped"] = (
                drop_daily_partitions(pipe, days, run_id=run_id) if days else []
            )
        if self.drop_hourly_older_than or self.drop_daily_older_than:
            report["cagg_reconcile"] = {c.path: c.refresh() for c in self.caggs}

        # 3. data compaction, then the manifest's own
        if self.compact:
            for spec in self.compact:
                compact_partition(pipe, **spec)
            report["compacted"] = self.compact
        if self.compact_manifest:
            report["manifest_compact"] = pipe.compact_manifest(
                self.prune_superseded
            )

        # 4. snapshot GC with every consumed snapshot pinned
        if self.expire_keep_last is not None:
            hier = [c for c in self.caggs if isinstance(c, HierarchicalAggregate)]
            lagging_hier = [
                c for c in self.consumers if isinstance(c, HierarchicalAggregate)
            ]
            top = [c for c in self.caggs if not isinstance(c, HierarchicalAggregate)]
            lagging_top = [
                c for c in self.consumers if not isinstance(c, HierarchicalAggregate)
            ]
            expired = expire_snapshots(
                pipe,
                keep_last=self.expire_keep_last,
                consumers=top + lagging_top,
            )
            # versioned partials stores GC too, children's bases pinned
            pins: dict[str, set] = {}
            stores: dict[str, ContinuousAggregate] = {}
            for c in self.caggs + [
                x for x in self.consumers if isinstance(x, ContinuousAggregate)
            ]:
                if getattr(c, "versioned", False):
                    stores.setdefault(c.path, c)
            for c in hier + lagging_hier:
                stores.setdefault(c.parent.path, c.parent)
                sid = c.consumed_id()
                if sid:
                    pins.setdefault(c.parent.path, set()).add(sid)
            for path, owner in stores.items():
                if owner.partials_store.current_id() is not None:
                    expired[f"cagg:{path}"] = owner.partials_store.expire(
                        keep_last=self.expire_keep_last,
                        protected=pins.get(path, set()),
                    )
            report["expired"] = expired
        return report
