"""Iceberg-backend seam contract (SURVEY.md §7.1, VERDICT r2 item 10).

No iceberg-spark-runtime jar exists in this sandbox, so the catalog branch
of engine/io.py can never execute against a real catalog here. These tests
pin the seam with a fake catalog double: the EXACT DataFrameWriterV2 call
sequence write_tier must issue — createOrReplace for a first write,
overwritePartitions for an atomic dynamic-partition overwrite of an
existing table, append for append mode — so a future environment with the
jar is a config flip, not a port.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine import io as eio  # noqa: E402

CAT_CONF = [("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")]


class FakeWriterV2:
    def __init__(self, log, target):
        self.log = log
        self.target = target

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.target))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions", self.target))

    def append(self):
        self.log.append(("append", self.target))


class FakeCatalog:
    def __init__(self, log, existing):
        self.log = log
        self.existing = existing

    def tableExists(self, ident):
        self.log.append(("tableExists", ident))
        return ident in self.existing


class FakeConf:
    def getAll(self):
        return CAT_CONF


class FakeContext:
    def getConf(self):
        return FakeConf()


class FakeSpark:
    def __init__(self, log, existing):
        self.sparkContext = FakeContext()
        self.catalog = FakeCatalog(log, existing)


class FakeDF:
    """Duck-typed stand-in for a DataFrame already carrying its partition
    columns (so write_tier's bucket_date derivation is skipped)."""

    def __init__(self, log, existing=()):
        self.log = log
        self.sparkSession = FakeSpark(log, set(existing))
        self.columns = ["conv_id", "bucket_start", "tier", "bucket_date"]

    def writeTo(self, target):
        self.log.append(("writeTo", target))
        return FakeWriterV2(self.log, target)


def test_backend_dispatch_maps_path_to_identifier():
    spark = FakeSpark([], set())
    backend, target = eio.tier_backend(
        spark, "/data/x/tiers/hourly", _conf_items=CAT_CONF
    )
    assert (backend, target) == ("iceberg", "lake.tiers.hourly")
    backend, target = eio.tier_backend(spark, "/data/x/tiers/hourly", _conf_items=[])
    assert (backend, target) == ("parquet", "/data/x/tiers/hourly")


def test_first_overwrite_creates_table():
    log = []
    df = FakeDF(log, existing=())
    eio.write_tier(df, "/r/tiers/hourly", ("tier", "bucket_date"))
    assert log == [
        ("writeTo", "lake.tiers.hourly"),
        ("using", "iceberg"),
        ("tableExists", "lake.tiers.hourly"),
        ("createOrReplace", "lake.tiers.hourly"),
    ]


def test_overwrite_existing_uses_overwrite_partitions():
    """The atomic dynamic-partition commit — the Iceberg equivalent of the
    parquet backend's partitionOverwriteMode=dynamic — must be the verb for
    re-rolls of existing tables (never a whole-table replace)."""
    log = []
    df = FakeDF(log, existing={"lake.tiers.hourly"})
    eio.write_tier(df, "/r/tiers/hourly", ("tier", "bucket_date"))
    assert log == [
        ("writeTo", "lake.tiers.hourly"),
        ("using", "iceberg"),
        ("tableExists", "lake.tiers.hourly"),
        ("overwritePartitions", "lake.tiers.hourly"),
    ]


def test_append_mode_appends():
    log = []
    df = FakeDF(log, existing={"lake.tiers.hourly"})
    eio.write_tier(df, "/r/tiers/hourly", ("tier", "bucket_date"), mode="append")
    assert log == [
        ("writeTo", "lake.tiers.hourly"),
        ("using", "iceberg"),
        ("append", "lake.tiers.hourly"),
    ]


def test_read_tier_uses_catalog_identifier(monkeypatch):
    calls = []

    class FakeReader:
        def table(self, ident):
            calls.append(("table", ident))

            class _DF:
                def filter(self, *_a, **_k):
                    calls.append(("filter",))
                    return self

            return _DF()

    class FakeSparkRead(FakeSpark):
        def __init__(self):
            super().__init__(calls, set())
            self.read = FakeReader()

    eio.read_tier(FakeSparkRead(), "/r/tiers/monthly")
    assert calls == [("table", "lake.tiers.monthly")]
