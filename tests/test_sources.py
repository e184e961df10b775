"""Format source/sink roundtrips (csv/json/orc/partitioned writes)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pandamapreduce_spark.sources import read_csv, read_json, read_orc, try_delta, write_csv, write_json, write_orc

from tests.conftest import SF_DIR

SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _canon(df):
    return sorted(
        (r.o_orderkey, r.o_custkey, r.o_orderstatus, round(r.o_totalprice, 4), r.o_orderdate, r.o_orderpriority)
        for r in df.collect()
    )


def test_csv_roundtrip(spark):
    orders = _orders(spark)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "orders_csv")
        write_csv(orders, p)
        back = read_csv(spark, p, SCHEMA)
        assert _canon(back) == _canon(orders)


def test_json_roundtrip(spark):
    orders = _orders(spark)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "orders_json")
        write_json(orders, p)
        back = read_json(spark, p, SCHEMA)
        assert _canon(back) == _canon(orders)


def test_orc_partitioned_roundtrip(spark):
    orders = _orders(spark)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "orders_orc")
        write_orc(orders, p, partition_by=["o_orderstatus"])
        # hive-style layout on disk → partition pruning works
        assert any(e.startswith("o_orderstatus=") for e in os.listdir(p))
        back = read_orc(spark, p).select(*orders.columns)
        assert back.count() == orders.count()
        # pruned read only touches one directory
        pruned = read_orc(spark, p).where(F.col("o_orderstatus") == "F")
        assert pruned.count() == orders.where(F.col("o_orderstatus") == "F").count()


def test_delta_gated(spark):
    # jar not in this image: must degrade cleanly, never raise
    assert try_delta(spark) is None


def test_events_ts_sniffer_handles_dataset_dirs(tmp_path):
    """_ts_is_nanos must resolve the schema for a single parquet file
    AND a partitioned dataset directory (pq.read_schema rejects dirs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pandamapreduce_spark.streaming.events import _ts_is_nanos

    for sub, typ, want in (("ns_dir", pa.timestamp("ns"), True), ("us_dir", pa.timestamp("us"), False)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(2):
            pq.write_table(pa.table({"ts": pa.array([1, 2], typ)}), d / f"part-{i}.parquet")
        assert _ts_is_nanos(str(d)) is want
        assert _ts_is_nanos(str(d / "part-0.parquet")) is want


def test_avro_gated(spark):
    """spark-avro module absent from this image: the probe must say so
    cleanly; where present, a roundtrip must work."""
    from pandamapreduce_spark.sources.formats import has_avro, read_avro, write_avro

    if not has_avro(spark):
        return  # gated: this image lacks the avro source module
    import tempfile

    with tempfile.TemporaryDirectory() as d:  # pragma: no cover
        df = spark.range(5).withColumnRenamed("id", "v")
        write_avro(df, f"{d}/a")
        assert read_avro(spark, f"{d}/a").count() == 5


def test_local_dirs_env_guard():
    """A set-but-empty SPARK_LOCAL_DIRS overrides spark.local.dir and
    lands shuffle on the virtio disk; both get_spark and the driver
    contract must pin the env var to tmpfs BEFORE any JVM launch.
    (The live session already proves the get_spark path; this guards
    the import-time pin against regressions.)"""
    import importlib
    import os

    import pytest

    if not os.access("/dev/shm", os.W_OK):
        pytest.skip("/dev/shm not writable — the tmpfs pin does not apply on this host")

    # Trigger the import-time pin before asserting it: standalone runs
    # (pytest -k) may reach this test before anything imported the
    # driver contract or built a session.
    import __spark_entry__  # noqa: F401

    assert os.environ.get("SPARK_LOCAL_DIRS"), "env pin missing after driver-contract import"

    saved = os.environ.pop("SPARK_LOCAL_DIRS")
    try:
        import __spark_entry__

        importlib.reload(__spark_entry__)
        assert os.environ.get("SPARK_LOCAL_DIRS") == "/dev/shm/spark-local"
    finally:
        os.environ["SPARK_LOCAL_DIRS"] = saved


def test_xml_roundtrip(spark):
    """Spark 4 ships the XML source built-in; same explicit-schema
    roundtrip contract as csv/json."""
    from pandamapreduce_spark.sources import read_xml, write_xml

    orders = _orders(spark)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "orders_xml")
        write_xml(orders, p)
        back = read_xml(spark, p, SCHEMA)
        assert _canon(back) == _canon(orders)
