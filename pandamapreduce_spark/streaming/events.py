"""Structured Streaming over the ``events`` table.

Batch/stream parity is the design invariant: each streaming query here
has a batch twin in ``plans.relational`` (q17 hourly agg, q12
sessionization) and the oracle-checked query runs the STREAM to
completion and compares against the BATCH SQL — proving the watermark/
window semantics match.

Locally the parquet file drives the stream (file source +
``processAllAvailable``); in production the same plan reads Kafka —
only the ``readStream.format`` line changes.

Scale: streaming state (window × type, or session per user) lives in
the state store keyed by group; watermarks bound it. The hourly agg
holds ≤ #types × #open-windows entries; sessions close 30 min + delay
after the last event.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandamapreduce_spark.plans.numeric import DEC
from pandamapreduce_spark.streaming.staging import stage_stream_dir

# The driver has shipped events.ts as TIMESTAMP(NANOS) (readable only
# as a nanos-long, see session.py nanosAsLong) and as naive
# TIMESTAMP(MICROS); the stream source needs an explicit schema, so
# sniff the file's physical type once at plan-build time (driver-side
# metadata read, no data IO) and declare the matching schema.
_EVENTS_SCHEMA_NANOS = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
_EVENTS_SCHEMA_MICROS = "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double, props string"


def _ts_is_nanos(path: str) -> bool:
    import os as _os

    import pyarrow.dataset as ds

    # pyarrow.dataset resolves the unified schema for a single file OR
    # a partitioned dataset directory (pq.read_schema rejects dirs).
    fmt = "parquet"
    if _os.path.isdir(path):
        ts_type = ds.dataset(path, format=fmt).schema.field("ts").type
    else:
        ts_type = ds.dataset([path], format=fmt).schema.field("ts").type
    return getattr(ts_type, "unit", None) == "ns"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = os.path.join(sf_dir, "events.parquet")
    stage = stage_stream_dir(sf_dir, "events")
    if _ts_is_nanos(src):
        raw = spark.readStream.schema(_EVENTS_SCHEMA_NANOS).parquet(stage)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = spark.readStream.schema(_EVENTS_SCHEMA_MICROS).parquet(stage)
    # naive wall clock == UTC instant, independent of session timezone
    # (same normalization as catalog.load_table: cast reads the naive
    # value in the session tz, from_utc re-anchors it to UTC — identity
    # under a UTC session).
    return raw.withColumn("ts", F.from_utc_timestamp(F.col("ts").cast("timestamp"), F.expr("current_timezone()")))


def hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with a 2-hour watermark."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n", "total_value")
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes with a 2-hour watermark:
    each event lands in exactly two overlapping windows."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (streaming twin of q12_sessionize)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sess.start").alias("session_start"), "n_events")
    )


# State-store partition count for the local harness's streaming runs.
# A stateful query creates (shuffle partitions) state-store instances
# per stateful operator — each with per-microbatch snapshot/commit
# work — and the count is FIXED into the checkpoint at query start.
# At fixture scale, 64 instances are pure overhead: measured at sf0.1,
# 8 instead of 64 takes q69 35→14 s, q68 14→3 s, q60 3.4→1.2 s with
# identical results (state partitioning is semantics-free). On a real
# cluster this is sized to executors × cores for the expected key
# cardinality — it is a deployment knob, not plan shape.
STREAM_STATE_PARTITIONS = 8


def run_to_completion(
    agg: DataFrame,
    spark: SparkSession,
    mode: str = "complete",
    state_partitions: int | None = STREAM_STATE_PARTITIONS,
) -> DataFrame:
    """Drive a streaming aggregation over the (finite) file source to
    completion via the memory sink; returns the final static result.

    The handover from the ephemeral memory-sink table to the returned
    DataFrame is a distributed parquet write + re-read (tmpfs-backed
    where available) — never ``toPandas``, which would drag the whole
    sink through the driver at large aggregate cardinality.

    ``state_partitions`` overrides shuffle partitions for the stream's
    lifetime (see ``STREAM_STATE_PARTITIONS``); the previous value is
    restored before the batch-side handover read.
    """
    import tempfile

    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
            # Materialize (executor-side) before the in-memory sink
            # table goes away with the stopped query. The tmpfs subdir
            # only exists when session bootstrap took the /dev/shm
            # branch (SPARK_LOCAL_DIRS may point elsewhere, e.g. the
            # disk-bench script) — create it rather than assume it,
            # and fall back to the system tmpdir if tmpfs is denied.
            root = "/dev/shm/spark-local" if os.access("/dev/shm", os.W_OK) else None
            if root is not None:
                try:
                    os.makedirs(root, exist_ok=True)
                except OSError:
                    root = None
            out_dir = tempfile.mkdtemp(prefix=f"{name}_", dir=root)
            # tmpfs is RAM: reclaim the handover dir at interpreter
            # exit (the returned DataFrame reads it lazily, so it must
            # outlive this call — atexit is the earliest safe point).
            import atexit
            import shutil

            atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
            spark.table(name).write.mode("overwrite").parquet(out_dir)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.read.parquet(out_dir)
