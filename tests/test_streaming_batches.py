"""Stateful streaming across MULTIPLE micro-batches: the single-file
source runs everything in one batch, which can mask state bugs; here
events are split into 4 time-ordered files streamed one per trigger
(the file source processes in modification-time order), so keys recur
across batches and the state must suppress re-emission.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from pandamapreduce_spark.streaming.stateful import first_event_per_key

from tests.conftest import SF_DIR


def test_stateful_dedup_across_microbatches(spark):
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")  # ts = nanos long here
    qs = raw.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        now = time.time()
        for i in range(4):
            part = raw.where((F.col("ts") > bounds[i]) & (F.col("ts") <= bounds[i + 1]))
            tmp_i = os.path.join(d, f"tmp{i}")
            part.coalesce(1).write.parquet(tmp_i)
            src_file = glob.glob(os.path.join(tmp_i, "part-*.parquet"))[0]
            dst = os.path.join(src, f"events-{i}.parquet")
            shutil.move(src_file, dst)
            # arrival order = time order: the file source sorts by mtime
            os.utime(dst, (now + i * 10, now + i * 10))

        schema = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        out = first_event_per_key(stream)
        name = f"mb_{uuid.uuid4().hex[:8]}"
        q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
            n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()
        got = {(r.user_id, r.event_type): r.event_id for r in spark.table(name).collect()}

    assert n_batches >= 4  # genuinely ran one micro-batch per file

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_type): r.event_id
        for r in raw.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_checkpoint_recovery_exactly_once(spark):
    """Kill a stateful streaming query after the first micro-batches,
    restart from the SAME checkpoint + sink: the recovered state must
    suppress re-emission so the final output equals the batch answer
    exactly (no dupes, no gaps) — the cluster crash-recovery contract.
    """
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    qs = raw.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ckpt = os.path.join(d, "ckpt")
        sink = os.path.join(d, "sink")
        os.makedirs(src)
        now = time.time()
        for i in range(4):
            part = raw.where((F.col("ts") > bounds[i]) & (F.col("ts") <= bounds[i + 1]))
            tmp_i = os.path.join(d, f"tmp{i}")
            part.coalesce(1).write.parquet(tmp_i)
            src_file = glob.glob(os.path.join(tmp_i, "part-*.parquet"))[0]
            dst = os.path.join(src, f"events-{i}.parquet")
            shutil.move(src_file, dst)
            os.utime(dst, (now + i * 10, now + i * 10))

        schema = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"

        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("latestFirst", "false")
                .parquet(src)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            )
            return (
                first_event_per_key(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .start()
            )

        # Phase 1: process at least one micro-batch, then hard-stop.
        q = start()
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.2)
        q.stop()

        # Phase 2: recover from the checkpoint and drain the rest.
        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()

        got = {
            (r.user_id, r.event_type): r.event_id
            for r in spark.read.parquet(sink).collect()
        }
        from pyspark.sql import Window

        w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        expected = {
            (r.user_id, r.event_type): r.event_id
            for r in raw.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
        }
        assert got == expected
