"""Stateful streaming across MULTIPLE micro-batches: the single-file
source runs everything in one batch, which can mask state bugs; here
events are split into 4 time-ordered files streamed one per trigger
(the file source processes in modification-time order), so keys recur
across batches and the state must suppress re-emission.

The events fixture has shipped ``ts`` both as TIMESTAMP(NANOS) (nanos
long) and naive TIMESTAMP(MICROS) across driver rounds; these tests
route every read through ``catalog.load_table``, which normalizes
either encoding to TIMESTAMP — the split files are then written (and
stream-read) in the normalized form, so the tests are fixture-encoding
agnostic. ``test_events_ts_normalized`` is the schema-drift guard.
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
from pyspark.sql import types as T

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.streaming.stateful import first_event_per_key

from tests.conftest import SF_DIR

#: normalized split-file schema (what load_table emits, written back out)
_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def _split_events_by_time(raw, d: str) -> str:
    """Write 4 time-quartile split files of the normalized events table
    into ``d``/src with ascending mtimes (arrival order = time order:
    the file source sorts by mtime). Returns the src dir."""
    qs = raw.select(F.unix_micros("ts").alias("us")).approxQuantile("us", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    src = os.path.join(d, "src")
    os.makedirs(src)
    now = time.time()
    us = F.unix_micros("ts")
    for i in range(4):
        part = raw.where((us > bounds[i]) & (us <= bounds[i + 1]))
        tmp_i = os.path.join(d, f"tmp{i}")
        part.coalesce(1).write.parquet(tmp_i)
        src_file = glob.glob(os.path.join(tmp_i, "part-*.parquet"))[0]
        dst = os.path.join(src, f"events-{i}.parquet")
        shutil.move(src_file, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return src


def test_events_ts_normalized(spark):
    """Schema-drift guard: whichever encoding the fixture ships
    (nanos-long or naive micros), load_table must yield TIMESTAMP —
    and both historical encodings must normalize to the same instants
    (synthetic twin files, value-checked)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    raw = load_table(spark, SF_DIR, "events")
    assert isinstance(raw.schema["ts"].dataType, T.TimestampType)

    micros = [1_600_000_000_000_000, 1_600_000_123_456_789]
    with tempfile.TemporaryDirectory() as d:
        for sub, typ, vals in (
            ("nanos", pa.timestamp("ns"), [m * 1000 for m in micros]),
            ("ntz", pa.timestamp("us"), micros),
        ):
            os.makedirs(os.path.join(d, sub))
            tbl = pa.table({"ts": pa.array(vals, typ)})
            pq.write_table(tbl, os.path.join(d, sub, "events.parquet"))
        got = {
            sub: sorted(
                r[0]
                for r in load_table(spark, os.path.join(d, sub), "events")
                .select(F.unix_micros("ts"))
                .collect()
            )
            for sub in ("nanos", "ntz")
        }
    # nanos beyond micro precision truncate toward zero on both paths
    assert got["nanos"] == got["ntz"] == sorted(m // 1 for m in micros)


def test_stateful_dedup_across_microbatches(spark):
    raw = load_table(spark, SF_DIR, "events")
    with tempfile.TemporaryDirectory() as d:
        src = _split_events_by_time(raw, d)
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
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
    raw = load_table(spark, SF_DIR, "events")
    with tempfile.TemporaryDirectory() as d:
        src = _split_events_by_time(raw, d)
        ckpt = os.path.join(d, "ckpt")
        sink = os.path.join(d, "sink")

        def start():
            stream = (
                spark.readStream.schema(_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .option("latestFirst", "false")
                .parquet(src)
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
        w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        expected = {
            (r.user_id, r.event_type): r.event_id
            for r in raw.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
        }
        assert got == expected


def test_rocksdb_state_store_parity(spark):
    """The production state-store backend: RocksDB (bundled
    rocksdbjni) keeps streaming state off-heap and spillable — the
    backend a real deployment uses when state outgrows executor
    memory. The windowed aggregation must produce EXACTLY the default
    (HDFSBackedStateStore) answer; provider choice is durability
    plumbing, never semantics."""
    from pandamapreduce_spark.streaming import events as ev

    saved = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        stream = ev.events_stream(spark, SF_DIR)
        got = ev.run_to_completion(ev.hourly_agg(stream), spark).collect()
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
    want = ev.run_to_completion(ev.hourly_agg(ev.events_stream(spark, SF_DIR)), spark).collect()
    canon = lambda rows: sorted((r.hour, r.event_type, r.n, r.total_value) for r in rows)  # noqa: E731
    assert canon(got) == canon(want)
    assert len(got) > 0


def test_stream_cdc_tombstones_drop_exactly_latest_error_users(spark):
    """q157: the materialized state must contain exactly the users
    whose LATEST (ts, event_id) event is not the tombstone type, and
    both populations (kept / tombstoned) must be non-empty on the
    fixture — a vacuous tombstone filter would prove nothing."""
    import duckdb

    from pandamapreduce_spark.plans import REGISTRY
    from pandamapreduce_spark.plans.streaming_plans import CDC_TOMBSTONE_TYPE
    from tests.conftest import SF_DIR

    latest = dict(
        duckdb.sql(
            "SELECT user_id, event_type FROM ("
            "  SELECT user_id, event_type, row_number() OVER ("
            "    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn"
            f"  FROM read_parquet('{SF_DIR}/events.parquet')"
            ") WHERE rn = 1"
        ).fetchall()
    )
    keep = {u for u, t in latest.items() if t != CDC_TOMBSTONE_TYPE}
    dropped = set(latest) - keep
    assert keep and dropped, "tombstone population is vacuous on this fixture"
    rows = REGISTRY["q157_stream_cdc"].build(spark, SF_DIR).collect()
    assert {r.user_id for r in rows} == keep
    for r in rows:
        assert r.last_type == latest[r.user_id]
        assert r.last_type != CDC_TOMBSTONE_TYPE


def test_stream_abandonment_parity_on_both_state_store_backends(spark):
    """q205 must reproduce q199's batch abandonment report EXACTLY
    under BOTH state-store providers (HDFS-backed default and the
    production RocksDB backend) — the session-window state machine's
    answer cannot depend on durability plumbing (VERDICT r7 #6)."""
    from pandamapreduce_spark.plans import REGISTRY

    canon = lambda rows: sorted(  # noqa: E731
        (r.start_hour, r.n_click_sessions, r.n_abandoned, r.abandonment_rate) for r in rows
    )
    batch = canon(REGISTRY["q199_abandonment"].build(spark, SF_DIR).collect())
    assert batch, "batch abandonment report is empty on this fixture"
    saved = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    for provider in (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ):
        try:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
            got = canon(REGISTRY["q205_stream_abandonment"].build(spark, SF_DIR).collect())
        finally:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
        assert got == batch, provider


def test_stream_ship_sla_parity_on_both_state_store_backends(spark):
    """q207 must reproduce q198's batch SLA report EXACTLY under BOTH
    state-store providers (HDFS-backed default and the production
    RocksDB backend) — the complete-mode histogram state's answer
    cannot depend on durability plumbing (VERDICT r8 #7)."""
    from pandamapreduce_spark.plans import REGISTRY

    canon = lambda rows: sorted(  # noqa: E731
        (r.priority, r.n_lineitems, r.p50_days, r.p90_days, r.p99_days, r.within_7d)
        for r in rows
    )
    batch = canon(REGISTRY["q198_ship_sla"].build(spark, SF_DIR).collect())
    assert batch, "batch SLA report is empty on this fixture"
    saved = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    for provider in (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ):
        try:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
            got = canon(REGISTRY["q207_stream_ship_sla"].build(spark, SF_DIR).collect())
        finally:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
        assert got == batch, provider


def test_stage_stream_dir_repoints_dangling_and_wrong_target(tmp_path):
    """A dangling staged symlink passes ``not exists`` but still blocks
    ``os.symlink`` (FileExistsError) — the staging helper must re-point
    it instead of crashing every stream build until the stage dir is
    hand-deleted; same for a link left behind by a RELOCATED fixture."""
    from pandamapreduce_spark.streaming.staging import stage_stream_dir

    sf_a = tmp_path / "a" / "sf9"
    sf_b = tmp_path / "b" / "sf9"
    for d in (sf_a, sf_b):
        os.makedirs(d)
        (d / "events.parquet").write_bytes(b"PAR1")

    stage = stage_stream_dir(str(sf_a), "events")
    link = os.path.join(stage, "events.parquet")
    assert os.path.realpath(link) == os.path.realpath(str(sf_a / "events.parquet"))

    # fixture deleted -> dangling link -> next build must re-point, not raise
    shutil.rmtree(sf_a)
    os.makedirs(sf_a)
    (sf_a / "events.parquet").write_bytes(b"PAR1")
    assert stage_stream_dir(str(sf_a), "events") == stage
    assert os.path.realpath(link) == os.path.realpath(str(sf_a / "events.parquet"))

    # link left pointing at a path that no longer exists ANYWHERE
    # (fixture regenerated under a new mount): lexists-true,
    # exists-false — the exact FileExistsError trap
    os.unlink(link)
    os.symlink(str(tmp_path / "gone" / "events.parquet"), link)
    assert not os.path.exists(link) and os.path.lexists(link)
    assert stage_stream_dir(str(sf_a), "events") == stage
    assert os.path.realpath(link) == os.path.realpath(str(sf_a / "events.parquet"))

    # different sf_dir -> its own stage dir, never shared
    stage_b = stage_stream_dir(str(sf_b), "events")
    assert stage_b != stage
    # same stage dir, different table -> also its own dir
    (sf_b / "lineitem.parquet").write_bytes(b"PAR1")
    assert stage_stream_dir(str(sf_b), "lineitem") != stage_b
