"""Sketch-based approximate aggregation — the mergeable-summary scale
path for distinct counting and quantiles.

At 100 TB exact ``count_distinct`` shuffles every distinct key;
a DataSketches HLL sketch is a fixed ~2^lgK-byte summary that merges
associatively, so per-partition/per-day sketches roll up with NO
re-scan of history — the same pattern the reference's combiner (O6,
``src/PandaLib.cu:302-379``) applies to additive aggregates,
generalized to approximate set cardinality.

These queries are rows-only for the driver (DuckDB's HLL is a
different implementation — estimates can't hash-match); error bounds
are pinned by pytest invariants instead (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.plans.registry import query


@query(
    "q64_sketch_distinct_rollup",
    oracle=None,  # HLL estimates are implementation-specific; error bound pytest-pinned
    doc="Mergeable HLL rollup: per-day user sketches union to a global distinct estimate without re-scanning; exact counts alongside for the error bound.",
    tags=("sketch", "hll", "rollup", "approx"),
)
def q64_sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-user rollup: day-grain HLL sketches
    (``hll_sketch_agg``, lgK=14 → ~0.8% rsd) union via
    ``hll_union_agg`` into the global estimate. The day sketches are
    the materializable artifact: at scale they'd persist per partition
    and any time-range distinct query becomes a union of ~bytes-sized
    summaries. Exact counts computed here only to surface the error."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as long)").alias("est_total_users"),
        F.sum("exact_users").alias("sum_daily_exact"),
    )
    exact_total = ev.agg(F.count_distinct("user_id").alias("exact_total_users"))
    return merged.crossJoin(exact_total).select(
        "n_days", "est_total_users", "exact_total_users", "sum_daily_exact"
    )


@query(
    "q66_approx_quantiles",
    oracle=None,  # approx_percentile's KLL/GK summary is implementation-specific
    doc="Mergeable approximate quantiles (approx_percentile) per group — the 100 TB path where exact percentile_cont would shuffle full values; rank error pytest-pinned.",
    tags=("sketch", "quantile", "approx"),
)
def q66_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95/p99 of value via ``approx_percentile``
    (accuracy 10000 → ≤0.01 rank error). Unlike exact percentiles
    (q28), the summary is fixed-size and merges across partitions —
    one narrow shuffle of summaries, never of raw values."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)").alias("q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p95"),
            F.col("q")[2].alias("p99"),
            "n",
        )
        .orderBy("event_type")
    )
