"""Bucketed tables: co-located joins and aggregations without a
shuffle — the 100 TB answer to repeated joins on the same key.

``bucketBy(n, key)`` writes hive-style bucketed parquet; any later
join or aggregation on the bucket key reads co-partitioned data and
Catalyst elides the Exchange entirely. This is the durable version of
the reference's "partition once, reduce in place" pipeline — its hash
partitioner (``src/panda/Partitioner.cpp:7-19``) decided a transient
shuffle destination; a bucketed table persists that decision into the
storage layout.

At 100 TB: bucket both fact tables by the join key with the same
bucket count at ingest; every subsequent orderkey join across them is
shuffle-free, which is usually the single biggest cost eliminated in
a star-schema pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-bucketed) table in
    the session catalog (spark-warehouse parquet)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucket_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket key. When both were
    written with the same bucket count on ``on``, the physical plan has
    NO Exchange on either side (asserted in tests)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on, how)
