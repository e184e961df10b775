"""Structured Streaming over the ``documents`` table.

The documents parquet has no event-time column, so the stream derives
a DETERMINISTIC one — ``ts = 2024-01-01T00:00:00Z + doc_id minutes`` —
which the DuckDB oracle reproduces exactly. In production the arrival
timestamp comes from the feed (Kafka ingestion time / crawl time);
only this one ``withColumn`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

#: 2024-01-01 00:00:00 UTC
BASE_EPOCH = 1_704_067_200


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over documents.parquet with a deterministic
    per-document event time (see module docstring)."""
    src = os.path.join(sf_dir, "documents.parquet")
    stage = os.path.join("/tmp", "spark_stream_stage_docs", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    raw = spark.readStream.schema(DOCS_SCHEMA).parquet(stage)
    return raw.withColumn("ts", F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("doc_id") * 60))
