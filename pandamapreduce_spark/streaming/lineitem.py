"""Structured Streaming over the ``lineitem`` shipment feed.

The shipment feed is the streaming analogue of the warehouse fact
scan: in production new lineitem rows land on a queue as items ship
and the SLA monitor (q207) consumes them continuously. Locally the
parquet file drives the stream (file source + ``processAllAvailable``)
— only the ``readStream.format`` line changes on a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandamapreduce_spark.streaming.staging import stage_stream_dir

#: The SLA lane needs only the join key and the ship time; a subset
#: schema prunes the remaining 9 columns at the parquet scan (the
#: file stream source honors column pruning like the batch reader).
_LINEITEM_SLA_SCHEMA = "l_orderkey bigint, l_shipdate timestamp_ntz"


def lineitem_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of shipment rows (l_orderkey, l_shipdate).

    Staging via the shared ``stage_stream_dir`` (table-specific dir,
    dangling-link re-point). l_shipdate is naive TIMESTAMP(MICROS) →
    TIMESTAMP_NTZ, exactly the batch reader's type, so date arithmetic
    agrees with q198 by construction (no tz re-anchoring: the lane
    only ever DIFFERENCES two ntz values).
    """
    stage = stage_stream_dir(sf_dir, "lineitem")
    return spark.readStream.schema(_LINEITEM_SLA_SCHEMA).parquet(stage)
