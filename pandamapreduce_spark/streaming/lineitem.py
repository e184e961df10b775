"""Structured Streaming over the ``lineitem`` shipment feed.

The shipment feed is the streaming analogue of the warehouse fact
scan: in production new lineitem rows land on a queue as items ship
and the SLA monitor (q207) consumes them continuously. Locally the
parquet file drives the stream (file source + ``processAllAvailable``)
— only the ``readStream.format`` line changes on a real deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The SLA lane needs only the join key and the ship time; a subset
#: schema prunes the remaining 9 columns at the parquet scan (the
#: file stream source honors column pruning like the batch reader).
_LINEITEM_SLA_SCHEMA = "l_orderkey bigint, l_shipdate timestamp_ntz"


def lineitem_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of shipment rows (l_orderkey, l_shipdate).

    Mirrors ``events.events_stream``'s staging: the file stream source
    needs a directory and testdata is read-only, so stage a symlink —
    in a lineitem-SPECIFIC stage dir (each stream source reads its
    WHOLE directory, so tables can never share one). l_shipdate is
    naive TIMESTAMP(MICROS) → TIMESTAMP_NTZ, exactly the batch
    reader's type, so date arithmetic agrees with q198 by
    construction (no tz re-anchoring: the lane only ever DIFFERENCES
    two ntz values).
    """
    src = os.path.join(sf_dir, "lineitem.parquet")
    stage = os.path.join(
        "/tmp", "spark_stream_stage", sf_dir.strip("/").replace("/", "_") + "_lineitem"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "lineitem.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return spark.readStream.schema(_LINEITEM_SLA_SCHEMA).parquet(stage)
