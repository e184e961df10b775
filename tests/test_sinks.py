"""Dataset parquet sink: partitioned layout + partition pruning."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pandamapreduce_spark.engine import Engine

from tests.conftest import SF_DIR


def test_write_parquet_partitioned_prunes(spark):
    e = Engine(spark)
    orders = e.table(SF_DIR, "orders")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "orders_by_status")
        orders.write_parquet(out, partition_by=["o_orderstatus"])
        assert sorted(p for p in os.listdir(out) if p.startswith("o_orderstatus=")) == [
            "o_orderstatus=F",
            "o_orderstatus=O",
            "o_orderstatus=P",
        ]
        back = e.read_parquet(out)
        q = back.where(F.col("o_orderstatus") == "F").df
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        # pruned at planning: only the matching partition directory read
        assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
        assert q.count() == orders.where(F.col("o_orderstatus") == "F").count()
