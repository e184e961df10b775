"""Bucketed-table co-located joins: the shuffle must disappear."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pandamapreduce_spark.operators.bucketing import cobucket_join, write_bucketed

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "orders_b", "o_orderkey", num_buckets=8)
    write_bucketed(li, "lineitem_b", "o_orderkey", num_buckets=8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucket_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # test tables are tiny, so broadcast would win and mask the bucketed
    # path; at scale the broadcast threshold rules itself out.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucket_join(spark, lt, rt, "o_orderkey")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_cobucket_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = cobucket_join(spark, lt, rt, "o_orderkey")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert joined.count() == expected


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
