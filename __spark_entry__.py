"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's central query registry
(``pandamapreduce_spark.plans.REGISTRY``): every implemented operator
from SURVEY §2 is registered there once with its Spark builder and its
DuckDB oracle SQL; this module re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandamapreduce_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = q01_pricing_summary: exercises scan → filter → partial
    agg → shuffle → final agg → sort, the full reference pipeline shape
    (SURVEY §3.1) in one declarative plan.
    """
    return REGISTRY["q01_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; non-SQL ops
    (tera pipeline, Arrow-batched codecs) are omitted → rows-only check.
    """
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
