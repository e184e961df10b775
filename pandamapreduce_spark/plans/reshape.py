"""Relational reshaping: unpivot (wide → long) — the inverse of q36's
pivot. Reference parity: the reference has no relational surface at
all (SURVEY §2.3 marks the whole category a Spark-free gap row); this
completes the pivot/unpivot pair the engine's DataFrame surface
exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.plans.numeric import dsum_sql, dsum
from pandamapreduce_spark.plans.registry import query

_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "q95_unpivot",
    oracle=f"""
    WITH long AS (
      SELECT l_returnflag, metric, val FROM (
        {" UNION ALL ".join(
            f"SELECT l_returnflag, '{m}' AS metric, {m} AS val FROM lineitem"
            for m in _MEASURES
        )}
      )
    )
    SELECT l_returnflag, metric,
           cast(count(*) as bigint) AS n,
           {dsum_sql("val", 2)} AS total
    FROM long
    GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """,
    doc="Unpivot (wide → long): lineitem measures melted to (metric, val) rows, then aggregated per flag × metric.",
    tags=("relational", "reshape"),
)
def q95_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the four lineitem measure columns into (metric, val) rows
    with ``DataFrame.unpivot`` (Catalyst ``Expand`` — one row in, four
    out, no Python, no join), then aggregate per (returnflag, metric).

    Scale: Expand multiplies rows map-side BEFORE the shuffle, but the
    aggregation is partial — each task pre-aggregates its 4× rows down
    to |flags × metrics| partials, so shuffle volume is the tiny group
    count, not 4× the fact table. The wide scan reads only the 5
    referenced columns (column pruning applies through Expand).
    """
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=list(_MEASURES),
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(F.count(F.lit(1)).alias("n"), dsum("val", 2).alias("total"))
        .orderBy("l_returnflag", "metric")
    )
