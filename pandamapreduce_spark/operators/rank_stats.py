"""Exact order statistics without per-group buffering.

Spark's ``percentile()`` aggregate collects each group's values into
one executor buffer — fine for bounded groups, an OOM at 100 TB when
a group holds billions of rows. The rank-selection formulation here
computes the SAME exact interpolated percentiles out of a shuffle
SORT: rows get a ``row_number`` per group (sort spills to disk, never
buffers a group in memory), each requested percentile needs only the
two rows at its interpolation ranks, and a partial-aggregatable
groupBy picks them out. One exchange total: the groupBy reuses the
window's hash partitioning on the group key, so Catalyst plans no
second shuffle.

This mirrors how a distributed engine does exact quantiles at scale
(select-by-rank), vs. the mergeable-sketch path (``approx_percentile``
/ ``plans.sketches``) when approximation is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: dict[str, float],
) -> DataFrame:
    """Exact linear-interpolated percentiles (``quantile_cont``
    semantics: position ``k = 1 + p·(n-1)``) per group, as
    ``(group_col, *percentiles.keys())``. Null values are excluded,
    matching the aggregate functions' semantics."""
    w_rank = Window.partitionBy(group_col).orderBy("__v")
    w_group = Window.partitionBy(group_col)
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .select(group_col, F.col(value_col).alias("__v"))
        .select(
            group_col,
            "__v",
            F.row_number().over(w_rank).alias("__rn"),
            F.count(F.lit(1)).over(w_group).alias("__n"),
        )
    )
    aggs, finals = [], []
    for name, p in percentiles.items():
        # 0-based position p·(n-1), kept 0-based until the rank compare:
        # adding 1.0 BEFORE taking the fractional part would round
        # differently and break bitwise parity with quantile_cont.
        pos = F.lit(p) * (F.col("__n") - 1)
        lo_rank, hi_rank = F.floor(pos).cast("long") + 1, F.ceil(pos).cast("long") + 1
        aggs += [
            F.min(F.when(F.col("__rn") == lo_rank, F.col("__v"))).alias(f"__lo_{name}"),
            F.min(F.when(F.col("__rn") == hi_rank, F.col("__v"))).alias(f"__hi_{name}"),
            F.min(pos - F.floor(pos)).alias(f"__frac_{name}"),  # group-constant
        ]
        # lo·(1-frac) + hi·frac, NOT lo + frac·(hi-lo): the two differ
        # in the last ulp and the oracle (DuckDB quantile_cont, same as
        # Spark's percentile()) computes the former.
        frac = F.col(f"__frac_{name}")
        finals.append(
            (F.col(f"__lo_{name}") * (F.lit(1.0) - frac) + F.col(f"__hi_{name}") * frac).alias(name)
        )
    return ranked.groupBy(group_col).agg(*aggs).select(group_col, *finals)
