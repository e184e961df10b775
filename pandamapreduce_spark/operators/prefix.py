"""Distributed exact global prefix (rank / running sum) machinery.

The engine's answer to "cumulative anything over a total order" at
100 TB: a naive global window (``Window.orderBy`` with no partition)
is a SINGLE-PARTITION sort — one task sees every row. Instead:

1. range-partition the rows on the full total-order key (one
   exchange, parallel per-range sorts, spill-capable);
2. per range, compute local ``row_number`` / running sums in parallel;
3. collect ONE bounded row per range (count, optional sum, and the
   range's head key — the min of the FULL key, so ranges that split
   inside one value still order correctly);
4. prefix those on the driver and BROADCAST-join the
   one-row-per-range base offsets back (flat plan — VERDICT r7
   retired the chained 64-deep ``F.when`` form).

Shared by q100 (deciles), q163 (quantile normalize), q177 (RFM
ntiles), q189 (ABC cumulative revenue), q202 (Gini ranks). The
reference has no global-order operator — its sorts end at the
per-reducer level (``src/panda/PandaMapReduceJob.cpp:885-955``); this
is the scale-out generalization Spark needs for exact global ranks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandamapreduce_spark.caching import scoped_persist

#: default range partitions for the global exchange; on a real cluster
#: this is sized to executors x cores (a deployment knob, not plan
#: shape — results are invariant to the boundaries, pytest-pinned).
PREFIX_RANGES = 64


def range_prefix(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    sum_col: str | None = None,
    ranges: int = PREFIX_RANGES,
) -> tuple[DataFrame, int, int | None]:
    """Annotate ``df`` with exact global prefix offsets.

    ``order_cols`` is the FULL total-order key (ascending; callers
    encode descending parts by negation, e.g. q189's ``neg``). Returns
    ``(parts, n_total, sum_total)`` where ``parts`` carries:

    - ``_pid``   — the range id (window partition key for callers);
    - ``_base``  — bigint count of all rows in earlier ranges, so
      ``row_number() over (partition by _pid order by *order_cols)
      + _base`` is the exact global rank;
    - ``_base_sum`` — when ``sum_col`` is given, the exact bigint sum
      of ``sum_col`` over all earlier ranges, so a per-range running
      sum plus ``_base_sum`` is the exact global prefix sum.

    ``parts`` is scoped-persisted: the ``_pid`` assignment seen by the
    bounded collect and by the returned plan is the same physical
    partitioning (released at the next dispatch, per caching.py).
    """
    parts = scoped_persist(
        df.repartitionByRange(ranges, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    head = F.min(
        F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)])
    ).alias("head")
    aggs = [F.count(F.lit(1)).alias("n"), head]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("s"))
    per = sorted(
        parts.groupBy("_pid").agg(*aggs).collect(),
        key=lambda r: tuple(r["head"][f"k{i}"] for i in range(len(order_cols))),
    )
    offs: list[tuple[int, int, int]] = []
    acc_n = 0
    acc_s = 0
    for r in per:
        offs.append((int(r["_pid"]), acc_n, acc_s))
        acc_n += int(r["n"])
        if sum_col is not None:
            acc_s += int(r["s"])
    off_df = df.sparkSession.createDataFrame(
        offs, "_pid int, _base bigint, _base_sum bigint"
    )
    out = parts.join(F.broadcast(off_df), "_pid")
    return out, acc_n, (acc_s if sum_col is not None else None)
