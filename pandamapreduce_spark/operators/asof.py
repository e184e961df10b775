"""As-of (temporal) join — an operator Spark lacks natively.

Two implementations (per the engine's custom-operator policy: compose
built-ins first, Pandas UDF second):

- ``asof_join``: union + last-non-null window — exact, fully
  declarative, one shuffle on (key), scales like any window query.
  This is the default.
- ``asof_join_pandas``: ``cogroup().applyInPandas`` over
  ``pd.merge_asof`` — the Arrow-batched per-key formulation; same
  semantics, used to cross-check and as the template for operators
  whose per-group logic built-ins can't express.

Semantics: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key (backward as-of). Right
rows at exactly left_ts match (ties between right rows resolve to the
latest-sorted one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join via tagged union + last-non-null window.

    Scale: one shuffle on ``on`` + one in-partition sort — the same
    cost as any per-key window; no range-bucketing needed because the
    window carries the latest right values forward implicitly.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    # Right rows sort before left rows at equal ts → ties match. The
    # trailing __r_ columns are a deterministic tiebreaker for
    # duplicate (key, right_ts) right rows: without them the partition
    # sort is not total and last() picks an arbitrary duplicate
    # (run-to-run nondeterminism, and divergence from the pandas twin
    # which applies the same value-column ordering below).
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", *[F.col(f"__r_{c}") for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_r.unionByName(tagged_l)
    filled = unioned.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in right_cols],
    )
    out = filled.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}" if c in lcols else c) for c in right_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join via cogroup + ``pd.merge_asof`` (Arrow path)."""
    import pandas as pd

    lcols = left.columns
    out_fields = []
    for c in lcols:
        out_fields.append(f"{c} {left.schema[c].dataType.simpleString()}")
    for c in right_cols:
        name = f"{c}{suffix}" if c in lcols else c
        out_fields.append(f"{name} {right.schema[c].dataType.simpleString()}")
    schema = ", ".join(out_fields)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rename = {c: (f"{c}{suffix}" if c in lcols else c) for c in right_cols}
        if rpdf.empty:
            res = lpdf.copy()
            for c in right_cols:
                res[rename[c]] = None
            return res[[*lcols, *[rename[c] for c in right_cols]]]
        # sort by (ts, value columns) so duplicate-ts right rows resolve
        # to the same winner as the window implementation's tiebreaker
        rpdf = rpdf[[right_ts, *[c for c in right_cols if c != right_ts]]].sort_values(
            [right_ts, *[c for c in right_cols if c != right_ts]], kind="mergesort"
        )
        merged = pd.merge_asof(
            lpdf, rpdf.rename(columns=rename), left_on=left_ts, right_on=rename.get(right_ts, right_ts), direction="backward"
        )
        return merged[[*lcols, *[rename[c] for c in right_cols]]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema)
    )
