"""As-of (temporal) join — an operator Spark lacks natively.

Two implementations (per the engine's custom-operator policy: compose
built-ins first, Pandas UDF second):

- ``asof_join``: union + last/first-non-null window — exact, fully
  declarative, one shuffle on (key), scales like any window query.
  This is the default.
- ``asof_join_pandas``: ``cogroup().applyInPandas`` over
  ``pd.merge_asof`` — the Arrow-batched per-key formulation; same
  semantics, used to cross-check and as the template for operators
  whose per-group logic built-ins can't express.

Semantics: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` (``direction="backward"``, the default) or
the smallest ``right_ts >= left_ts`` (``direction="forward"``) within
the same key. Right rows at exactly ``left_ts`` match in both
directions. ``tolerance_micros`` bounds the match distance — a match
further than the tolerance yields NULL right columns (the
``pd.merge_asof(tolerance=...)`` contract). Ties between duplicate
right rows at one timestamp resolve deterministically by the right
value columns (latest-sorted for backward, earliest-sorted for
forward — mirrored in both implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_num(col: F.Column, dtype: T.DataType) -> F.Column:
    """Timestamp-or-numeric ordering column → comparable microseconds."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    return col.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """As-of join via tagged union + last/first-non-null window.

    Scale: one shuffle on ``on`` + one in-partition sort — the same
    cost as any per-key window; no range-bucketing needed because the
    window carries the matched right values across implicitly. The
    tolerance is a post-window null-out on the carried right
    timestamp, so it adds no shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    # The trailing __r_ columns are a deterministic tiebreaker for
    # duplicate (key, right_ts) right rows: without them the partition
    # sort is not total and last()/first() picks an arbitrary
    # duplicate (run-to-run nondeterminism, and divergence from the
    # pandas twin which applies the same value-column ordering).
    carried = ["__rts", *[f"__r_{c}" for c in right_cols]]
    if direction == "backward":
        # right rows sort BEFORE left at equal ts (side 0 < 1) so a
        # same-ts right row is inside [preceding, current]; last()
        # takes the latest-sorted duplicate.
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side", *[F.col(f"__r_{c}") for c in right_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fills = [F.last(c, ignorenulls=True).over(w).alias(f"__f{c}") for c in carried]
    else:
        # right rows sort AFTER left at equal ts (side desc: 1 before
        # 0) so a same-ts right row is inside [current, following];
        # first() takes the earliest-sorted duplicate.
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", F.col("__side").desc(), *[F.col(f"__r_{c}") for c in right_cols])
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fills = [F.first(c, ignorenulls=True).over(w).alias(f"__f{c}") for c in carried]

    unioned = tagged_r.unionByName(tagged_l)
    filled = unioned.select("*", *fills)

    within = F.lit(True)
    if tolerance_micros is not None:
        lnum = _ts_num(F.col("__ts"), left.schema[left_ts].dataType)
        rnum = _ts_num(F.col("__f__rts"), right.schema[right_ts].dataType)
        dist = (lnum - rnum) if direction == "backward" else (rnum - lnum)
        within = dist <= F.lit(int(tolerance_micros))

    out = filled.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[
            F.when(within, F.col(f"__f__r_{c}"))
            .otherwise(F.lit(None))
            .alias(f"{c}{suffix}" if c in lcols else c)
            for c in right_cols
        ],
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
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """As-of join via cogroup + ``pd.merge_asof`` (Arrow path)."""
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    lcols = left.columns
    is_ts = isinstance(left.schema[left_ts].dataType, (T.TimestampType, T.TimestampNTZType))
    out_fields = []
    for c in lcols:
        out_fields.append(f"{c} {left.schema[c].dataType.simpleString()}")
    for c in right_cols:
        name = f"{c}{suffix}" if c in lcols else c
        out_fields.append(f"{name} {right.schema[c].dataType.simpleString()}")
    schema = ", ".join(out_fields)

    tol = None
    if tolerance_micros is not None:
        tol = pd.Timedelta(microseconds=tolerance_micros) if is_ts else tolerance_micros

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
        # (last-sorted for backward, first-sorted for forward)
        rpdf = rpdf[[right_ts, *[c for c in right_cols if c != right_ts]]].sort_values(
            [right_ts, *[c for c in right_cols if c != right_ts]], kind="mergesort"
        )
        merged = pd.merge_asof(
            lpdf,
            rpdf.rename(columns=rename),
            left_on=left_ts,
            right_on=rename.get(right_ts, right_ts),
            direction=direction,
            tolerance=tol,
        )
        return merged[[*lcols, *[rename[c] for c in right_cols]]]

    from pandamapreduce_spark.lineage import detach

    # detach: defensive — if a caller as-of joins a frame against a
    # derivative of itself, shared attribute refs would let column
    # pruning strip the right side's payload (lineage.detach).
    return (
        left.groupBy(on)
        .cogroup(detach(right).groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema)
    )
