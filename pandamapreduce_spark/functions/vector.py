"""Vector column functions over ``array<float>`` embedding columns.

All arithmetic is double-precision, sequential left-to-right fold —
the same evaluation order DuckDB's list functions use — so cosine /
dot values are bitwise-reproducible against the oracle.

JVM-side only (``zip_with`` + ``aggregate``): no Python crosses the
per-row path, and the expressions participate in codegen. For very
wide vectors a Pandas-UDF BLAS path could win; at 64-dim the JVM
expression is faster than the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(cast({a} as double[]), cast({b} as double[]))"


def l2norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = dot(a, b)
    na, nb = l2norm(a), l2norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_sql(a: str, b: str) -> str:
    da = f"sqrt(list_dot_product(cast({a} as double[]), cast({a} as double[])))"
    db = f"sqrt(list_dot_product(cast({b} as double[]), cast({b} as double[])))"
    return (
        f"CASE WHEN {da} > 0 AND {db} > 0 "
        f"THEN list_dot_product(cast({a} as double[]), cast({b} as double[])) / ({da} * {db}) "
        f"ELSE 0.0 END"
    )
