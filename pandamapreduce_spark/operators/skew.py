"""Skew-resistant join: salt replication for hot keys.

AQE's skew-join splitting handles moderate skew automatically
(enabled in ``session.py``); this operator is the explicit fallback
for pathological key distributions (one key = 30% of a 100 TB fact
table): the probe side spreads each hot key over ``n_salts`` shuffle
partitions, the build side replicates each row ``n_salts`` times, and
the join key becomes (key, salt). Correctness is unchanged — each
probe row meets exactly one replica of every matching build row.

Cost model: build-side bytes × n_salts extra shuffle volume buys
probe-side parallelism × n_salts on the hot key. Use only when the
build side is small relative to the hot key's row count (the usual
shape: huge skewed fact ⋈ modest dimension that just misses the
broadcast threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with the probe side salted
    and the build side replicated. Column set of the result matches a
    plain ``probe.join(build, on, how)``.

    ``how`` is restricted to probe-preserving joins: under right/full
    outer, each unmatched build row would surface once per replica
    (n_salts duplicate null-probe rows).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports probe-preserving joins only ({sorted(allowed)}); "
            f"how={how!r} would duplicate unmatched build rows n_salts times"
        )
    # The salt must be row-dependent (NOT key-derived — that would give
    # every row of the hot key the same salt and spread nothing) AND
    # deterministic under task retry: a recomputed partition must route
    # every row to the same shuffle bucket (SPARK-23207), so hash the
    # full row rather than using monotonically_increasing_id.
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts)).cast("int")
    )
    replicas = build.withColumn("__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)])))
    out = salted_probe.join(replicas, [on, "__salt"], how)
    return out.drop("__salt")
