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
    plain ``probe.join(build, on, how)``."""
    # the salt must be row-dependent (NOT key-derived — that would give
    # every row of the hot key the same salt and spread nothing)
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicas = build.withColumn("__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)])))
    out = salted_probe.join(replicas, [on, "__salt"], how)
    return out.drop("__salt")
