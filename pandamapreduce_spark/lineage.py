"""Logical-plan lineage helpers.

``detach`` works around a Spark 4.1 optimizer trap with SELF-cogroups
(`df.groupBy(..).cogroup(df.groupBy(..)).applyInPandas(..)` where both
sides derive from the SAME source relation): when the downstream plan
does not need the cogroup's output columns (``.count()`` is the
canonical trigger — every ledger/oracle path collects and was
unaffected), column pruning strips the RIGHT side's non-grouping
columns, so the Python kernel receives a right-side pdf holding ONLY
the grouping keys. A kernel that indexes by column name raises
KeyError; one that doesn't would silently compute garbage. Reproduced
on pyspark 4.1.2: identical plan is correct under ``collect()`` and
pruned under ``count()``; two sides from independent scans never
trigger it.

The fix is to break attribute-reference sharing between the two sides:
re-aliasing every column (a fresh ``Alias`` → fresh exprIds on one
side) is sufficient and free (a no-op Project). Verified equivalent to
reading the source twice, the other clean variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detach(df: DataFrame) -> DataFrame:
    """Return ``df`` with every output attribute re-aliased (fresh
    exprIds), so using the result as the right side of a cogroup whose
    left side shares ``df``'s lineage never trips the self-cogroup
    column-pruning bug above. Semantically the identity projection."""
    return df.select(*[F.col(c).alias(c) for c in df.columns])
