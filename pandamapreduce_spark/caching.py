"""Query-scoped cache tracking.

A few plans persist a shuffled intermediate because the SAME pid
assignment must be seen by both a bounded driver collect and the
returned DataFrame (the distributed-prefix-sum pattern in q90/q96) or
by an iterative loop (q94). A bare ``.persist()`` leaks: the returned
DataFrame is lazy, so there is no in-plan point where the cache can be
dropped, and Spark never auto-unpersists.

``scoped_persist`` registers the handle; ``release_caches`` drops every
registered cache. The registry dispatcher calls ``release_caches()``
before building each query, so in any session that runs queries through
the registry (driver, bench, tests) a query's caches live exactly until
the NEXT query starts — callers that need the result longer should
materialize it first (the driver's collect does). ``release_caches`` is
also safe to call directly after materializing a result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for the next ``release_caches``."""
    df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every scoped cache (non-blocking); returns the count."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
