"""Scoped-cache discipline: plans that persist a shuffled intermediate
(q90/q94/q96 distributed-prefix-sum / iterative CC) must not pin RDD
storage beyond their query's lifetime — the registry dispatcher
releases the previous query's scoped caches before building the next.
"""

from __future__ import annotations

from pandamapreduce_spark.caching import release_caches
from pandamapreduce_spark.plans import REGISTRY

from tests.conftest import SF_DIR


def _cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_scoped_caches_released_on_next_dispatch(spark):
    release_caches()
    base = _cached_rdds(spark)

    # q90 persists its range-partitioned prefix-sum intermediate and
    # the cache must survive the query's own action...
    REGISTRY["q90_sequence_packing"].build(spark, SF_DIR).count()
    assert _cached_rdds(spark) > base

    # ...but dispatching ANY next registry query releases it.
    REGISTRY["q01_pricing_summary"].build(spark, SF_DIR).count()
    assert _cached_rdds(spark) == base


def test_release_caches_after_iterative_query(spark):
    release_caches()
    base = _cached_rdds(spark)
    REGISTRY["q94_dedup_clusters"].build(spark, SF_DIR).count()
    release_caches()
    assert _cached_rdds(spark) == base

    REGISTRY["q96_vocab_build"].build(spark, SF_DIR).count()
    release_caches()
    assert _cached_rdds(spark) == base
