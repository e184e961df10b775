"""Broadcast-threshold sensitivity (VERDICT r4 #5): q103/q121/q116
lean on AQE choosing broadcast for their bounded small sides. At
100 TB the "small" side can outgrow the 64 MB threshold, and the
planner falls back to a shuffle join — results and the bounded-state
properties must survive that fallback, not depend on the broadcast.

Mechanics: spark.sql.autoBroadcastJoinThreshold (static planning) and
spark.sql.adaptive.autoBroadcastJoinThreshold (AQE runtime
conversion) are both runtime-settable; -1 disables every
broadcast-hash conversion EXCEPT explicit broadcast() hints — which
is exactly the point: hinted broadcasts (bounded-by-construction
sides like q121's one-row bitmap) survive, size-inferred ones must
degrade gracefully.
"""

from __future__ import annotations

import pytest

from pandamapreduce_spark.plans import REGISTRY

from tests.conftest import SF_DIR

QUERIES = [
    "q103_dedup_keep_best",
    "q121_bloom_prune_join",
    "q116_incremental_neardup",
    # round-5 join-heavy lanes
    "q131_copurchase",
    "q136_triangle_count",
    "q137_interval_join",
]

# queries whose ONLY permitted nested loop is nothing at all — q131/
# q136 attach bounded 1-row aggregates via explicit broadcast()
# crossJoins (documented BNLJ shape), so they are excluded here
NO_NLJ_QUERIES = [
    "q103_dedup_keep_best",
    "q121_bloom_prune_join",
    "q116_incremental_neardup",
    "q137_interval_join",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def no_auto_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    for k in keys:
        spark.conf.set(k, "-1")
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", QUERIES)
def test_results_survive_shuffle_join_fallback(spark, no_auto_broadcast, name):
    """Same rows with every size-inferred broadcast disabled. The
    baseline run executes FIRST under default conf (the fixture only
    flips conf around the second build), so this compares
    broadcast-planned vs shuffle-planned executions of one logical
    plan."""
    q = REGISTRY[name]
    # Fixture already set -1; flip back for the baseline, then restore.
    no_auto_broadcast.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    no_auto_broadcast.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    want = _rows(q.build(spark, SF_DIR))
    no_auto_broadcast.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    no_auto_broadcast.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    got = _rows(q.build(spark, SF_DIR))
    assert got == want, f"{name}: shuffle-join fallback changed the result"


@pytest.mark.parametrize("name", NO_NLJ_QUERIES)
def test_fallback_plan_has_no_nested_loop(spark, no_auto_broadcast, name):
    """Disabling broadcast must degrade to a sort-merge/shuffle-hash
    EQUI-join, never to a BroadcastNestedLoopJoin / cartesian (the
    catastrophic fallback shape): every join in these pipelines keys
    on concrete equi-columns, and q121's bitmap probe is a literal
    filter, not a join, so no plan may contain a nested loop."""
    q = REGISTRY[name]
    plan = q.build(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} fell back to a nested loop:\n{plan[:2000]}"
    assert "CartesianProduct" not in plan, f"{name} fell back to a cartesian:\n{plan[:2000]}"
