"""Error-bound invariants for the sketch queries (q64/q66). Their
driver oracles are exact SQL, valid only in the sketches' exactness
regimes (HLL sparse mode; GK uncompressed) — the estimation-mode
accuracy contract at real cardinality is pinned here instead."""

from __future__ import annotations

from pandamapreduce_spark.plans import REGISTRY

from tests.conftest import SF_DIR


def test_hll_rollup_error_bound(spark):
    """lgK=14 HLL → rsd ≈ 0.8%; assert the merged estimate is within
    3% of exact (wide margin over the theoretical bound)."""
    row = REGISTRY["q64_sketch_distinct_rollup"].build(spark, SF_DIR).collect()[0]
    exact = row["exact_total_users"]
    assert exact > 0
    assert abs(row["est_total_users"] - exact) <= max(2, 0.03 * exact), row
    # union-of-days covers the same users: daily sum >= total distinct
    assert row["sum_daily_exact"] >= exact


def test_approx_quantiles_rank_error(spark):
    """approx_percentile(accuracy=10000) → rank error ≤ 1e-4; check
    each estimate sits within a 2% rank window of the exact quantile."""
    rows = REGISTRY["q66_approx_quantiles"].build(spark, SF_DIR).collect()
    assert rows
    from pandamapreduce_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").toPandas()
    for r in rows:
        vals = ev[ev.event_type == r.event_type]["value"].sort_values().to_numpy()
        n = len(vals)
        for q, got in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            lo = vals[max(0, int((q - 0.02) * n))]
            hi = vals[min(n - 1, int((q + 0.02) * n))]
            assert lo <= got <= hi, (r.event_type, q, got, lo, hi)


def test_cms_overestimates_and_bounds(spark):
    """q104: CMS estimates are never below exact counts (one-sided
    error), present probe words estimate within (e/W)·N of exact, and
    the sketch itself stays ≤ D×W rows regardless of corpus size."""
    import math

    from pyspark.sql import functions as F

    from pandamapreduce_spark.functions import tokens
    from pandamapreduce_spark.plans.sketches import CMS_D, CMS_W

    rows = REGISTRY["q104_cms_heavy_hitters"].build(spark, SF_DIR).collect()
    assert rows
    from pandamapreduce_spark.catalog import load_table

    total_tokens = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(tokens("text")).alias("t"))
        .count()
    )
    bound = math.e / CMS_W * total_tokens
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.est_count >= r.exact_count, r
        if r.exact_count > 0:
            assert r.overestimate <= max(3 * bound, 10), (r, bound)


def test_q64_sparse_mode_exact_at_all_fixtures(spark):
    """The q64 exact-SQL oracle rests on HLL sparse-mode exactness;
    assert est == exact at the LARGEST shipped fixture (1500 distinct
    users at sf0.1 — still far under the ~12k coupon transition), so
    the oracle's validity regime covers every fixture, not just the
    driver-checked ones."""
    row = REGISTRY["q64_sketch_distinct_rollup"].build(spark, "/root/testdata/sf0.1").collect()[0]
    assert row.est_total_users == row.exact_total_users == 1500
