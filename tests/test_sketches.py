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
    """approx_percentile(accuracy=GK_ACCURACY) → rank error ≤
    1/accuracy; check each estimate sits within a 2% rank window of
    the exact quantile."""
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


def test_q66_exactness_regime_at_largest_fixture(spark):
    """The q66 exact-SQL oracle rests on the GK summary staying
    uncompressed (per-group n < GK_ACCURACY); assert BOTH halves at
    the LARGEST shipped fixture (ADVICE r4: at the old accuracy=10000
    the sf0.1 groups crossed the regime and the oracle measurably
    mismatched — p50 35.06 vs quantile_disc 35.07):
    (a) every sf0.1 group is under the regime bound, and
    (b) the result is bit-equal to a live DuckDB quantile_disc —
    so a future fixture regeneration or accuracy change that crosses
    the boundary fails HERE, not in a driver run above sf0.01."""
    import duckdb

    from pandamapreduce_spark.plans.sketches import GK_ACCURACY

    q = REGISTRY["q66_approx_quantiles"]
    got = q.build(spark, "/root/testdata/sf0.1").toPandas()
    assert int(got["n"].max()) < GK_ACCURACY, (
        f"largest sf0.1 group {got['n'].max()} crossed the GK exactness "
        f"regime ({GK_ACCURACY}) — the exact-SQL oracle is no longer valid"
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM"
            " read_parquet('/root/testdata/sf0.1/events.parquet')"
        )
        want = con.execute(q.oracle).df()
    finally:
        con.close()
    g = got.sort_values("event_type").reset_index(drop=True)
    w = want.sort_values("event_type").reset_index(drop=True)
    assert g.equals(w), f"sf0.1 parity broke:\n{g}\nvs oracle\n{w}"
