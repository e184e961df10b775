"""As-of operator: the declarative (union+window) and Arrow
(cogroup+merge_asof) implementations must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.operators.asof import asof_join, asof_join_pandas

from tests.conftest import SF_DIR


def test_asof_variants_agree(spark):
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("click_ts")
    )
    kw = dict(on="user_id", left_ts="ts", right_ts="click_ts", right_cols=["click_id", "click_ts"])
    a = asof_join(purchases, clicks, **kw).select("event_id", "click_id", "click_ts").orderBy("event_id").collect()
    b = asof_join_pandas(purchases, clicks, **kw).select("event_id", "click_id", "click_ts").orderBy("event_id").collect()
    assert len(a) == len(b) > 0
    assert a == b


def test_asof_no_right_rows_for_key(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "k int, ts int")
    right = spark.createDataFrame([(1, 5, "x")], "k int, rts int, tag string")
    out = {
        r.k: r.tag
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["tag"]).collect()
    }
    assert out == {1: "x", 2: None}

    out_p = {
        r.k: r.tag
        for r in asof_join_pandas(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["tag"]).collect()
    }
    assert out_p == out


def test_asof_tie_matches(spark):
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 10, "same"), (1, 9, "earlier")], "k int, rts int, tag string")
    r = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["tag"]).collect()[0]
    assert r.tag == "same"  # right_ts == left_ts matches (backward inclusive)


def test_asof_duplicate_right_ts_deterministic(spark):
    """ADVICE r1: duplicate (key, right_ts) right rows must resolve to
    ONE deterministic winner — the greatest value-column tuple — in
    both implementations, across repeated runs."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 9, "b"), (1, 9, "a"), (1, 9, "c")], "k int, rts int, tag string")
    kw = dict(on="k", left_ts="ts", right_ts="rts", right_cols=["tag"])
    winners = {asof_join(left, right, **kw).collect()[0].tag for _ in range(3)}
    assert winners == {"c"}
    assert asof_join_pandas(left, right, **kw).collect()[0].tag == "c"


def test_asof_forward_variants_agree(spark):
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("click_ts")
    )
    kw = dict(
        on="user_id", left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        direction="forward", tolerance_micros=600_000_000,
    )
    a = asof_join(purchases, clicks, **kw).select("event_id", "click_id", "click_ts").orderBy("event_id").collect()
    b = asof_join_pandas(purchases, clicks, **kw).select("event_id", "click_id", "click_ts").orderBy("event_id").collect()
    assert len(a) == len(b) > 0
    assert a == b
    # tolerance actually bites somewhere (or the whole test is vacuous)
    nulls = sum(1 for r in a if r.click_id is None)
    assert 0 < nulls < len(a)


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame([(1, 10), (1, 25), (1, 100)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 10, "same"), (1, 30, "next"), (1, 5, "past")], "k int, rts int, tag string"
    )
    kw = dict(on="k", left_ts="ts", right_ts="rts", right_cols=["tag", "rts"], direction="forward")
    got = {r.ts: (r.tag, r.rts) for r in asof_join(left, right, **kw).collect()}
    # equal ts matches; otherwise the NEXT right row; none after 30 → null
    assert got == {10: ("same", 10), 25: ("next", 30), 100: (None, None)}
    got_p = {r.ts: (r.tag, r.rts) for r in asof_join_pandas(left, right, **kw).collect()}
    assert got_p == got

    # tolerance: 25→30 is distance 5; tolerance 4 nulls it, 5 keeps it
    for tol, want in ((4, (None, None)), (5, ("next", 30))):
        g = {r.ts: (r.tag, r.rts) for r in asof_join(left, right, **kw, tolerance_micros=tol).collect()}
        assert g[25] == want, (tol, g)
        g_p = {r.ts: (r.tag, r.rts) for r in asof_join_pandas(left, right, **kw, tolerance_micros=tol).collect()}
        assert g_p[25] == want, (tol, g_p)


def test_asof_forward_duplicate_right_ts_deterministic(spark):
    """Forward mirror of the backward duplicate rule: the SMALLEST
    value-column tuple wins, identically in both implementations."""
    left = spark.createDataFrame([(1, 8)], "k int, ts int")
    right = spark.createDataFrame([(1, 9, "b"), (1, 9, "a"), (1, 9, "c")], "k int, rts int, tag string")
    kw = dict(on="k", left_ts="ts", right_ts="rts", right_cols=["tag"], direction="forward")
    winners = {asof_join(left, right, **kw).collect()[0].tag for _ in range(3)}
    assert winners == {"a"}
    assert asof_join_pandas(left, right, **kw).collect()[0].tag == "a"
