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
