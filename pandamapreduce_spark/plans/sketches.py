"""Sketch-based approximate aggregation — the mergeable-summary scale
path for distinct counting and quantiles.

At 100 TB exact ``count_distinct`` shuffles every distinct key;
a DataSketches HLL sketch is a fixed ~2^lgK-byte summary that merges
associatively, so per-partition/per-day sketches roll up with NO
re-scan of history — the same pattern the reference's combiner (O6,
``src/PandaLib.cu:302-379``) applies to additive aggregates,
generalized to approximate set cardinality.

All sketch queries carry FULL value-hash oracles. q104 (count-min) is
deterministic by construction. q64/q66 exploit a measured property of
the driver's fixture scales: below each sketch's exactness threshold
the "estimate" IS the exact answer — DataSketches HLL stays in sparse
(coupon-list) mode far beyond the fixtures' ≤1.5k distinct users, and
approx_percentile's GK summary is uncompressed while n < accuracy
(GK_ACCURACY=50000) per group — sized to cover the LARGEST shipped
fixture (sf0.1: max group n = 20302), not just the driver-checked
sf0.01 (max 2017), so the exact-SQL oracle is valid at every fixture
scale (ADVICE r4: at the old accuracy=10000 the sf0.1 groups crossed
the regime and the oracle measurably mismatched). Verified bit-equal
at sf0.001/sf0.01/sf0.1. The estimation-mode error behavior at real
scale stays pinned by pytest invariants (tests/test_sketches.py);
tests/test_sketches.py guards the regime boundary at the largest
fixture for BOTH q64 and q66.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.plans.registry import query


@query(
    "q64_sketch_distinct_rollup",
    # Exact-SQL oracle is valid here by a MEASURED sketch property, not
    # assumption: DataSketches HLL (lgK=14) stays in sparse coupon-list
    # mode until ~3/4·2^14 ≈ 12k coupons, where the estimate is the
    # exact coupon count; the fixtures carry 15/150/1500 distinct
    # users, so est == exact at every shipped sf (verified empirically
    # at sf0.001/0.01/0.1). Estimation-mode error at real cardinality
    # is pinned by tests/test_sketches.py invariants instead.
    oracle="""
    WITH daily AS (
      SELECT cast(ts as date) AS day, count(distinct user_id) AS exact_users
      FROM events GROUP BY 1
    )
    SELECT (SELECT cast(count(*) as bigint) FROM daily) AS n_days,
           (SELECT cast(count(distinct user_id) as bigint) FROM events) AS est_total_users,
           (SELECT cast(count(distinct user_id) as bigint) FROM events) AS exact_total_users,
           (SELECT cast(sum(exact_users) as bigint) FROM daily) AS sum_daily_exact
    """,
    doc="Mergeable HLL rollup: per-day user sketches union to a global distinct estimate without re-scanning; exact counts alongside for the error bound. Hash-oracled: sparse-mode HLL is exact below ~12k distinct (fixtures ≤1.5k).",
    tags=("sketch", "hll", "rollup", "approx"),
)
def q64_sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-user rollup: day-grain HLL sketches
    (``hll_sketch_agg``, lgK=14 → ~0.8% rsd) union via
    ``hll_union_agg`` into the global estimate. The day sketches are
    the materializable artifact: at scale they'd persist per partition
    and any time-range distinct query becomes a union of ~bytes-sized
    summaries. Exact counts computed here only to surface the error."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as long)").alias("est_total_users"),
        F.sum("exact_users").alias("sum_daily_exact"),
    )
    exact_total = ev.agg(F.count_distinct("user_id").alias("exact_total_users"))
    return merged.crossJoin(exact_total).select(
        "n_days", "est_total_users", "exact_total_users", "sum_daily_exact"
    )


GK_ACCURACY = 50000  # exactness regime bound: exact while per-group n < this


@query(
    "q66_approx_quantiles",
    # Exact-SQL oracle by the GK summary's exactness regime: while
    # per-group n < GK_ACCURACY every sample survives compression and
    # the query returns the exact discrete quantile — empirically
    # bit-equal to DuckDB's quantile_disc at sf0.001/sf0.01/sf0.1
    # (largest group 20302 < 50000; guard test pins the boundary).
    # Rank error in the compressed regime is pinned by
    # tests/test_sketches.py.
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.95) AS p95,
           quantile_disc(value, 0.99) AS p99,
           cast(count(*) as bigint) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Mergeable approximate quantiles (approx_percentile) per group — the 100 TB path where exact percentile_cont would shuffle full values. Hash-oracled: GK is exact while n < accuracy per group (fixtures: ≤20302 < 50000).",
    tags=("sketch", "quantile", "approx"),
)
def q66_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95/p99 of value via ``approx_percentile``
    (accuracy GK_ACCURACY=50000 → ≤2e-5 rank error). Unlike exact
    percentiles (q28), the summary is fixed-size and merges across
    partitions — one narrow shuffle of summaries, never of raw
    values."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr(f"approx_percentile(value, array(0.5, 0.95, 0.99), {GK_ACCURACY})").alias("q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p95"),
            F.col("q")[2].alias("p99"),
            "n",
        )
        .orderBy("event_type")
    )


# --- q104: count-min sketch (frequency estimation as pure dataflow) -------

CMS_D = 4  # hash rows
CMS_W = 2048  # buckets per row (~e/W relative error on the token mass)
CMS_PROBES = ("the", "a", "of", "and", "to", "in", "zyzzyva", "qwertyuiop")


def _cms_buckets(col, salt: str = "cms", d: int | None = None, w: int | None = None):
    from pandamapreduce_spark.functions import hex16

    d = CMS_D if d is None else d
    w = CMS_W if w is None else w
    return F.array(
        *[F.pmod(hex16(F.concat(F.lit(f"{salt}{i}:"), col)), F.lit(w)) for i in range(d)]
    )


def _probe_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in CMS_PROBES)


def _make_cms_oracle() -> str:
    from pandamapreduce_spark.functions import hex16_sql

    sk_bucket = hex16_sql("concat('cms', cast(d as varchar), ':', token)")
    pb_bucket = hex16_sql("concat('cms', cast(d as varchar), ':', word)")
    from pandamapreduce_spark.functions import tokens_sql

    return f"""
    WITH tok AS (SELECT unnest({tokens_sql("text")}) AS token FROM documents),
    ds AS (SELECT unnest(range(0, {CMS_D})) AS d),
    sk AS (
      SELECT d, {sk_bucket} % {CMS_W} AS bucket, cast(count(*) as bigint) AS cnt
      FROM tok, ds GROUP BY 1, 2
    ),
    probes(word) AS (VALUES {", ".join(f"('{w}')" for w in CMS_PROBES)}),
    pb AS (
      SELECT word, d, {pb_bucket} % {CMS_W} AS bucket FROM probes, ds
    ),
    est AS (
      SELECT word, cast(min(coalesce(sk.cnt, 0)) as bigint) AS est_count
      FROM pb LEFT JOIN sk USING (d, bucket) GROUP BY word
    ),
    exact AS (
      SELECT token AS word, cast(count(*) as bigint) AS exact_count
      FROM tok WHERE token IN ({_probe_list_sql()}) GROUP BY token
    )
    SELECT e.word,
           cast(coalesce(x.exact_count, 0) as bigint) AS exact_count,
           e.est_count,
           cast(e.est_count - coalesce(x.exact_count, 0) as bigint) AS overestimate
    FROM est e LEFT JOIN exact x ON e.word = x.word ORDER BY e.word
    """


@query(
    "q104_cms_heavy_hitters",
    oracle=_make_cms_oracle(),
    doc=f"Count-min sketch as pure dataflow: {CMS_D}x{CMS_W} md5-bucket counters, probe-word estimates (min over rows) vs exact counts; fully deterministic, hash-checked.",
    tags=("sketch", "cms", "approx", "text"),
)
def q104_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built with nothing but groupBy: every token
    increments {CMS_D} counters (one md5-salted bucket per hash row);
    a probe word's frequency estimate is the MIN of its counters —
    always an overestimate, within (e/{CMS_W})·total_tokens w.h.p.

    Unlike the q64/q66 DataSketches estimators this sketch is fully
    deterministic and engine-independent, so it carries a full
    value-hash oracle.

    Scale shape: the shuffle carries (d, bucket) keys with map-side
    partial aggregation, so each task emits ≤ {CMS_D}×{CMS_W} partial
    rows no matter how many tokens it scanned, and the finished sketch
    is a fixed ≤ {CMS_D}×{CMS_W}-row table — THE mergeable-summary
    property: per-day/per-shard sketches add cellwise with no re-scan.
    The probe lookup broadcasts the sketch; the exact counts (error
    audit only) filter to the probe set before their shuffle.
    """
    from pandamapreduce_spark.functions import tokens

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    sketch = (
        tok.select(F.posexplode(_cms_buckets(F.col("token"))).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = spark.createDataFrame([(w,) for w in CMS_PROBES], "word string")
    pb = probes.select("word", F.posexplode(_cms_buckets(F.col("word"))).alias("d", "bucket"))
    est = (
        pb.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )
    exact = (
        tok.where(F.col("token").isin(*CMS_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(F.broadcast(exact), est["word"] == exact["token"], "left")
        .select(
            "word",
            F.coalesce(F.col("exact_count"), F.lit(0)).cast("bigint").alias("exact_count"),
            "est_count",
            (F.col("est_count") - F.coalesce(F.col("exact_count"), F.lit(0))).cast("bigint").alias("overestimate"),
        )
        .orderBy("word")
    )


# --- q190: CMS accuracy evaluation (full-vocabulary error profile) ----------

CMS_EVAL_WIDTHS = (65536, 2048, 256)  # wide / shipped / deliberately narrow


def _cms_eval_oracle() -> str:
    from pandamapreduce_spark.functions import hex16_sql, word_ngrams_sql

    sk_bucket = hex16_sql("concat('cms', cast(d as varchar), ':', token)")
    pb_bucket = hex16_sql("concat('cms', cast(ds.d as varchar), ':', v.token)")
    blocks = []
    for w in CMS_EVAL_WIDTHS:
        blocks.append(f"""
      SELECT {w} AS width, v.token, v.exact_count,
             cast(min(coalesce(s.cnt, 0)) as bigint) AS est_count
      FROM vocab v CROSS JOIN ds
      LEFT JOIN sk{w} s ON s.d = ds.d AND s.bucket = {pb_bucket} % {w}
      GROUP BY v.token, v.exact_count""")
    sketches = ",\n".join(
        f"""sk{w} AS MATERIALIZED (
      SELECT d, {sk_bucket} % {w} AS bucket, cast(count(*) as bigint) AS cnt
      FROM tok, ds GROUP BY 1, 2
    )"""
        for w in CMS_EVAL_WIDTHS
    )
    return f"""
    WITH tok AS MATERIALIZED (SELECT unnest({word_ngrams_sql("text", 3)}) AS token FROM documents),
    ds AS (SELECT unnest(range(0, {CMS_D})) AS d),
    vocab AS MATERIALIZED (
      SELECT token, cast(count(*) as bigint) AS exact_count FROM tok GROUP BY token
    ),
    {sketches},
    est AS ({" UNION ALL ".join(blocks)}),
    lab AS (
      SELECT width, (est_count - exact_count) AS over_est,
             CASE WHEN est_count = exact_count THEN 'a_exact'
                  WHEN est_count - exact_count < 10 THEN 'b_under_10'
                  WHEN est_count - exact_count < 100 THEN 'c_under_100'
                  ELSE 'd_100_plus' END AS err_bucket
      FROM est
    ),
    nv AS (SELECT cast(count(*) as bigint) AS n_vocab FROM vocab)
    SELECT cast(width as int) AS width, err_bucket,
           cast(count(*) as bigint) AS n_tokens,
           cast(max(over_est) as bigint) AS max_overestimate,
           cast(count(*) as double) / cast(nv.n_vocab as double) AS share
    FROM lab, nv GROUP BY width, err_bucket, nv.n_vocab
    ORDER BY width, err_bucket
    """


@query(
    "q190_cms_error_profile",
    oracle=_cms_eval_oracle(),
    doc=f"Count-min sketch accuracy evaluation over the FULL 3-gram shingle vocabulary — the sketch twin of q171's ANN recall / q185's dedup eval: for widths {CMS_EVAL_WIDTHS} (d={CMS_D}), every distinct shingle's CMS estimate vs its exact count, bucketed by overestimate (exact / <10 / <100 / 100+) with counts, max error, and vocabulary share. Shingles, not unigrams (q104's domain): the fixture's 31-word vocabulary never collides at any practical width, while the shingle space is thousands of keys — the load regime (keys/width) a production contamination/dup sketch actually runs at.",
    tags=("sketch", "cms", "evaluation"),
)
def q190_cms_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q104 spot-checks 8 probe words; this lane audits the whole
    3-GRAM SHINGLE vocabulary across the width ladder, so the width/error trade-off is measured
    the way q171 measures ANN probes: wider sketches land more of the vocabulary
    in 'a_exact' while the narrow 256-bucket one smears mass into
    collision buckets —
    evidence, not folklore, for the width choice.

    Scale shape: each sketch is the fixed <= d x w row table (map-side
    partial agg bounds task output regardless of scanned tokens); the
    evaluation joins the DISTINCT-token vocabulary (corpus-sublinear)
    against the BROADCAST sketch on (d, bucket) integer keys and takes
    a per-token min over d rows. Overestimates are exact integer
    subtractions (CMS never underestimates); the one double per row is
    the vocabulary-share division."""
    from pandamapreduce_spark.caching import scoped_persist
    from pandamapreduce_spark.functions import word_ngrams

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = scoped_persist(docs.select(F.explode(word_ngrams("text", 3)).alias("token")))
    vocab = scoped_persist(
        tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    nv = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("n_vocab"))
    out = None
    for w in CMS_EVAL_WIDTHS:
        sketch = (
            tok.select(F.posexplode(_cms_buckets(F.col("token"), w=w)).alias("d", "bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        est = (
            vocab.select(
                "token",
                "exact_count",
                F.posexplode(_cms_buckets(F.col("token"), w=w)).alias("d", "bucket"),
            )
            .join(F.broadcast(sketch), ["d", "bucket"], "left")
            .groupBy("token", "exact_count")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
            .withColumn("width", F.lit(w))
        )
        out = est if out is None else out.union(est)
    over = F.col("est_count") - F.col("exact_count")
    lab = out.select(
        "width",
        over.alias("over_est"),
        F.when(over == 0, "a_exact")
        .when(over < 10, "b_under_10")
        .when(over < 100, "c_under_100")
        .otherwise("d_100_plus")
        .alias("err_bucket"),
    )
    return (
        lab.groupBy("width", "err_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.max("over_est").cast("bigint").alias("max_overestimate"),
        )
        .crossJoin(F.broadcast(nv))
        .select(
            F.col("width").cast("int").alias("width"),
            "err_bucket",
            "n_tokens",
            "max_overestimate",
            (F.col("n_tokens").cast("double") / F.col("n_vocab").cast("double")).alias("share"),
        )
        .orderBy("width", "err_bucket")
    )
