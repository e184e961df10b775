"""Table-maintenance lanes (round 5): snapshot reconciliation diff and
incremental (partial-state) aggregate maintenance.

These are the operators a 100 TB warehouse runs between queries: "what
changed between yesterday's and today's snapshot?" and "fold today's
delta into the standing rollup without recomputing history". Both are
pure dataflow — fingerprints and partial-aggregate states shuffle,
never full payloads.

Float contract as everywhere (``plans.numeric``): sums ride exact
decimal end-to-end (order- and grouping-independent), so the merged
two-level aggregate is bitwise-identical to a direct recompute — which
is exactly why the oracle can be the direct recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.plans.numeric import DEC
from pandamapreduce_spark.plans.registry import query

# --- q134: snapshot diff / reconciliation ---------------------------------

# Deterministic twin snapshots derived from one fixture table:
# "yesterday" drops every 97th key, "today" drops every 89th key and
# rewrites the priority of every 13th — so the diff exercises all four
# outcomes (added / removed / changed / unchanged) with known planted
# populations.
BASE_DROP_MOD = 97
CURR_DROP_MOD = 89
CHANGE_MOD = 13
CHANGED_PRIORITY = "9-RECHECK"

#: columns folded into the row fingerprint — ints and strings only, so
#: the md5 input text is engine-independent (no float/date rendering)
FP_COLS_SQL = "concat_ws('|', o_orderstatus, o_orderpriority, cast(o_custkey as varchar))"


def _fp_col() -> F.Column:
    return F.md5(
        F.concat_ws(
            "|", F.col("o_orderstatus"), F.col("o_orderpriority"), F.col("o_custkey").cast("string")
        )
    )


@query(
    "q134_snapshot_diff",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, md5({FP_COLS_SQL}) AS fp
      FROM orders WHERE o_orderkey % {BASE_DROP_MOD} <> 0
    ),
    curr0 AS (
      SELECT o_orderkey, o_orderstatus, o_custkey,
             CASE WHEN o_orderkey % {CHANGE_MOD} = 0 THEN '{CHANGED_PRIORITY}' ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % {CURR_DROP_MOD} <> 0
    ),
    curr AS (SELECT o_orderkey AS k, md5({FP_COLS_SQL}) AS fp FROM curr0),
    d AS (
      SELECT coalesce(b.k, c.k) AS k,
             CASE WHEN b.k IS NULL THEN 'added'
                  WHEN c.k IS NULL THEN 'removed'
                  WHEN b.fp <> c.fp THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM base b FULL OUTER JOIN curr c ON b.k = c.k
    )
    SELECT status, cast(count(*) as bigint) AS n,
           cast(min(k) as bigint) AS min_key, cast(max(k) as bigint) AS max_key,
           cast(sum(k) as bigint) AS key_checksum
    FROM d GROUP BY status ORDER BY status
    """,
    doc="Snapshot reconciliation diff: full-outer key join of two table versions compared by md5 row fingerprint (ints/strings only — engine-independent text) → added/removed/changed/unchanged populations with key checksums; only (key, 32-char fingerprint) ever shuffles.",
    tags=("warehouse", "diff", "reconciliation"),
)
def q134_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-reconciliation operator: validate a migration/replication
    by diffing snapshots WITHOUT shipping row payloads — each side
    collapses to (key, md5 fingerprint) at the scan, so the full-outer
    join shuffles 40 bytes/row regardless of table width. Statuses
    aggregate to a fixed-size report with sum/min/max key checksums
    (exact integer algebra) so the hash pins membership, not just
    counts. At 100 TB both scans are parquet-pruned to the fingerprint
    columns and the join is a plain hash join on the key; AQE handles
    the skewless balance. Planted populations: every 97th key added (absent from
    base, present only in curr), every 89th removed (present only in
    base), every 13th surviving key changed."""
    o = load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % BASE_DROP_MOD != 0).select(
        F.col("o_orderkey").alias("k"), _fp_col().alias("fp")
    )
    curr = (
        o.where(F.col("o_orderkey") % CURR_DROP_MOD != 0)
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % CHANGE_MOD == 0, F.lit(CHANGED_PRIORITY)).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .select(F.col("o_orderkey").alias("k"), _fp_col().alias("fp"))
    )
    b, c = base.alias("b"), curr.alias("c")
    d = b.join(c, F.col("b.k") == F.col("c.k"), "full_outer").select(
        F.coalesce(F.col("b.k"), F.col("c.k")).alias("k"),
        F.when(F.col("b.k").isNull(), "added")
        .when(F.col("c.k").isNull(), "removed")
        .when(F.col("b.fp") != F.col("c.fp"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        d.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("k").cast("bigint").alias("min_key"),
            F.max("k").cast("bigint").alias("max_key"),
            F.sum("k").cast("bigint").alias("key_checksum"),
        )
        .orderBy("status")
    )


# --- q135: incremental aggregate maintenance (partial-state merge) --------

SPLIT_TS = "1995-06-01"  # base = shipped before, delta = the new arrivals


def _partial_state(df: DataFrame) -> DataFrame:
    """Mergeable per-group state: count + exact-decimal sums + min/max.
    Sums stay DECIMAL here — the merge level re-sums decimals, so the
    fold is associative and bit-exact regardless of how the data was
    split (the algebraic-aggregate property that makes incremental
    view maintenance sound)."""
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty_dec"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_price_dec"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Fold any number of partial states into the final rollup."""
    allst = states[0]
    for s in states[1:]:
        allst = allst.unionAll(s)
    return (
        allst.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.round(F.sum("sum_qty_dec"), 2).cast("double").alias("sum_qty"),
            F.round(F.sum("sum_price_dec"), 2).cast("double").alias("sum_price"),
            F.min("min_ship").cast("date").cast("string").alias("min_ship"),
            F.max("max_ship").cast("date").cast("string").alias("max_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q135_incremental_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           cast(count(*) as bigint) AS n,
           cast(round(sum(cast(l_quantity as {DEC})), 2) as double) AS sum_qty,
           cast(round(sum(cast(l_extendedprice as {DEC})), 2) as double) AS sum_price,
           cast(cast(min(l_shipdate) as date) as varchar) AS min_ship,
           cast(cast(max(l_shipdate) as date) as varchar) AS max_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc=f"Incremental materialized-aggregate maintenance: the rollup is computed as merge(partial_state(base shipped < {SPLIT_TS}), partial_state(delta)) — mergeable (count, decimal-sum, min, max) states — and the oracle is the DIRECT full recompute, which the decimal algebra makes bitwise-identical; the maintenance path never rescans history at refresh time.",
    tags=("warehouse", "incremental", "materialized-view"),
)
def q135_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view refresh without history rescans: fold the
    daily delta's partial state into the standing state. The query
    deliberately computes base and delta states as two separate
    aggregations and merges them (two-level agg), then the oracle
    recomputes directly over the full table — passing the hash PROVES
    the merge is lossless, which is the soundness property incremental
    maintenance rests on. Decimal sums make the fold associative
    (order/grouping independent); min/max/count are trivially
    mergeable. At 100 TB the base state is ~|groups| rows read from
    the last refresh's output — only the delta is scanned."""
    li = load_table(spark, sf_dir, "lineitem")
    split = F.lit(SPLIT_TS).cast("timestamp")
    base = _partial_state(li.where(F.col("l_shipdate") < split))
    delta = _partial_state(li.where(~(F.col("l_shipdate") < split)))
    return merge_states(base, delta)


# --- q144: CDC apply (last-writer-wins change-stream materialization) -----

UPD_MOD = 7  # every 7th key gets a priority-update change
DEL_MOD = 31  # every 31st key gets a tombstone
CDC_UPDATED_PRIORITY = "9-UPDATED"


@query(
    "q144_cdc_apply",
    oracle=f"""
    WITH stream AS (
      SELECT o_orderkey AS k, cast(1 as bigint) AS version, 'I' AS op,
             o_orderpriority AS priority, o_custkey AS custkey
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', '{CDC_UPDATED_PRIORITY}', o_custkey
      FROM orders WHERE o_orderkey % {UPD_MOD} = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % {DEL_MOD} = 0
    ),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
      FROM stream
    )
    SELECT k, version, priority, custkey
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY k
    """,
    doc=f"CDC apply: materialize the final table state from an insert/update/delete change stream via last-writer-wins per key (row_number over version DESC, tombstones dropped) — the Debezium/'APPLY CHANGES INTO' operator; deterministic planted stream (updates on %{UPD_MOD} keys, tombstones on %{DEL_MOD}); only (key, version, op, changed columns) ever shuffles, and the rank<=1 filter compiles to WindowGroupLimit (partial top-1 per key BEFORE the exchange).",
    tags=("warehouse", "cdc", "merge"),
)
def q144_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-data-capture materializer: replicas and lakehouse
    tables are maintained by replaying an ordered change stream and
    keeping, per key, only the highest-version row — unless it is a
    tombstone. Differs from q124 (content-addressed corpus merge) and
    q130 (SCD2 keeps ALL versions as history): CDC apply keeps exactly
    one current row per surviving key. Scale shape: the stream
    shuffles once on the key; Spark's WindowGroupLimit pushes the
    top-1-per-key BEFORE the exchange (plan-asserted), so each map
    task forwards at most one candidate per key it sees — the shuffle
    carries survivors, not history. At 100 TB the stream is the day's
    delta, not the table: the same plan merges delta against the
    base's current snapshot read as yesterday's materialization."""
    o = load_table(spark, sf_dir, "orders")
    ins = o.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).cast("bigint").alias("version"),
        F.lit("I").alias("op"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_custkey").alias("custkey"),
    )
    upd = (
        o.where(F.col("o_orderkey") % UPD_MOD == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(2).cast("bigint").alias("version"),
            F.lit("U").alias("op"),
            F.lit(CDC_UPDATED_PRIORITY).alias("priority"),
            F.col("o_custkey").alias("custkey"),
        )
    )
    dele = (
        o.where(F.col("o_orderkey") % DEL_MOD == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(3).cast("bigint").alias("version"),
            F.lit("D").alias("op"),
            F.lit(None).cast("string").alias("priority"),
            F.lit(None).cast("bigint").alias("custkey"),
        )
    )
    stream = ins.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("k").orderBy(F.col("version").desc())
    return (
        stream.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", "version", "priority", "custkey")
        .orderBy("k")
    )


# --- q150: small-file compaction planning (OPTIMIZE bin-packing) ----------

#: Target compacted-output size (chars stand in for bytes on the
#: fixture's file inventory). Real deployments set ~128-1024 MB.
COMPACT_TARGET = 2048


@query(
    "q150_compaction_plan",
    oracle=f"""
    WITH inv AS (
      SELECT source, doc_id, n_chars,
             coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, n_chars,
             cast(start_off // {COMPACT_TARGET} as bigint) AS bin
      FROM inv
    )
    SELECT source, bin,
           cast(count(*) as bigint) AS n_files,
           cast(sum(n_chars) as bigint) AS bin_bytes,
           min(doc_id) AS first_file,
           max(doc_id) AS last_file
    FROM binned
    GROUP BY source, bin
    ORDER BY source, bin
    """,
    doc=f"Small-file compaction planning (the OPTIMIZE/binpack maintenance pass): per table-partition (source), files in stable inventory order are packed into ~{COMPACT_TARGET}-byte output tasks by their exact cumulative START offset (bin = prefix_sum div target) — RNG-free, order-deterministic, and embarrassingly parallel, unlike greedy first-fit-decreasing which is inherently sequential; emits one row per compaction task with file span and exact byte totals.",
    tags=("maintenance", "compaction", "window"),
)
def q150_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planner half of Iceberg/Delta OPTIMIZE: group a partition's
    files into contiguous ~target-size tasks. Sequential fill by exact
    cumulative start offset (bin = start div T) rather than greedy
    FFD: FFD's loop is order-sequential and unparallelizable, while
    the prefix-sum assignment is one window + integer division,
    identical on any engine, and keeps tasks CONTIGUOUS in inventory
    order (preserves clustering, e.g. q125's z-order). Every bin
    overflows its boundary by at most one file — the same guarantee
    binpack compaction ships. Scale shape: one (source) exchange
    serves the prefix-sum window and the task aggregate; only (source,
    doc_id, n_chars) triples shuffle — never file contents; window
    state is a running sum. Output is |files|/files-per-task rows."""
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(
            f"coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            f"div {COMPACT_TARGET}"
        ).alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_chars").cast("bigint").alias("bin_bytes"),
            F.min("doc_id").alias("first_file"),
            F.max("doc_id").alias("last_file"),
        )
        .orderBy("source", "bin")
    )


# --- q151: join-key skew profile ------------------------------------------

#: (table, key column) pairs to profile — the pre-flight diagnostic
#: before shuffling 100 TB on these keys.
SKEW_PROFILES = (("orders", "o_custkey"), ("lineitem", "l_suppkey"))


def _skew_profile_sql(tbl: str, col: str) -> str:
    return f"""
    SELECT '{tbl}.{col}' AS profiled, n_keys, total_rows, max_cnt,
           cast(total_rows as double) / cast(n_keys as double) AS avg_cnt,
           cast(max_cnt as double) * cast(n_keys as double)
             / cast(total_rows as double) AS skew_factor,
           sqrt(cast(n_keys as double) * cast(s2 as double)
                - cast(total_rows as double) * cast(total_rows as double))
             / cast(total_rows as double) AS cv,
           top_key
    FROM (
      SELECT cast(count(*) as bigint) AS n_keys,
             cast(sum(cnt) as bigint) AS total_rows,
             cast(max(cnt) as bigint) AS max_cnt,
             cast(sum(cast(cnt as decimal(19,0)) * cast(cnt as decimal(19,0))) as decimal(38,0)) AS s2
      FROM (SELECT {col} AS k, cast(count(*) as bigint) AS cnt FROM {tbl} GROUP BY {col})
    ), (
      SELECT min(k) AS top_key
      FROM (SELECT {col} AS k, cast(count(*) as bigint) AS cnt FROM {tbl} GROUP BY {col}),
           (SELECT max(cnt) AS mx FROM (SELECT cast(count(*) as bigint) AS cnt FROM {tbl} GROUP BY {col}))
      WHERE cnt = mx
    )
    """


@query(
    "q151_skew_profile",
    oracle="\n    UNION ALL\n".join(
        _skew_profile_sql(t, c) for t, c in SKEW_PROFILES
    )
    + "\n    ORDER BY profiled",
    doc="Join-key skew profile — the pre-shuffle diagnostic: per candidate key, group-size distribution stats (distinct keys, rows, max group, max/avg skew factor, coefficient of variation from exact integer moments, deterministic heaviest key = min key id among max-count ties); decides broadcast vs shuffle vs salting (q56/q75) BEFORE committing a 100 TB exchange.",
    tags=("maintenance", "skew", "diagnostics"),
)
def q151_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What you run before joining at scale: if skew_factor (max
    group / mean group) is large, the biggest shuffle partition
    dominates the stage and salting (q56/q75's machinery) or a
    broadcast is warranted. Float contract: counts and their squares
    accumulate exactly (bigint / decimal(19,0)² sums — order-
    independent), doubles appear only in the final pinned expressions
    (two divisions, one IEEE sqrt — no transcendentals). Tie
    discipline: the heaviest key is PICKED as min(key) among
    max-count ties (q145's lesson — arg_max tie semantics differ
    across engines). Scale shape per profiled key: one partial-agg
    shuffle on the key (|distinct keys| rows), then constant-size
    aggregates; the max-count filter re-reads the counts with a
    broadcast 1-row bound — nothing wider than (key, count) ever
    shuffles, and the result is one row per profile."""
    from pandamapreduce_spark.caching import scoped_persist

    parts = []
    for tbl, col in SKEW_PROFILES:
        t = load_table(spark, sf_dir, tbl)
        counts = scoped_persist(
            t.groupBy(F.col(col).alias("k")).agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt")
            )
        )
        d19 = "decimal(19,0)"
        stats = counts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("total_rows"),
            F.max("cnt").cast("bigint").alias("max_cnt"),
            F.sum(F.col("cnt").cast(d19) * F.col("cnt").cast(d19))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        top1 = (
            counts.crossJoin(F.broadcast(stats.select(F.col("max_cnt").alias("mx"))))
            .where(F.col("cnt") == F.col("mx"))
            .agg(F.min("k").cast("bigint").alias("top_key"))
        )
        n_d = F.col("n_keys").cast("double")
        tot_d = F.col("total_rows").cast("double")
        parts.append(
            stats.crossJoin(F.broadcast(top1)).select(
                F.lit(f"{tbl}.{col}").alias("profiled"),
                "n_keys",
                "total_rows",
                "max_cnt",
                (tot_d / n_d).alias("avg_cnt"),
                (F.col("max_cnt").cast("double") * n_d / tot_d).alias("skew_factor"),
                (
                    F.sqrt(
                        n_d * F.col("s2").cast("double") - tot_d * tot_d
                    )
                    / tot_d
                ).alias("cv"),
                "top_key",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("profiled")


# --- q155: join-cardinality pre-flight (exact output forecast) ------------

#: (left table, left key, right table, right key) candidate joins to
#: forecast — the question asked before committing a 100 TB shuffle.
JOIN_FORECASTS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


def _join_forecast_sql(lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
    SELECT '{lt}.{lk} x {rt}.{rk}' AS candidate,
           cast(sum(ca) as bigint) AS rows_left,
           cast(sum(cb) as bigint) AS rows_right,
           cast(count(*) as bigint) AS matched_keys,
           cast(sum(cast(ca as decimal(19,0)) * cast(cb as decimal(19,0))) as bigint) AS out_rows,
           cast(max(cast(ca as decimal(19,0)) * cast(cb as decimal(19,0))) as bigint) AS max_key_out,
           cast(max(cast(ca as decimal(19,0)) * cast(cb as decimal(19,0))) as double)
             * cast(count(*) as double)
             / cast(sum(cast(ca as decimal(19,0)) * cast(cb as decimal(19,0))) as double)
             AS out_skew
    FROM (SELECT {lk} AS k, cast(count(*) as bigint) AS ca FROM {lt} GROUP BY {lk})
    JOIN (SELECT {rk} AS k, cast(count(*) as bigint) AS cb FROM {rt} GROUP BY {rk}) USING (k)
    """


@query(
    "q155_join_forecast",
    oracle="\n    UNION ALL\n".join(
        _join_forecast_sql(*f) for f in JOIN_FORECASTS
    )
    + "\n    ORDER BY candidate",
    doc="Exact join-cardinality pre-flight: for each candidate equi-join, the EXACT output row count SUM(c_A(k)*c_B(k)), matched-key count, per-side matched row totals, the largest single-key output, and the output-skew factor (max*keys/total) — computed from the two sides' key histograms WITHOUT materializing the join (the histograms join is |distinct keys| rows, the join output may be billions); the decision input for broadcast vs shuffle vs salting that q151 profiles per single table.",
    tags=("maintenance", "diagnostics", "join"),
)
def q155_join_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the optimizer's cardinality estimator guesses, computed
    exactly at histogram cost: joining the per-key COUNT tables (one
    row per distinct key each side) gives the exact join output size
    as SUM(c_A*c_B) and its skew as max(c_A*c_B) — the two numbers
    that decide whether a 100 TB join is safe, needs salting (q75),
    or should be bloom-pruned (q121). Exactness: counts are bigints,
    per-key products and their sum accumulate in decimal(19,0)^2 →
    decimal(38,0) (order-independent), out_skew is the one pinned
    double expression. Scale shape per candidate: one (key) partial-
    agg exchange per side (histogram rows only), an equi-join of the
    two histograms, then a constant-size aggregate — the forecast
    never shuffles more than (key, count) pairs. Result: one row per
    candidate join."""
    d19 = "decimal(19,0)"
    parts = []
    for lt, lk, rt, rk in JOIN_FORECASTS:
        la = (
            load_table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
        )
        rb = (
            load_table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
        )
        prod = F.col("ca").cast(d19) * F.col("cb").cast(d19)
        parts.append(
            la.join(rb, "k")
            .agg(
                F.sum("ca").cast("bigint").alias("rows_left"),
                F.sum("cb").cast("bigint").alias("rows_right"),
                F.count(F.lit(1)).cast("bigint").alias("matched_keys"),
                F.sum(prod).cast("bigint").alias("out_rows"),
                F.max(prod).cast("bigint").alias("max_key_out"),
                (
                    F.max(prod).cast("double")
                    * F.count(F.lit(1)).cast("double")
                    / F.sum(prod).cast("double")
                ).alias("out_skew"),
            )
            .select(
                F.lit(f"{lt}.{lk} x {rt}.{rk}").alias("candidate"),
                "rows_left",
                "rows_right",
                "matched_keys",
                "out_rows",
                "max_key_out",
                "out_skew",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("candidate")


# --- q156: anti-entropy repair (range-checksum replica diff) --------------

AE_BUCKETS = 256  # hash-range buckets compared between replicas
AE_DROP_MOD = 1997  # replica B is missing these keys (lost writes)
AE_CORRUPT_MOD = 997  # replica B has these rows content-corrupted


def _ae_replica_sql(corrupt: bool) -> str:
    """Per-bucket (count, xor-of-row-checksums) summary of one replica.

    Replica A is `orders` as shipped; replica B deterministically
    drops every {AE_DROP_MOD}-th key and corrupts the priority of
    every {AE_CORRUPT_MOD}-th.
    """
    from pandamapreduce_spark.functions import hex16_sql

    prio = (
        f"CASE WHEN o_orderkey % {AE_CORRUPT_MOD} = 0 THEN 'X-CORRUPT' ELSE o_orderpriority END"
        if corrupt
        else "o_orderpriority"
    )
    where = f"WHERE o_orderkey % {AE_DROP_MOD} <> 0" if corrupt else ""
    payload = (
        f"concat('row:', cast(o_orderkey as varchar), '|', {prio}, '|', "
        "cast(o_custkey as varchar), '|', cast(cast(round(o_totalprice*100) as bigint) as varchar))"
    )
    key_hash = hex16_sql("concat('rb:', cast(o_orderkey as varchar))")
    bucket = f"{key_hash} % {AE_BUCKETS}"
    return f"""
      SELECT {bucket} AS bucket,
             cast(count(*) as bigint) AS n,
             bit_xor({hex16_sql(payload)}) AS ck
      FROM orders {where} GROUP BY 1
    """


@query(
    "q156_anti_entropy",
    oracle=f"""
    WITH a AS ({_ae_replica_sql(False)}),
         b AS ({_ae_replica_sql(True)})
    SELECT coalesce(a.bucket, b.bucket) AS bucket,
           coalesce(a.n, 0) AS n_a, coalesce(b.n, 0) AS n_b,
           CASE WHEN coalesce(a.n, 0) <> coalesce(b.n, 0) THEN 'count_drift'
                ELSE 'content_drift' END AS status
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    WHERE coalesce(a.n, 0) <> coalesce(b.n, 0)
       OR coalesce(a.ck, 0) <> coalesce(b.ck, 0)
    ORDER BY bucket
    """,
    doc=f"Anti-entropy repair scan (the Cassandra/Dynamo replica-sync primitive): each replica folds every row into {AE_BUCKETS} hash-range bucket summaries — (count, XOR of 60-bit md5 row checksums), order-independent and overflow-free — and only the {AE_BUCKETS}-row summaries are compared, localizing WHICH key ranges need re-sync without shipping or row-diffing either table (q134 diffs rows; this finds ranges at constant exchange cost). Deterministic planted divergence: replica B drops key%{AE_DROP_MOD}=0 (count_drift) and corrupts priority on key%{AE_CORRUPT_MOD}=0 (content_drift).",
    tags=("maintenance", "replication", "merkle"),
)
def q156_anti_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB replica validation cannot row-diff (q134's full-outer
    join ships every key); the anti-entropy scan ships {AE_BUCKETS}
    summary rows per replica regardless of table size. Checksum
    discipline: row checksum = 60-bit md5 prefix of a canonical
    'row:k|priority|custkey|cents' payload (exact integer cents — no
    float formatting in the hash input); bucket = md5 of the key mod
    {AE_BUCKETS} (key-only, so a content change stays IN its bucket
    and surfaces as content_drift, not count_drift); per-bucket fold
    is XOR — associative, commutative, overflow-free, so map-side
    partial aggregation applies and the exchange carries ≤{AE_BUCKETS}
    rows per task. Divergence classes pinned by construction: dropped
    keys flip counts, corrupted rows flip only checksums."""
    from pandamapreduce_spark.functions import hex16

    o = load_table(spark, sf_dir, "orders")

    def replica(corrupt: bool) -> DataFrame:
        df = o
        prio = F.col("o_orderpriority")
        if corrupt:
            df = df.where(F.col("o_orderkey") % AE_DROP_MOD != 0)
            prio = F.when(
                F.col("o_orderkey") % AE_CORRUPT_MOD == 0, F.lit("X-CORRUPT")
            ).otherwise(prio)
        payload = F.concat(
            F.lit("row:"),
            F.col("o_orderkey").cast("string"),
            F.lit("|"),
            prio,
            F.lit("|"),
            F.col("o_custkey").cast("string"),
            F.lit("|"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        )
        bucket = hex16(F.concat(F.lit("rb:"), F.col("o_orderkey").cast("string"))) % AE_BUCKETS
        return (
            df.select(bucket.alias("bucket"), hex16(payload).alias("rh"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.expr("bit_xor(rh)").alias("ck"),
            )
        )

    a = replica(False).select(
        "bucket", F.col("n").alias("n_a"), F.col("ck").alias("ck_a")
    )
    b = replica(True).select(
        "bucket", F.col("n").alias("n_b"), F.col("ck").alias("ck_b")
    )
    na = F.coalesce("n_a", F.lit(0)).cast("bigint")
    nb = F.coalesce("n_b", F.lit(0)).cast("bigint")
    return (
        a.join(b, "bucket", "full_outer")
        .where(
            (na != nb)
            | (F.coalesce("ck_a", F.lit(0)) != F.coalesce("ck_b", F.lit(0)))
        )
        .select(
            "bucket",
            na.alias("n_a"),
            nb.alias("n_b"),
            F.when(na != nb, F.lit("count_drift"))
            .otherwise(F.lit("content_drift"))
            .alias("status"),
        )
        .orderBy("bucket")
    )
