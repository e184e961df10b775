"""Queries driven through the imperative MapReduce spine and the tera
pipeline — the reference's native API surface, exposed as engine
queries.

q50/q51 prove the RDD spine (``operators.mapreduce``) against the same
DuckDB oracle as the declarative queries. q52/q53 are the tera pipeline
(teragen is generative — no SQL oracle possible; validated by invariant
tests instead, the reference's own strategy, SURVEY §5.1).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.operators.mapreduce import map_reduce
from pandamapreduce_spark.operators import tera
from pandamapreduce_spark.plans.registry import query
from pandamapreduce_spark.plans.text import _WORDCOUNT_ORACLE_BASE

_WORD_RE = re.compile("[^A-Z]+")


@query(
    "q50_mr_wordcount",
    oracle=_WORDCOUNT_ORACLE_BASE + " ORDER BY word",
    doc="Wordcount via the imperative MapReduce spine (map emit → combiner → shuffle → reduce), matching the declarative q20 oracle.",
    tags=("mapreduce", "text", "ref"),
)
def q50_mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's wordcount job verbatim in callback form
    (``apps/wordcount/wc_api.cu:35-59,89-96,126-134``): map tokenizes
    and emits (word, 1); combiner and reduce sum. The spine compiles it
    to flatMap → local-combine → partitionBy → reduce."""
    docs = load_table(spark, sf_dir, "documents")
    rdd = docs.select("doc_id", "text").rdd.map(lambda r: (r[0], r[1]))

    def map_f(_doc_id, text):
        for w in _WORD_RE.split(text.upper()):
            if len(w) >= 6:
                yield w, 1

    def sum_f(_key, vals):
        return sum(vals)

    out = map_reduce(rdd, map_f, sum_f, combine_f=sum_f)
    schema = T.StructType(
        [T.StructField("word", T.StringType(), False), T.StructField("cnt", T.LongType(), False)]
    )
    return spark.createDataFrame(out, schema).orderBy("word")


@query(
    "q51_mr_keyval_agg",
    oracle="""
    SELECT l_returnflag AS k, cast(sum(cast(l_quantity as bigint)) as bigint) AS total_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY k
    """,
    doc="Generic keyval aggregation through the MapReduce spine (FIXTURES F3 shape).",
    tags=("mapreduce", "agg", "ref"),
)
def q51_mr_keyval_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map emits (returnflag, (qty, 1)); combiner/reduce fold pairwise
    (int arithmetic → exact regardless of order)."""
    li = load_table(spark, sf_dir, "lineitem")
    rdd = li.select("l_returnflag", "l_quantity").rdd.map(lambda r: (r[0], r[1]))

    def map_f(flag, qty):
        yield flag, (int(qty), 1)

    def fold_f(_key, vals):
        tq = sum(v[0] for v in vals)
        n = sum(v[1] for v in vals)
        return tq, n

    out = map_reduce(rdd, map_f, fold_f, combine_f=fold_f).map(lambda kv: (kv[0], kv[1][0], kv[1][1]))
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("total_qty", T.LongType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(out, schema).orderBy("k")


TERA_RECORDS = 20_000


@query(
    "q52_terasort",
    oracle=None,  # generative input — validated by invariant tests (SURVEY §5.1)
    doc="teragen → terasort: deterministic synthetic records, total-order sort, hex-key output sample.",
    bench=True,
    tags=("tera", "sort", "ref"),
)
def q52_terasort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the globally-ordered records with their rank; driver
    checks stable schema/row count; pytest checks the TeraValidate
    invariants + determinism under partition-count changes."""
    gen = tera.teragen(spark, TERA_RECORDS, num_partitions=8)
    sorted_df = tera.terasort(gen, num_partitions=8)
    return (
        sorted_df.orderBy("key")
        .limit(1000)
        .select(F.hex(F.col("key")).alias("key_hex"), F.crc32(F.col("value")).alias("value_crc"))
    )


@query(
    "q53_teravalidate",
    oracle=None,  # invariant summary of a generative pipeline
    doc="teravalidate: single-row verdict (count, checksum, sortedness, boundary non-overlap).",
    tags=("tera", "validate", "ref"),
)
def q53_teravalidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = tera.teragen(spark, TERA_RECORDS, num_partitions=8)
    sorted_df = tera.terasort(gen, num_partitions=8)
    verdict = tera.teravalidate(sorted_df)
    schema = T.StructType(
        [
            T.StructField("n_records", T.LongType(), False),
            T.StructField("checksum", T.DecimalType(38, 0), False),
            T.StructField("all_sorted", T.BooleanType(), False),
            T.StructField("boundaries_ok", T.BooleanType(), False),
            T.StructField("n_partitions", T.IntegerType(), False),
        ]
    )
    from decimal import Decimal

    row = (
        verdict["n_records"],
        Decimal(verdict["checksum"]),
        verdict["all_sorted"],
        verdict["boundaries_ok"],
        verdict["n_partitions"],
    )
    return spark.createDataFrame([row], schema)
