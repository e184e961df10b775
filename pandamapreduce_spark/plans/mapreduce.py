"""Queries driven through the imperative MapReduce spine and the tera
pipeline — the reference's native API surface, exposed as engine
queries.

q50/q51 prove the RDD spine (``operators.mapreduce``) against the same
DuckDB oracle as the declarative queries. q52/q53 are the tera pipeline:
the input is generative but deterministic, so their oracles are literal
rows computed driver-side from the scalar record spec (which is itself
pinned against the published algorithm's bytes); invariant tests cover
the rest (the reference's own strategy, SURVEY §5.1).
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


def _tera_expected():
    """Driver-side scalar derivation of the full q52/q53 expectation:
    the tera input is generative but DETERMINISTIC (seeded LCG skip-
    ahead), so the oracle can hold literal rows. The scalar spec used
    here (``tera._record``) is itself pinned byte-for-byte against the
    published algorithm's output in tests/test_invariants.py, so this
    is not circular through the distributed path: it independently
    checks teragen's vectorized Arrow generator, the range exchange,
    the in-partition sort, and JVM crc32 against zlib.

    Returns (sorted [(key_hex, value_crc)] of the 1000 smallest keys,
    total checksum of crc32(key||value) over all records).
    """
    import zlib

    records = list(tera.generate_partition(0, TERA_RECORDS))
    total = sum(zlib.crc32(k + v) for k, v in records)
    records.sort(key=lambda kv: kv[0])
    sample = [(k.hex().upper(), zlib.crc32(v)) for k, v in records[:1000]]
    return sample, total


_TERA_SAMPLE, _TERA_CHECKSUM = _tera_expected()

_Q52_ORACLE = (
    "SELECT key_hex, value_crc FROM (VALUES "
    + ", ".join(f"('{k}', {c})" for k, c in _TERA_SAMPLE)
    + ") t(key_hex, value_crc) ORDER BY key_hex"
)


@query(
    "q52_terasort",
    oracle=_Q52_ORACLE,
    doc="teragen → terasort: deterministic synthetic records, total-order sort, hex-key output sample hash-matched against driver-side literal expectation.",
    bench=True,
    tags=("tera", "sort", "ref"),
)
def q52_terasort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the 1000 globally-smallest records as (key_hex, crc):
    hash-matched against the literal expectation computed scalar-side
    (``_tera_expected``); pytest additionally checks the TeraValidate
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
    oracle=f"""
    SELECT cast({TERA_RECORDS} as bigint) AS n_records,
           '{_TERA_CHECKSUM}' AS checksum,
           true AS all_sorted, true AS boundaries_ok,
           cast(8 as int) AS n_partitions
    """,
    doc="teravalidate: single-row verdict (count, checksum, sortedness, boundary non-overlap), hash-matched against the scalar-side expected checksum.",
    tags=("tera", "validate", "ref"),
)
def q53_teravalidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = tera.teragen(spark, TERA_RECORDS, num_partitions=8)
    sorted_df = tera.terasort(gen, num_partitions=8)
    verdict = tera.teravalidate(sorted_df)
    schema = T.StructType(
        [
            T.StructField("n_records", T.LongType(), False),
            # string: the 128-bit-safe decimal checksum round-trips
            # loss-free through any result canonicalizer as text
            T.StructField("checksum", T.StringType(), False),
            T.StructField("all_sorted", T.BooleanType(), False),
            T.StructField("boundaries_ok", T.BooleanType(), False),
            T.StructField("n_partitions", T.IntegerType(), False),
        ]
    )
    row = (
        verdict["n_records"],
        str(verdict["checksum"]),
        verdict["all_sorted"],
        verdict["boundaries_ok"],
        verdict["n_partitions"],
    )
    return spark.createDataFrame([row], schema)
