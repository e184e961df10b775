"""The showcase composition: a full training-data cleaning pipeline —
quality filter → language filter → exact dedup → near-dup removal →
corpus stats — as ONE declarative engine query with a DuckDB oracle.

This is what the engine is FOR at 100 TB: every stage is one of the
already-verified operators (q24 quality, q25 lang, q31 dedup, q32/q33
LSH), composed so Catalyst plans the whole thing end-to-end —
filters before hashes, hash-only shuffles, candidate-only verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.functions import normalize_text, normalize_text_sql, tokens, tokens_sql
from pandamapreduce_spark.plans.dedup import MAX_BUCKET, _lsh_pairs_sql
from pandamapreduce_spark.plans.registry import query

MIN_TOKENS = 20
MIN_ALPHA = 0.5
KEEP_LANGS = ("en", "de", "es", "fr")


@query(
    "q80_clean_corpus",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, lang, text,
             len({tokens_sql("text")}) AS n_tokens,
             (cast(length(regexp_replace(text, '[^a-z]', '', 'g')) as double)
                / cast(length(text) as double)) AS alpha_ratio
      FROM documents
    ),
    filtered AS (
      SELECT * FROM quality
      WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
        AND lang IN ({", ".join(f"'{lang}'" for lang in KEEP_LANGS)})
    ),
    exact_keep AS (
      SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5({normalize_text_sql("text")})
    ),
    near_dups AS (
      SELECT DISTINCT doc_b AS doc_id FROM ({_lsh_pairs_sql("filtered")})
    ),
    kept AS (
      SELECT f.* FROM filtered f
      JOIN exact_keep e ON f.doc_id = e.doc_id
      WHERE f.doc_id NOT IN (SELECT doc_id FROM near_dups)
    )
    SELECT lang, count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS total_tokens,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM kept GROUP BY lang ORDER BY lang
    """,
    doc="End-to-end corpus cleaning: quality + language filters, exact dedup (normalized), LSH near-dup removal, per-language stats.",
    bench=True,
    tags=("pipeline", "dedup", "text", "quality"),
)
def q80_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the quality/language filters are map-only and run
    FIRST (cheapest, highest selectivity) — and the LSH near-dup stage
    runs on the FILTERED survivors only, so the expensive shingle
    explode never touches rejected documents. Exact dedup shuffles only
    (hash, doc_id); near-dup removal joins against the candidate-pair
    ids (tiny); stats are one partial-agg shuffle. Document bodies
    never shuffle."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = tokens("text")
    quality = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).alias("n_tokens"),
        (F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("double") / F.length("text").cast("double")).alias(
            "alpha_ratio"
        ),
    )
    filtered = quality.where(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA) & (F.col("lang").isin(*KEEP_LANGS))
    )
    from pandamapreduce_spark.operators.dedup_ops import minhash_band_pairs

    exact_keep = filtered.groupBy(F.md5(normalize_text("text")).alias("h")).agg(F.min("doc_id").alias("doc_id"))
    near_dups = (
        minhash_band_pairs(filtered.select("doc_id", "text"), max_bucket_size=MAX_BUCKET)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = (
        filtered.join(exact_keep.select("doc_id"), "doc_id", "left_semi")
        .join(near_dups, "doc_id", "left_anti")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )
