"""Multimodal queries: binary payload columns + Arrow-batched feature
extraction (SURVEY §2.3 "ext": multimodal columns).

q70 checks the metadata/payload plumbing against the oracle (payload
derivation is md5-based, reproducible in SQL); q71 exercises the real
``mapInPandas`` feature-extraction operator (rows-only check — the
fake codec is Python-side by design, the SQL surface has no Arrow UDF
twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.operators.multimodal import attach_fake_payload, extract_features
from pandamapreduce_spark.plans.registry import query


@query(
    "q70_multimodal_meta",
    oracle="""
    SELECT doc_id, 'image' AS modality, 256 AS n_bytes, md5(text) AS content_md5
    FROM documents ORDER BY doc_id
    """,
    doc="Multimodal payload metadata: binary column + typed metadata struct, flattened.",
    tags=("multimodal",),
)
def q70_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p = attach_fake_payload(docs)
    return p.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    ).orderBy("doc_id")


@query(
    "q71_multimodal_features",
    oracle=None,  # Arrow-batched Python operator — no SQL twin
    doc="Arrow-batched (mapInPandas) feature extraction over binary payloads; deterministic fake codec.",
    tags=("multimodal", "pandas-udf"),
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_payload(docs))
    return feats.select("doc_id", "modality", "n_bytes", "content_md5", "features").orderBy("doc_id")
