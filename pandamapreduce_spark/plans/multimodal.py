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


def _feat_byte_sql(h: str, j: int) -> str:
    """Byte ``j`` of a hex md5 digest string, as an integer 0-255."""
    hexd = "0123456789abcdef"
    c1 = f"(strpos('{hexd}', substr({h}, {2 * j + 1}, 1)) - 1)"
    c2 = f"(strpos('{hexd}', substr({h}, {2 * j + 2}, 1)) - 1)"
    return f"({c1} * 16 + {c2})"


_Q71_FEATS = ",\n           ".join(
    f"cast({_feat_byte_sql('h', j)} as double) / 255.0 AS f{j}" for j in range(8)
)


@query(
    "q71_multimodal_features",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, 'image' AS modality, 256 AS n_bytes,
             md5(text) AS content_md5,
             md5(concat(md5(text), ':features')) AS h
      FROM documents
    )
    SELECT doc_id, modality, n_bytes, content_md5,
           {_Q71_FEATS}
    FROM seeded ORDER BY doc_id
    """,
    doc="Arrow-batched (mapInPandas) feature extraction over binary payloads; deterministic fake codec seeded from the real payload bytes, verified bitwise against the SQL keystream contract.",
    tags=("multimodal", "pandas-udf"),
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Features are emitted as 8 scalar double columns (f0..f7) rather
    than one array column: scalar columns sort/hash cleanly in any
    result canonicalizer, and the values are exact IEEE divisions so
    the DuckDB twin matches bitwise. The seed is hex(payload[:16]) ==
    md5(text) taken from the ACTUAL Arrow-transferred bytes, so a
    corrupted binary path fails the hash check."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_payload(docs))
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_md5",
        *[F.col("features")[j].alias(f"f{j}") for j in range(8)],
    ).orderBy("doc_id")


@query(
    "q72_frame_sample",
    oracle="""
    SELECT d.doc_id, cast(r.i as int) AS frame_idx, 64 AS n_bytes,
           substr(md5(concat(md5(d.text), ':', cast(r.i as varchar))), 1, 16) AS head_fp
    FROM documents d, range(4) r(i)
    ORDER BY doc_id, frame_idx
    """,
    doc="Video frame sampling (1:N mapInPandas flatMap over binary payloads); fingerprint of the actual frame bytes hash-matches the oracle's keystream contract.",
    tags=("multimodal", "video", "pandas-udf"),
)
def q72_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The head_fp column is computed from the REAL frame bytes the
    operator emitted (hex of bytes 1-8), so a wrong byte stream fails
    the oracle, not just a wrong row count."""
    from pandamapreduce_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_fake_payload(docs, "video"), num_frames=4, frame_bytes=64)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(frame, 1, 8)"))).alias("head_fp"),
    ).orderBy("doc_id", "frame_idx")


@query(
    "q73_resize",
    oracle="""
    SELECT doc_id, 256 AS n_bytes, 16 AS width, 16 AS height,
           substr(md5(concat(md5(text), ':resize:16x16')), 1, 16) AS head_fp
    FROM documents ORDER BY doc_id
    """,
    doc="Image resize plumbing (binary→binary mapInPandas, metadata gains dimensions); output bytes verified against the oracle keystream contract.",
    tags=("multimodal", "image", "pandas-udf"),
)
def q73_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandamapreduce_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(attach_fake_payload(docs, "image"), width=16, height=16)
    return resized.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.lower(F.hex(F.expr("substring(payload, 1, 8)"))).alias("head_fp"),
    ).orderBy("doc_id")
