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


# --- q193: perceptual-hash near-dup over binary payloads ---------------------

PHASH_BITS = 48  # q34b's lesson: 16 bits can't band usefully
PHASH_BANDS = 4
PHASH_K = 3  # verified hamming threshold; bands > K => pigeonhole recall
_PHASH_BAND_W = PHASH_BITS // PHASH_BANDS
PHASH_NOISE = 8  # re-encode flips bit i iff noise byte i < this (p = 1/32)


def _phash_sql_terms(salt: str, cmp: str) -> str:
    """48 CASE terms over three salted md5 keystreams of md5(text)."""
    terms = []
    for s in range(PHASH_BITS // 16):
        h = f"md5(concat(md5(text), ':{salt}{s}'))"
        for j in range(16):
            terms.append(
                f"(CASE WHEN {_feat_byte_sql(h, j)} {cmp} THEN {1 << (s * 16 + j)} ELSE 0 END)"
            )
    return " + ".join(terms)


def _phash_oracle() -> str:
    from pandamapreduce_spark.plans.dedup import MAX_BUCKET

    # original fingerprint: bit i set iff ahash keystream byte i >= 128
    # re-encoded variant: original XOR flipmask, flipmask bit i set iff
    # noise keystream byte i < PHASH_NOISE (expected ~1.5 of 48 bits)
    return f"""
    WITH ph AS MATERIALIZED (
      SELECT asset_id, phash FROM (
        SELECT doc_id * 2 AS asset_id,
               cast({_phash_sql_terms("ahash", ">= 128")} as bigint) AS phash
        FROM documents
        UNION ALL
        SELECT doc_id * 2 + 1,
               cast(xor(cast({_phash_sql_terms("ahash", ">= 128")} as bigint),
                        cast({_phash_sql_terms("noise", f"< {PHASH_NOISE}")} as bigint))
                    as bigint)
        FROM documents
      )
    ),
    bands AS (
      SELECT asset_id, phash,
             unnest([struct_pack(band := i,
                       key := (phash >> (i * {_PHASH_BAND_W})) & {(1 << _PHASH_BAND_W) - 1})
                     for i in range(0, {PHASH_BANDS})], recursive := true)
      FROM ph
    ),
    ok AS (
      SELECT band, key FROM bands
      GROUP BY band, key HAVING count(*) BETWEEN 2 AND {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
                      a.phash AS pa, b.phash AS pb
      FROM bands a
      JOIN ok o ON a.band = o.band AND a.key = o.key
      JOIN bands b ON a.band = b.band AND a.key = b.key AND a.asset_id < b.asset_id
    )
    SELECT asset_a, asset_b, cast(bit_count(xor(pa, pb)) as int) AS hamming
    FROM cand WHERE bit_count(xor(pa, pb)) <= {PHASH_K}
    ORDER BY asset_a, asset_b
    """


@query(
    "q193_phash_neardup",
    oracle=None,  # installed in plans/__init__ (imports dedup's bucket cap)
    doc=f"Perceptual-hash near-dup over BINARY payloads: each asset ships as an original plus a deterministic 'lossy re-encode' (fingerprint bits flipped where a noise keystream byte < {PHASH_NOISE} — expected ~1.5 of {PHASH_BITS} bits, the md5-exact stand-in for JPEG requantization); {PHASH_BITS}-bit aHash-style fingerprints computed inside Arrow-batched mapInPandas from the ACTUAL payload bytes, then q34b's Hamming-LSH ({PHASH_BANDS} bands, bucket-capped) verified at bit_count(xor) <= {PHASH_K}. Exact md5 dedup (q30) finds NONE of these pairs by construction; the perceptual lane recovers them — the modality axis of the dedup catalog (lexical q30-q34, semantic q183, perceptual binary).",
    tags=("multimodal", "dedup", "pandas-udf"),
)
def q193_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image/video dedup in production hashes DECODED CONTENT
    (aHash/pHash/dHash) precisely because re-encodes — same picture,
    different bytes — defeat file-level hashing. This lane builds that
    scenario end to end: every payload appears twice (asset 2d = the
    original, 2d+1 = its re-encode, whose fingerprint differs in the
    few keystream-chosen bit flips a lossy round-trip would cause),
    fingerprints are computed in the Arrow-batched Python operator
    from the bytes actually received (q71's corruption-detection
    posture; the pixel-threshold step is the documented codec stub),
    and the shared Hamming-LSH band join surfaces exactly the pairs
    exact hashing misses. Pigeonhole: <= {PHASH_K} flips across
    {PHASH_BANDS} bands always leaves one band intact, so recall at
    the threshold is structural, not probabilistic.

    Scale shape: fingerprints are one int64/asset; bands shuffle
    (band, key, id, phash) with the q32 bucket cap; verification is
    JVM bit_count(xor) on candidates only. The Python stage is
    Arrow-batched and embarrassingly parallel — at 100 TB it is the
    decode cluster's shape, with the band join unchanged."""
    import hashlib

    import pandas as pd

    from pandamapreduce_spark.plans.dedup import MAX_BUCKET

    def op(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                seed = bytes(payload)[:16].hex()
                h = flip = 0
                for s in range(PHASH_BITS // 16):
                    d = hashlib.md5(f"{seed}:ahash{s}".encode()).digest()
                    n = hashlib.md5(f"{seed}:noise{s}".encode()).digest()
                    for j in range(16):
                        bit = 1 << (s * 16 + j)
                        if d[j] >= 128:
                            h |= bit
                        if n[j] < PHASH_NOISE:
                            flip |= bit
                ids.extend((doc_id * 2, doc_id * 2 + 1))
                hashes.extend((h, h ^ flip))
            yield pd.DataFrame({"asset_id": ids, "phash": hashes})

    docs = load_table(spark, sf_dir, "documents", spread=True)
    ph = attach_fake_payload(docs).mapInPandas(op, "asset_id long, phash long")

    mask = (1 << _PHASH_BAND_W) - 1
    bands = ph.select(
        "asset_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("phash", i * _PHASH_BAND_W)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("asset_id", "phash", "b.band", "b.key")
    ok = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= MAX_BUCKET))
        .select("band", "key")
    )
    kept = bands.join(ok, ["band", "key"])
    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cand.where(ham <= PHASH_K)
        .select("asset_a", "asset_b", ham.cast("int").alias("hamming"))
        .orderBy("asset_a", "asset_b")
    )
