"""Reusable dedup operators over arbitrary DataFrames (the registry
queries in ``plans.dedup`` are thin wrappers over these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandamapreduce_spark.functions import minhash_hashes, minhash_sig, word_ngrams


def minhash_band_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    num_bands: int = 4,
    ngram: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b), as a bucket reduce.

    ``max_bucket_size``: at corpus scale, a band bucket with thousands
    of members is boilerplate (headers, licenses), not near-duplication
    — emitting its O(k²) pairs is both useless and the job's skew
    hazard. Buckets above the cap are dropped. The registry queries
    (plans.dedup) pass ``plans.dedup.MAX_BUCKET`` and mirror the cap
    into their SQL oracle; None = emit all.
    """
    rows_per_band = num_hashes // num_bands
    shingle = docs.select(F.col(id_col).alias("__id"), F.explode(word_ngrams(text_col, ngram)).alias("s"))
    # One md5 per shingle; the num_hashes family members are cheap
    # bigint mul-adds (Carter-Wegman, see functions.text.minhash_sig).
    # The map-side partial min then shuffles only num_hashes longs per
    # (id, partition) — never the shingle strings.
    b1, b2 = minhash_hashes(F.col("s"))
    hashed = shingle.select("__id", b1.alias("b1"), b2.alias("b2"))
    sigs = hashed.groupBy("__id").agg(
        *[F.min(F.col("b1") + i * F.col("b2")).alias(f"h{i}") for i in range(num_hashes)]
    )
    bands = sigs.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws("|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]))
                    for b in range(num_bands)
                ]
            )
        ).alias("band", "key"),
    )
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("__id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    return (
        buckets.select(F.posexplode("ids").alias("i", "doc_a"), F.col("ids"))
        .select("doc_a", F.explode(F.slice(F.col("ids"), F.col("i") + 2, F.size("ids"))).alias("doc_b"))
        .distinct()
    )


def minhash_band_keys(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    num_bands: int = 4,
    ngram: int = 3,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Stateless LSH band-key projection: one row per (doc, band),
    columns ``(*keep, doc_id, band, key)``.

    Unlike ``minhash_band_pairs``' explode→partial-min aggregation,
    the signature here is a pure EXPRESSION (``array_min`` over
    ``transform``, see ``functions.text.minhash_sig``) — no shuffle,
    no state — so it is legal inside a streaming query ahead of a
    stream-stream bucket join. Per-row hashing cost is identical (one
    md5 per shingle + Carter-Wegman mul-adds); band keys match the
    batch operator exactly (md5 over '|'-joined decimal signature
    rows), so stream and batch candidates land in the same buckets.

    Documents with no shingles are dropped: they have no signature,
    and an all-null signature would otherwise collapse every empty
    document into one md5('') bucket.
    """
    rpb = num_hashes // num_bands
    grams = word_ngrams(text_col, ngram)
    df = docs.where(F.size(grams) > 0).select(
        *keep, F.col(id_col).alias("doc_id"), minhash_sig(grams, num_hashes).alias("__sig")
    )
    sig = F.col("__sig")
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("|", *[sig[b * rpb + r].cast("string") for r in range(rpb)]))
            for b in range(num_bands)
        ]
    )
    return df.select(*keep, "doc_id", F.posexplode(band_arr).alias("band", "key"))


def minhash_band_keys_agg(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    num_bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """Band keys via the aggregation formulation: shingle explode →
    per-doc partial-min of the Carter-Wegman family → md5 band keys.

    Identical output to ``minhash_band_keys`` (same family, same
    '|'-joined band hashing), but each shingle's md5 is computed ONCE
    on an exploded row instead of once per hash member inside a
    ``transform`` (Catalyst does not CSE across the 12 array
    transforms — measured 3-4× slower at sf0.1). Costs one shuffle of
    ``num_hashes`` longs per doc, so it's the right choice for batch
    plans; the expression variant remains the streaming-legal one."""
    rpb = num_hashes // num_bands
    shingle = docs.select(F.col(id_col).alias("doc_id"), F.explode(word_ngrams(text_col, ngram)).alias("s"))
    b1, b2 = minhash_hashes(F.col("s"))
    sigs = (
        shingle.select("doc_id", b1.alias("b1"), b2.alias("b2"))
        .groupBy("doc_id")
        .agg(*[F.min(F.col("b1") + i * F.col("b2")).alias(f"h{i}") for i in range(num_hashes)])
    )
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("|", *[F.col(f"h{b * rpb + r}").cast("string") for r in range(rpb)]))
            for b in range(num_bands)
        ]
    )
    return sigs.select("doc_id", F.posexplode(band_arr).alias("band", "key"))
