"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's data model is untyped byte pairs (``include/Panda.h:
115-122``) — binary columns are its natural generalization. Here:

- payloads are ``binary`` columns with a metadata struct (modality,
  byte length, content hash);
- decode / feature-extract run as Arrow-batched ``mapInPandas``
  operators — the image/audio libraries are NOT in this container, so
  the codec step is stubbed (deterministic fake via the real UDF
  plumbing, or ``NotImplementedError`` for true decoding), while the
  Spark-side schema, batching, and partitioning are real and tested.

Scale: payload bytes stay in executor-side Arrow batches end-to-end;
nothing is collected. ``spark.sql.files.maxPartitionBytes`` bounds the
bytes per task; feature extraction is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (per-modality fixed width).
FEATURE_DIM = 8
FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, content_md5 string, features array<double>"
)


def attach_fake_payload(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Derive a deterministic binary payload per document (stand-in for
    a real image/audio blob read from object storage): payload =
    md5(text) ⊕ repeated to 256 bytes. Schema/plumbing identical to a
    real ``spark.read.format("binaryFile")`` source."""
    payload = F.unhex(F.repeat(F.md5(F.col("text")), 16))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col("text")).alias("content_md5"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str) -> object:
    """True codec stub — the container has no image/audio libraries.

    On a production cluster this dispatches to PIL / torchaudio /
    pyav; the engine's contract is only that it runs inside the
    Arrow-batched operator below.
    """
    raise NotImplementedError(
        f"decoding modality={modality!r} requires codec libraries not present in this environment"
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Uses deterministic fake features (byte-histogram moments via md5
    chaining) so the plumbing — mapInPandas batch iteration, binary
    Arrow transfer, fixed-width array output — is fully exercised and
    testable without codecs.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                h = hashlib.md5(b).digest()
                feats.append([round(x / 255.0, 6) for x in h[:FEATURE_DIM]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_md5": [m["content_md5"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return payloads.mapInPandas(op, FEATURES_SCHEMA)
