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

    Uses deterministic fake features so the plumbing — mapInPandas
    batch iteration, binary Arrow transfer, fixed-width array output —
    is fully exercised and testable without codecs. The keystream
    contract (same as ``sample_frames``/``resize_images``): feature j =
    byte j of md5(hex(payload[:16]) || ':features'), scaled to [0, 1].
    Seeding from the ACTUAL payload bytes received in the Arrow batch
    means a corrupted binary transfer fails the oracle, not just a
    wrong row count; each division x/255.0 is exact in IEEE double, so
    the SQL twin reproduces values bitwise.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                h = hashlib.md5((b[:16].hex() + ":features").encode()).digest()
                feats.append([x / 255.0 for x in h[:FEATURE_DIM]])
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


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary, modality string, content_md5 string"
RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<modality:string, n_bytes:int, content_md5:string, width:int, height:int>"
)


def sample_frames(payloads: DataFrame, num_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling over video payloads: one input row → ``num_frames``
    frame rows (1:N Arrow-batched flatMap — the UDTF shape of the
    reference's map emit, ``include/PandaAPI.h:39``).

    DETERMINISTIC FAKE codec: frame i = md5-keystream of
    ``content_md5 || ':' || i`` expanded to ``frame_bytes`` (a real
    deployment swaps in pyav keyframe extraction inside the same
    operator — see ``decode_payload``). The expansion contract is
    mirrored by the q72 DuckDB oracle, so the bytes built here are
    verified end-to-end.
    """
    import hashlib as _hl

    reps = -(-frame_bytes // 16)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame", "modality", "content_md5")}
            for doc_id, meta in zip(pdf["doc_id"], pdf["meta"]):
                seed = meta["content_md5"]
                for i in range(num_frames):
                    fseed = _hl.md5(f"{seed}:{i}".encode()).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append((bytes.fromhex(fseed) * reps)[:frame_bytes])
                    out["modality"].append(meta["modality"])
                    out["content_md5"].append(seed)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(op, FRAMES_SCHEMA)


def resize_images(payloads: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Resize plumbing for image payloads: binary in → binary out with
    updated dimensioned metadata, 1:1 over Arrow batches, no shuffle.

    DETERMINISTIC FAKE codec: resized payload = md5-keystream of
    ``content_md5 || ':resize:' || WxH`` expanded to width·height bytes
    (one byte per pixel; a real deployment swaps in PIL's
    ``Image.resize`` inside this same operator).
    """
    import hashlib as _hl

    n_out = width * height
    reps = -(-n_out // 16)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id, meta in zip(pdf["doc_id"], pdf["meta"]):
                seed = _hl.md5(f"{meta['content_md5']}:resize:{width}x{height}".encode()).hexdigest()
                body = (bytes.fromhex(seed) * reps)[:n_out]
                rows["doc_id"].append(doc_id)
                rows["payload"].append(body)
                rows["meta"].append(
                    {
                        "modality": meta["modality"],
                        "n_bytes": len(body),
                        "content_md5": meta["content_md5"],
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(op, RESIZED_SCHEMA)
