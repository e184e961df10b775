"""Tera pipeline: teragen → terasort → teravalidate, Spark-native.

Reference semantics (studied, re-implemented from the published
algorithm — the reference itself bundles the ASF-licensed Hadoop
algorithm and the public spark-terasort Scala spec):

- **teragen** (``apps/terasort/teragen_api.cu:85-124``, Hadoop
  TeraGen): record r uses the 128-bit LCG ``X' = (A*X + C) mod 2^128``
  (L'Ecuyer constants, ``Random16.cpp``) advanced r+1 steps from seed
  0 via O(log n) jump; record = 10-byte key (bytes 0-9 of rand) +
  90-byte framed value (breaks 0x00 0x11, 32 ASCII hex digits of the
  record number, 0x88 0x99 0xAA 0xBB, 12×4 repeated rand hex chars,
  trailer 0xCC 0xDD 0xEE 0xFF) — ``generateRecord``,
  ``teragen_api.cu:28-66``.
- **terasort** (``apps/terasort/terasort_main.cpp:103``,
  ``TeraSort.scala:60-63``): total order by unsigned-lexicographic
  byte key = range partition + in-partition sort.
- **teravalidate** (``TeraValidate.scala:64-125``): per-partition
  in-order assertion + min/max boundary non-overlap across partitions
  + global count + checksum preservation.

Scale: teragen is embarrassingly parallel (per-partition LCG jump —
the reference's determinism-by-construction trick, SURVEY §5.1);
terasort's only shuffle is the range exchange; teravalidate reduces
~10 summary rows per partition.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# L'Ecuyer 128-bit LCG constants (public: Mathematics of Computation 68,
# pp. 249-260; used by sortbenchmark.org gensort and Hadoop teragen).
_A = 0x2360ED051FC65DA44385DF649FCCF645
_C = 0x4A696D47726179524950202020202001
_M = 1 << 128

KEY_LEN = 10
VALUE_LEN = 90
RECORD_LEN = KEY_LEN + VALUE_LEN

_HEX = b"0123456789abcdef"


def lcg_skip(n: int, x: int = 0) -> int:
    """Advance the LCG ``n`` steps from state ``x`` in O(log n) by
    iterated squaring of the affine map (f^2 = (a², a·c + c))."""
    a, c = _A, _C
    while n:
        if n & 1:
            x = (a * x + c) % _M
        c = (a * c + c) % _M
        a = (a * a) % _M
        n >>= 1
    return x


#: byte-value → that byte repeated 4× (the filler expansion), so the
#: hot path is 12 table lookups instead of a 48-iteration genexpr
_EXP = [bytes((c,)) * 4 for c in range(256)]


def _record(rand: int, record_number: int) -> tuple[bytes, bytes]:
    """Build one 100-byte record: (10-byte key, 90-byte value)."""
    rb = rand.to_bytes(16, "big")
    rand_hex = rb.hex().encode()  # == b"%032x" % rand, at C speed
    filler = b"".join(_EXP[c] for c in rand_hex[20:32])
    value = b"".join(
        (b"\x00\x11", b"%032x" % record_number, b"\x88\x99\xaa\xbb", filler, b"\xcc\xdd\xee\xff")
    )
    return rb[:KEY_LEN], value


def generate_partition(first_record: int, num_records: int) -> Iterator[tuple[bytes, bytes]]:
    """Deterministic per-partition generator (seeded skip-ahead): the
    reference's A4 pattern — output is invariant to partitioning."""
    x = lcg_skip(first_record)
    for r in range(first_record, first_record + num_records):
        x = (_A * x + _C) % _M
        yield _record(x, r)


TERA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), False),
        T.StructField("value", T.BinaryType(), False),
    ]
)


def teragen(spark: SparkSession, num_records: int, num_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic synthetic source (SURVEY A4).

    Arrow path: one ``mapInPandas`` task per partition yields bytes
    columns in 64k-record batches — no per-row pickling. Each
    partition jumps the LCG to its first record (O(log n)), so output
    is invariant to ``num_partitions``.
    """
    import pandas as pd

    parts = num_partitions or spark.sparkContext.defaultParallelism
    per = num_records // parts
    extra = num_records % parts

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for idx in pdf["id"]:
                idx = int(idx)
                first = idx * per + min(idx, extra)
                n = per + (1 if idx < extra else 0)
                it = generate_partition(first, n)
                while True:
                    chunk = list(itertools.islice(it, 65536))
                    if not chunk:
                        break
                    yield pd.DataFrame(
                        {"key": [k for k, _ in chunk], "value": [v for _, v in chunk]}
                    )

    return spark.range(0, parts, 1, parts).mapInPandas(gen, TERA_SCHEMA)


def terasort(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Total-order sort by unsigned-lexicographic binary key
    (``TeraSort.scala:60-63``): range-partition + sort within
    partitions. Catalyst compiles ``repartitionByRange + sortWithin``
    to a range exchange with sampled bounds — the distributed
    equivalent of the reference's 7-byte-prefix partitioner (O11)."""
    if num_partitions:
        return df.repartitionByRange(num_partitions, "key").sortWithinPartitions("key")
    return df.repartitionByRange("key").sortWithinPartitions("key")


def write_tera_files(df: DataFrame, out_dir: str) -> int:
    """Sink: write (key, value) rows as raw 100-byte-record files, one
    per partition (the reference's ``INPUT<rank>`` file sink,
    ``apps/terasort/teragen_api.cu:104-121``). Returns file count.

    Local-filesystem implementation (each task writes its own file);
    on a cluster the same pattern targets a shared store.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(idx: int, it) -> "Iterator[tuple[int, int]]":
        n = 0
        path = os.path.join(out_dir, f"part-{idx:05d}.tera")
        with open(path, "wb") as f:
            for row in it:
                f.write(bytes(row[0]) + bytes(row[1]))
                n += 1
        if n == 0:
            os.remove(path)
        yield idx, n

    counts = df.rdd.mapPartitionsWithIndex(write_partition).collect()
    return sum(1 for _, n in counts if n > 0)


def teravalidate_partitions(df: DataFrame) -> DataFrame:
    """Per-partition validation summaries (``TeraValidate.scala:64-108``):
    record count, min/max key, sortedness, crc32 checksum sum.

    Single streaming pass per partition via ``mapInPandas`` (one
    summary row out per partition, data read in place — a
    window/groupBy formulation would reshuffle the whole dataset). The
    sortedness check is numpy-vectorized: fixed 10-byte keys reshape to
    (n, 10) uint8 and compare as (big-endian u64, u16) pairs; only the
    crc32 sum is a per-row loop (zlib C call).
    """
    import zlib
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    tagged = df.select(F.spark_partition_id().alias("pid"), "key", "value")

    def summarize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = -1
        n = 0
        in_order = True
        first: bytes | None = None
        prev_last: bytes | None = None
        lo_key: bytes | None = None
        hi_key: bytes | None = None
        crc = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0])
            keys = [bytes(k) for k in pdf["key"]]
            # incremental form: crc32(v, crc32(k)) == crc32(k || v)
            crc += sum(zlib.crc32(bytes(v), zlib.crc32(k)) for k, v in zip(keys, pdf["value"]))
            n += len(keys)
            if prev_last is not None and keys[0] < prev_last:
                in_order = False
            a = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, KEY_LEN)
            hi = np.ascontiguousarray(a[:, :8]).view(">u8").ravel()
            lo = np.ascontiguousarray(a[:, 8:]).view(">u2").ravel()
            if not bool(np.all((hi[1:] > hi[:-1]) | ((hi[1:] == hi[:-1]) & (lo[1:] >= lo[:-1])))):
                in_order = False
            # batch min/max from the numpy view (exact even if unsorted)
            order = np.lexsort((lo, hi))
            imin, imax = int(order[0]), int(order[-1])
            lo_key = keys[imin] if lo_key is None or keys[imin] < lo_key else lo_key
            hi_key = keys[imax] if hi_key is None or keys[imax] > hi_key else hi_key
            if first is None:
                first = keys[0]
            prev_last = keys[-1]
        if pid >= 0:
            yield pd.DataFrame(
                {
                    "partition_id": [pid],
                    "n_records": [n],
                    "min_key": [lo_key],
                    "max_key": [hi_key],
                    "in_order": [in_order],
                    "checksum": [Decimal(crc)],
                }
            )

    schema = "partition_id int, n_records long, min_key binary, max_key binary, in_order boolean, checksum decimal(38,0)"
    return tagged.mapInPandas(summarize, schema)


def teravalidate(sorted_df: DataFrame) -> dict:
    """Global validation verdict (``TeraValidate.scala:110-125``):
    partitions internally sorted, partition boundaries non-overlapping,
    plus global count/checksum for comparison with the input."""
    parts = [r for r in teravalidate_partitions(sorted_df).collect() if r.n_records > 0]
    parts.sort(key=lambda r: r.partition_id)
    boundaries_ok = all(
        bytes(parts[i].max_key) <= bytes(parts[i + 1].min_key) for i in range(len(parts) - 1)
    )
    return {
        "n_records": sum(r.n_records for r in parts),
        "checksum": int(sum(int(r.checksum) for r in parts)),
        "all_sorted": all(r.in_order for r in parts),
        "boundaries_ok": boundaries_ok,
        "n_partitions": len(parts),
    }
