"""The MapReduce operator spine: the reference's 9-phase pipeline
(``src/panda/PandaMapReduceJob.cpp:885-955``) as one Spark construct.

Reference callback surface (``include/PandaAPI.h:29-51``):
- ``map(key, val) -> emits 0..n (k2, v2)``  (UDTF shape)
- ``combiner(key, vals) -> partial value``   (map-side, per task)
- ``reduce(key, vals) -> value``             (final, post-shuffle)
- ``compare(a, b)``                          (key ordering)
- partitioner: hash (``src/panda/Partitioner.cpp:7-19``) or range
  (``apps/terasort/TeraSortPartitioner.cpp:24-33``)

Spark restatement: ``flatMap → [local combine] → partitionBy(shuffle)
→ group → reduce``. Spark's shuffle machinery replaces the reference's
emit arenas (O5), MPI transport (O13), and nested-loop grouping
(O7/O8/O14); stages split exactly at the shuffle.

Scale notes: the combine path keeps a per-partition dict — bounded by
distinct-keys-per-partition, the same memory posture as the
reference's in-arena combiner. For associative numeric reductions
prefer the DataFrame aggregate surface (``plans.relational``), which
gets Tungsten spilling; this spine exists for arbitrary Python
callbacks (the reference's whole API).
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.rdd import RDD, portable_hash

MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]
ReduceFn = Callable[[Any, list[Any]], Any]


def elf_hash(key: Any) -> int:
    """The reference's default partitioner hash (PJW/ELF over key
    bytes, ``src/panda/Partitioner.cpp:7-19``), for byte-compatible
    partition placement when porting a reference job. Any callable is
    accepted as ``partition_f``; Spark's ``portable_hash`` is the
    default — placement does not affect results (asserted by the
    partitioning-invariance tests)."""
    if isinstance(key, str):
        data = key.encode()
    elif isinstance(key, (bytes, bytearray)):
        data = bytes(key)
    else:
        data = repr(key).encode()
    h = 0
    for b in data:
        h = ((h << 4) + b) & 0xFFFFFFFF
        g = h & 0xF0000000
        if g:
            h ^= g >> 24
        h &= ~g & 0xFFFFFFFF
    return h


def map_reduce(
    rdd: RDD,
    map_f: MapFn,
    reduce_f: ReduceFn,
    combine_f: ReduceFn | None = None,
    num_reducers: int | None = None,
    partition_f: Callable[[Any], int] | None = None,
    sort_keys: bool = False,
) -> RDD:
    """Run the full map → combine → shuffle → group → reduce pipeline.

    Args mirror the reference's ``job_configuration``
    (``include/Panda.h:124-143``): ``num_reducers`` = num_reducers,
    ``combine_f`` = local_combiner flag + callback, ``partition_f`` =
    Partitioner::GetHash, ``sort_keys`` = ordered delivery (terasort's
    framework-grouped ordering, SURVEY A5).

    Returns an RDD of (key, reduced_value).
    """
    num = num_reducers or rdd.context.defaultParallelism
    part = partition_f or portable_hash

    mapped = rdd.flatMap(lambda kv: map_f(kv[0], kv[1]))

    if combine_f is not None:
        # Local (map-side) combine: the reference's O6. Grouping within
        # the partition, one partial per (partition, key).
        def local_combine(it: Iterable[tuple[Any, Any]]) -> Iterable[tuple[Any, Any]]:
            buf: dict[Any, list[Any]] = defaultdict(list)
            for k, v in it:
                buf[k].append(v)
            for k, vs in buf.items():
                yield k, combine_f(k, vs)

        mapped = mapped.mapPartitions(local_combine)

    shuffled = mapped.partitionBy(num, part)

    def reduce_partition(it: Iterable[tuple[Any, Any]]) -> Iterable[tuple[Any, Any]]:
        buf: dict[Any, list[Any]] = defaultdict(list)
        for k, v in it:
            buf[k].append(v)
        keys = sorted(buf) if sort_keys else buf
        for k in keys:
            yield k, reduce_f(k, buf[k])

    return shuffled.mapPartitions(reduce_partition, preservesPartitioning=True)


def map_reduce_sorted(
    rdd: RDD,
    num_partitions: int,
    key_f: Callable[[Any], Any] | None = None,
) -> RDD:
    """Total-order delivery: range-partition + in-partition sort — the
    terasort shape (``TeraSort.scala:60-63``). ``sortByKey`` samples
    key bounds (the reference's O11 prefix-split, generalized) and
    range-partitions so partition i's keys all precede partition
    i+1's. Map/reduce identity, the 'query' is purely ordered placement
    (reference A5: callbacks are no-ops,
    ``apps/terasort/terasort_api.cu:20-48``)."""
    kv = rdd.map(lambda kv: (key_f(kv) if key_f else kv[0], kv))
    return kv.sortByKey(numPartitions=num_partitions).values()
