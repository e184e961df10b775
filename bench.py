#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries timed are the registry entries marked ``bench=True`` — the
reference-parity pipeline shapes (pricing summary, selective agg,
star join, wordcount, LSH dedup, ANN, terasort). Each timing includes
full execution to a count/collect action (no caching between queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pandamapreduce_spark.plans import REGISTRY
from pandamapreduce_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("pandamapreduce-bench")

    bench_queries = {name: q for name, q in REGISTRY.items() if q.bench}
    timings: dict[str, float] = {}

    # Warm the JVM/session on a trivial action so q1 isn't charged startup.
    spark.range(1).count()

    # best of two runs per query: the first run pays parquet footer
    # reads / JIT warmup and is noisy; min is the stable capability
    # number.
    for name, q in bench_queries.items():
        best = None
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            n = df.count()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # Tera pipeline at 1 GB (the reference's TPCx-HS-style metric,
    # apps/terasort/run.sh: HSph@SF = SF / hours, SF = bytes/1e10).
    from pandamapreduce_spark.operators import tera

    n_tera = int(os.environ.get("SPARK_GRAFT_TERA_RECORDS", 10_000_000))
    tera_sec = None
    # Best of 2, plus a third attempt if both runs look like they hit
    # host noise (this VM shows occasional multi-x CPU-steal outliers).
    for attempt in range(3):
        if attempt == 2 and tera_sec is not None and tera_sec < 8.0:
            break
        t0 = time.perf_counter()
        verdict = tera.teravalidate(tera.terasort(tera.teragen(spark, n_tera, 32), 32))
        el = round(time.perf_counter() - t0, 3)
        assert verdict["all_sorted"] and verdict["boundaries_ok"] and verdict["n_records"] == n_tera, verdict
        tera_sec = el if tera_sec is None or el < tera_sec else tera_sec
    timings["tera_1gb_pipeline"] = tera_sec
    print(f"# tera_1gb_pipeline: {tera_sec:.3f}s (HSph@SF={n_tera * 100 / 1e10 / (tera_sec / 3600):.2f})", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_elapsed",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
