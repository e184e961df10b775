#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

For every bench-marked registry query (or an explicit name list):
- capture ``explain("formatted")`` to plans/<tag>/<name>_<phase>.txt
- time N runs of the bench's own action (df.count()) and of the noop
  sink (full-column materialization, guide §1.4), labeled via
  setJobDescription
- print a compact JSON summary (stdout, one line) and a per-query
  table (stderr)

Usage: profile_bench.py [--names q1,q2] [--runs 2] [--phase before]
                        [--tag r10] [--sf-dir DIR] [--no-noop]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandamapreduce_spark.plans import REGISTRY
from pandamapreduce_spark.session import get_spark


def plan_stats(plan: str) -> dict:
    """Plan-shape counters the optimization guide says to watch."""
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "bnl_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "python_evals": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapCoGroupsInPandas|FlatMapGroupsInPandas|MapInArrow", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--phase", default="before")
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--no-explain", action="store_true")
    args = ap.parse_args()

    names = [n for n in args.names.split(",") if n] or [n for n, q in REGISTRY.items() if q.bench]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown query names: {unknown}")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("profile-bench")
    spark.range(1).count()  # warm

    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        rec: dict = {}
        if not args.no_explain:
            df = q.build(spark, args.sf_dir)
            jvm = spark.sparkContext._jvm
            plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.phase}.txt"), "w") as fh:
                fh.write(plan)
            rec.update(plan_stats(plan))
        counts = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} count run{i}")
            t0 = time.perf_counter()
            nrows = q.build(spark, args.sf_dir).count()
            counts.append(round(time.perf_counter() - t0, 3))
        rec["count_s"] = counts
        rec["rows"] = nrows
        if not args.no_noop:
            noops = []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"{name} noop run{i}")
                t0 = time.perf_counter()
                q.build(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                noops.append(round(time.perf_counter() - t0, 3))
            rec["noop_s"] = noops
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"# {name}: count={rec['count_s']} noop={rec.get('noop_s')} rows={nrows} "
              f"ex={rec.get('exchanges')} smj={rec.get('sort_merge_joins')} "
              f"bhj={rec.get('broadcast_joins')} py={rec.get('python_evals')}",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "phase": args.phase, "queries": out}))
    for sq in spark.streams.active:
        try:
            sq.stop()
        except Exception:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
