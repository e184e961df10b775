"""Driver-style parity check for selected queries at a given sf_dir.

Usage: importable from the interactive session or
``python3 scripts/check_parity.py q59_gmm_em q64_... [sf_dir]``.
Mirrors tests/test_oracle_parity.canon (the driver's t2 shape).
"""

from __future__ import annotations

import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def make_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check(spark, name: str, sf_dir: str) -> bool:
    from pandamapreduce_spark.plans import REGISTRY

    sys.path.insert(0, "/root/repo")
    from tests.test_oracle_parity import canon

    q = REGISTRY[name]
    got = q.build(spark, sf_dir).toPandas()
    want = make_oracle(sf_dir).execute(q.oracle).df()
    ok_cols = sorted(got.columns) == sorted(want.columns)
    ok_rows = len(got) == len(want)
    g, w = canon(got), canon(want)
    ok_vals = g == w
    print(f"{name} @ {sf_dir}: cols={ok_cols} rows={ok_rows}({len(got)}/{len(want)}) vals={ok_vals}")
    if not ok_vals:
        for a, b in list(zip(g, w))[:4]:
            if a != b:
                print("  spark:", a)
                print("  oracle:", b)
    return ok_cols and ok_rows and ok_vals


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    from pandamapreduce_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    dirs = [a for a in sys.argv[1:] if a.startswith("/")] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    spark = get_spark()
    ok = True
    for d in dirs:
        for n in names:
            ok = check(spark, n, d) and ok
    sys.exit(0 if ok else 1)
