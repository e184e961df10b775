#!/usr/bin/env python
"""Materialize a K×-scaled PERF-ONLY copy of a driver fixture.

Usage: python3 scripts/make_scaled_fixture.py [K] [SRC] [DST]
Default: 10 /root/testdata/sf0.1 /root/repo/.bench/sf1

PERF-ONLY: this fixture exists for the sf1 scaling study (VERDICT r3
#4) — measuring how each headline query's runtime grows with rows.
It is NEVER used for correctness (oracles run on the driver-shipped
fixtures only; several oracles are fixture-pinned or exactness-regime
-scoped and would rightly fail here).

Scaling rules (K copies, copy k gets key offset k·10^8):
- region/nation: single copy (TPC-H dimension tables don't scale).
- customer/supplier/part/orders/lineitem: all keys offset per copy,
  so FK joins (orders⋈lineitem, orders⋈customer, lineitem⋈part/supp)
  keep their 1:N fan-outs instead of going K-way cartesian.
- events: event_id/user_id offset (10× users, same time range — per
  -window density grows 10×, the realistic shape for a busier feed).
- documents: doc_id offset; each copy's token stream is ROTATED by
  k·17 positions so copies are not near-duplicates of the original
  (replicating text verbatim would give every doc 9 near-dups and
  turn the LSH benches into a pathological dup-density study rather
  than a scaling study). Token counts and vocabulary are preserved.
- embeddings: vec_id offset, vectors unchanged (ANN cost depends on
  counts and dims, not values).
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10**8


def main() -> None:
    k_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.bench/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    def union_copies(body: str) -> str:
        return " UNION ALL ".join(body.format(off=k * OFF, k=k) for k in range(k_copies))

    t = lambda name: f"'{src}/{name}.parquet'"  # noqa: E731

    write("region", f"SELECT * FROM {t('region')}")
    write("nation", f"SELECT * FROM {t('nation')}")
    write(
        "customer",
        union_copies(
            f"SELECT c_custkey + {{off}} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM {t('customer')}"
        ),
    )
    write(
        "supplier",
        union_copies(
            f"SELECT s_suppkey + {{off}} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {t('supplier')}"
        ),
    )
    write(
        "part",
        union_copies(
            f"SELECT p_partkey + {{off}} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM {t('part')}"
        ),
    )
    write(
        "orders",
        union_copies(
            f"SELECT o_orderkey + {{off}} AS o_orderkey, o_custkey + {{off}} AS o_custkey, "
            f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {t('orders')}"
        ),
    )
    write(
        "lineitem",
        union_copies(
            f"SELECT l_orderkey + {{off}} AS l_orderkey, l_partkey + {{off}} AS l_partkey, "
            f"l_suppkey + {{off}} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
            f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM {t('lineitem')}"
        ),
    )
    write(
        "events",
        union_copies(
            f"SELECT event_id + {{off}} AS event_id, ts, user_id + {{off}} AS user_id, "
            f"event_type, value, props FROM {t('events')}"
        ),
    )
    write(
        "documents",
        union_copies(
            f"""
            SELECT doc_id + {{off}} AS doc_id,
                   CASE WHEN {{k}} = 0 THEN text ELSE array_to_string(
                     list_concat(
                       toks[1 + (({{k}} * 17) % greatest(len(toks), 1)):],
                       toks[:(({{k}} * 17) % greatest(len(toks), 1))]
                     ), ' ') END AS text,
                   lang, source,
                   CASE WHEN {{k}} = 0 THEN n_chars ELSE length(array_to_string(
                     list_concat(
                       toks[1 + (({{k}} * 17) % greatest(len(toks), 1)):],
                       toks[:(({{k}} * 17) % greatest(len(toks), 1))]
                     ), ' ')) END AS n_chars
            FROM (SELECT *, string_split(text, ' ') AS toks FROM {t('documents')})
            """
        ),
    )
    write(
        "embeddings",
        union_copies(
            f"SELECT vec_id + {{off}} AS vec_id, embedding, label FROM {t('embeddings')}"
        ),
    )


if __name__ == "__main__":
    main()
