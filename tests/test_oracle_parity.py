"""Driver-style correctness gate, run locally at sf0.001: every
oracle-bearing query in the registry must match DuckDB on row count,
column names, and canonicalized values (the driver's t2 check shape).
"""

from __future__ import annotations

import math

import pytest

from pandamapreduce_spark.plans import REGISTRY

from tests.conftest import SF_DIR

ORACLE_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is None]


def canon(df, float_places: int = 6):
    """Canonicalize a pandas frame: columns sorted by name, rows sorted,
    floats rounded, everything stringified."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{round(v, float_places):.{float_places}f}")
            elif isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
                row.append(str([x for x in v]))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return rows


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle, name):
    q = REGISTRY[name]
    got = q.build(spark, SF_DIR).toPandas()
    want = oracle.execute(q.oracle).df()

    assert list(sorted(got.columns)) == list(sorted(want.columns)), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    g, w = canon(got), canon(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]
    assert g == w, f"{name}: first differing rows {[(g[i], w[i]) for i in mism]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.build(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.schema == q.build(spark, SF_DIR).schema
