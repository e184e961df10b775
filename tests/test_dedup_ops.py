"""minhash_band_pairs operator: synthetic near-dups, bucket cap, and
the LCG jump property."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pandamapreduce_spark.operators.dedup_ops import minhash_band_pairs
from pandamapreduce_spark.operators.tera import _A, _C, _M, lcg_skip


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_finds_synthetic_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again every single day"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1
        (3, "completely different words about spark query engines and shuffles"),
    ]
    pairs = {(r.doc_a, r.doc_b) for r in minhash_band_pairs(_docs(spark, rows)).collect()}
    assert (1, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_bucket_cap_drops_boilerplate(spark):
    boiler = "standard license header apache version two point zero all rights reserved here"
    rows = [(i, boiler) for i in range(20)] + [(100, "unique interesting document text body with many novel words here")]
    uncapped = minhash_band_pairs(_docs(spark, rows)).count()
    assert uncapped == 20 * 19 // 2  # full clique
    capped = minhash_band_pairs(_docs(spark, rows), max_bucket_size=10).count()
    assert capped == 0  # the boilerplate clique is dropped entirely


def test_registry_lsh_queries_are_capped():
    """The VERIFIED q32/q33/q80 plans must run with the skew cap on and
    mirror it into the oracle (VERDICT r1 'What's wrong' #2)."""
    from pandamapreduce_spark.plans import REGISTRY
    from pandamapreduce_spark.plans.dedup import MAX_BUCKET

    for name in ("q32_minhash_lsh_candidates", "q33_neardup_verified", "q80_clean_corpus"):
        assert f"BETWEEN 2 AND {MAX_BUCKET}" in REGISTRY[name].oracle, name


def test_lcg_jump_equals_sequential():
    @settings(max_examples=50, deadline=None)
    @given(n=st.integers(min_value=0, max_value=5000))
    def check(n):
        x = 0
        for _ in range(n):
            x = (_A * x + _C) % _M
        assert lcg_skip(n) == x

    check()


def test_corpus_merge_exercises_every_action(spark, tmp_path):
    """The shipped fixtures never produce q124's dropped_dup branch
    (no exact-duplicate pair inside the delta), so build a synthetic
    corpus that hits ALL five actions and check the Spark result
    against the same DuckDB oracle on the same parquet — full
    branch-coverage parity, not just the fixture's subset.

    ids ≡ 4 (mod 5) are delta (q116's split); the two near-dup
    families use disjoint vocabularies so they can't cross-match.
    - 4/10: near-dup pair, delta longer → 4 admitted, base 10 superseded
    - 14/15: near-dup pair, base longer → 14 dropped_inferior, 15 retained
    - 19/24: exact dups in delta        → 19 admitted (min id), 24 dropped_dup
    - 11: untouched base → retained; 29: novel delta → admitted
    """
    import duckdb
    import pandas as pd

    from pandamapreduce_spark.plans import REGISTRY

    fam1 = "the quick brown fox jumps over the lazy dog again and again " * 4
    fam2 = "storage engines compact immutable segments into sorted runs nightly " * 4
    uniq = "completely different content about vectorized execution kernels " * 4
    exact = "identical delta document body repeated verbatim for the test " * 4
    rows = [
        (10, fam1),  # base, loses to 4
        (15, fam2 + " extra base words make this the longer winner"),  # base, beats 14
        (11, uniq + " untouched"),
        (4, fam1 + " longer delta version wins the keep-best comparator"),
        (14, fam2),  # delta, loses to 15
        (19, exact),
        (24, exact),  # exact dup of 19 inside the delta
        (29, "a novel delta document with no relatives anywhere " * 5),
    ]
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "syn",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    d = str(tmp_path)
    df.to_parquet(f"{d}/documents.parquet")

    got = REGISTRY["q124_corpus_merge"].build(spark, d).toPandas()
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        want = con.execute(REGISTRY["q124_corpus_merge"].oracle).df()
    finally:
        con.close()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want[g.columns].sort_values("doc_id").reset_index(drop=True)
    assert g.astype(str).equals(w.astype(str)), f"\n{g}\nvs\n{w}"

    actions = dict(zip(g["doc_id"], g["action"]))
    assert actions[4] == "admitted" and actions[10] == "superseded"
    assert actions[14] == "dropped_inferior" and actions[15] == "retained"
    assert actions[19] == "admitted" and actions[24] == "dropped_dup"
    assert actions[11] == "retained" and actions[29] == "admitted"
