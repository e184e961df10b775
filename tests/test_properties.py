"""Property-based tests (hypothesis): the engine's text/hash column
functions must agree with plain-Python reference implementations on
arbitrary inputs — catching tokenizer/shingle/minhash edge cases the
fixed corpus can't (empty strings, unicode, runs of separators).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pandamapreduce_spark.functions import minhash_sig, normalize_text, tokens, word_ngrams

# Engine tokenizer contract: whitespace = Java/RE2 ASCII \s
# ([ \t\n\x0b\f\r]). Python's re \s is wider (\x1c-\x1f, unicode
# spaces) — hypothesis found that divergence immediately, so the
# reference model below pins the ASCII semantics and the alphabet
# covers printable ASCII + Latin-1 + the ASCII whitespace set.
TEXTS = st.lists(
    st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            st.characters(min_codepoint=0xA1, max_codepoint=0x2FF),
            st.sampled_from("\t\n\x0b\f\r"),
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_tokens(s: str) -> list[str]:
    return [t for t in _WS.split(s.strip(" \t\n\x0b\f\r")) if t != ""]


def _py_ngrams(s: str, n: int = 3) -> list[str]:
    toks = _py_tokens(s)
    if len(toks) < n:
        return []
    out: list[str] = []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        if g not in out:
            out.append(g)
    return out


def _py_normalize(s: str) -> str:
    return re.sub(" +", " ", re.sub("[^a-z0-9]+", " ", s.lower())).strip()


def _py_minhash(shingles: list[str], k: int) -> list[int | None]:
    """Carter-Wegman family h_i = h1 + i*h2 from md5 halves — mirror of
    functions.text.minhash_sig."""
    if not shingles:
        return [None] * k
    hs = []
    for s in shingles:
        m = hashlib.md5(s.encode()).hexdigest()
        hs.append((int(m[0:12], 16), int(m[16:28], 16)))
    return [min(h1 + i * h2 for h1, h2 in hs) for i in range(k)]


@pytest.fixture(scope="module")
def run_exprs(spark):
    def run(texts: list[str]):
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        return df.select(
            tokens("text").alias("toks"),
            word_ngrams("text", 3).alias("grams"),
            normalize_text("text").alias("norm"),
            minhash_sig(word_ngrams("text", 3), 4).alias("sig"),
        ).collect()

    return run


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=TEXTS)
def test_text_functions_match_python_reference(run_exprs, texts):
    rows = run_exprs(texts)
    for t, row in zip(texts, rows):
        assert list(row.toks) == _py_tokens(t), repr(t)
        assert sorted(row.grams) == sorted(_py_ngrams(t)), repr(t)
        assert row.norm == _py_normalize(t), repr(t)
        assert list(row.sig) == _py_minhash(_py_ngrams(t), 4), repr(t)


# --- rank-selection percentiles vs numpy ----------------------------------

GROUPED_VALUES = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(min_value=-10_000, max_value=10_000)),
    min_size=1,
    max_size=60,
)


@pytest.fixture(scope="module")
def run_percentiles(spark):
    from pandamapreduce_spark.operators.rank_stats import exact_group_percentiles

    def run(pairs):
        df = spark.createDataFrame(pairs, "g string, v double")
        out = exact_group_percentiles(df, "g", "v", {"p10": 0.1, "p50": 0.5, "p95": 0.95})
        return {r.g: (r.p10, r.p50, r.p95) for r in out.collect()}

    return run


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=GROUPED_VALUES)
def test_rank_selection_percentiles_match_numpy(run_percentiles, pairs):
    """exact_group_percentiles (window rank-selection) must equal
    numpy's linear-interpolation quantile on every group, for any
    group sizes including 1 and ties."""
    import numpy as np

    pairs = [(g, float(v)) for g, v in pairs]
    got = run_percentiles(pairs)
    for g in {g for g, _ in pairs}:
        vals = np.array([v for gg, v in pairs if gg == g])
        want = tuple(float(np.quantile(vals, p, method="linear")) for p in (0.1, 0.5, 0.95))
        assert got[g] == pytest.approx(want, rel=1e-12, abs=1e-9), (g, got[g], want)


def test_pii_scrub_redaction_semantics(spark):
    """The q98 regexp program must actually redact real PII shapes —
    the synthetic corpus is digit-free, so the oracle check there only
    proves the no-false-positive path; this pins the positive path."""
    from pandamapreduce_spark.plans.pipeline import PII_DIGITRUN, PII_EMAIL, PII_IPV4

    rows = [
        ("mail me: jane.doe+x@sub.example.co.uk today", "mail me: <EMAIL> today", 1, 0, 0),
        ("host 192.168.100.2 and 10.0.0.1 up", "host <IP> and <IP> up", 0, 2, 0),
        ("acct 1234567890 ref 987654321", "acct <NUM> ref <NUM>", 0, 0, 2),
        ("12345678 is too short", "12345678 is too short", 0, 0, 0),
        ("e@b.io at 1.2.3.4 code 123456789", "<EMAIL> at <IP> code <NUM>", 1, 1, 1),
    ]
    df = spark.createDataFrame([(t,) for t, *_ in rows], "text string")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace("text", PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"),
        PII_DIGITRUN,
        "<NUM>",
    )
    got = df.select(
        "text",
        scrubbed.alias("scrubbed"),
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("ne"),
        F.regexp_count("text", F.lit(PII_IPV4)).alias("ni"),
        F.regexp_count("text", F.lit(PII_DIGITRUN)).alias("nd"),
    ).collect()
    want = {t: (s, ne, ni, nd) for t, s, ne, ni, nd in rows}
    for r in got:
        assert (r.scrubbed, r.ne, r.ni, r.nd) == want[r.text], r.text
