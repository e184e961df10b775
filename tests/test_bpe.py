"""q204 BPE merge learning vs a pure-Python reference implementation.

Two layers: (1) the wrapped-symbol ``replace()`` trick is proven equal
to the explicit leftmost-non-overlapping merge scan on adversarial
sequences (overlapping pairs, merged-symbol collisions); (2) the full
Spark lane reproduces a from-scratch Python BPE (Sennrich et al. 2016
semantics) on the real sf0.001 corpus, merge table equal to the row.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from pandamapreduce_spark.plans import REGISTRY
from pandamapreduce_spark.plans.training import BPE_MERGES

from tests.conftest import SF_DIR


# --- pure-Python reference -------------------------------------------------


def merge_scan(syms: list[str], l: str, r: str) -> list[str]:
    """The definitional BPE application: leftmost, non-overlapping."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def wrapped_replace(syms: list[str], l: str, r: str) -> list[str]:
    """The engine's form: one string replace over ``(s1)(s2)...``."""
    s = "".join(f"({x})" for x in syms)
    s = s.replace(f"({l})({r})", f"({l}{r})")  # str.replace: leftmost, non-overlap
    return s[1:-1].split(")(") if s else []


def py_bpe(word_counts: dict[str, int], k: int) -> tuple[list[tuple], dict[str, list[str]]]:
    """Returns (merge table, final per-word symbol sequences) — the
    sequences are the from-scratch ENCODE reference for q206."""
    seqs: dict[str, list[str]] = {w: list(w) for w in word_counts}
    merges = []
    for rnd in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + c
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, c, l + r))
        for w in seqs:
            seqs[w] = merge_scan(seqs[w], l, r)
    return merges, seqs


# --- layer 1: the replace trick --------------------------------------------


@pytest.mark.parametrize(
    "syms,l,r",
    [
        (list("aaaa"), "a", "a"),  # overlapping run: must merge (0,1),(2,3)
        (list("aaa"), "a", "a"),  # odd run: (0,1) merges, trailing a stays
        (list("ababa"), "a", "b"),  # alternating
        (["ab", "a", "b"], "a", "b"),  # existing merged symbol 'ab' must NOT match
        (["a", "ab", "b"], "a", "b"),  # pair split by a merged symbol
        (["x", "a", "a", "a", "y"], "a", "a"),
        (list("abcabc"), "b", "c"),
        (["aa", "aa", "aa"], "aa", "aa"),  # multi-char symbols, overlapping run
    ],
)
def test_wrapped_replace_equals_merge_scan(syms, l, r):
    assert wrapped_replace(syms, l, r) == merge_scan(syms, l, r)


def test_space_join_would_be_wrong():
    """Documents WHY symbols are paren-wrapped: with space-joined
    symbols, adjacent matches share the delimiter and a plain replace
    under-merges ``a a a a`` (one merge instead of two)."""
    s = " a a a a "
    merged = s.replace(" a a ", " aa ")
    assert merged != " aa aa "  # the space form loses the second merge
    assert wrapped_replace(list("aaaa"), "a", "a") == ["aa", "aa"]


# --- layer 2: the full lane vs from-scratch Python --------------------------


def _corpus_counts() -> tuple[dict[str, int], dict[int, list[str]]]:
    """(word-type counts, per-doc normalized word lists) from sf0.001."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    counts: dict[str, int] = {}
    doc_words: dict[int, list[str]] = {}
    for doc_id, text in rows:
        norm = re.sub(" +", " ", re.sub("[^a-z0-9]+", " ", text.lower())).strip()
        words = [w for w in norm.split(" ") if w]
        doc_words[doc_id] = words
        for w in words:
            counts[w] = counts.get(w, 0) + 1
    return counts, doc_words


def test_q204_equals_python_reference(spark):
    counts, _ = _corpus_counts()
    expect, _ = py_bpe(counts, BPE_MERGES)
    got = [
        (r["merge_round"], r["lhs"], r["rhs"], r["pair_count"], r["new_symbol"])
        for r in REGISTRY["q204_bpe_merges"].build(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_q206_encode_equals_python_reference(spark):
    """q206 per-document encode vs the from-scratch reference: learn
    merges in Python, apply them per word via the definitional merge
    scan, then aggregate per document."""
    counts, doc_words = _corpus_counts()
    _, seqs = py_bpe(counts, BPE_MERGES)
    expect = {
        doc_id: (
            len(words),
            sum(len(w) for w in words),
            sum(len(seqs[w]) for w in words),
        )
        for doc_id, words in doc_words.items()
        if words  # wordless docs don't survive the encode join
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_word_chars"], r["n_bpe_tokens"])
        for r in REGISTRY["q206_bpe_encode"].build(spark, SF_DIR).collect()
    }
    assert got == expect


def test_q208_pack_equals_python_reference(spark):
    """q208 end-to-end vs from-scratch Python: learn merges, encode
    each doc, prefix-sum token counts in doc_id order, assign packs —
    including the distributed-prefix invariance (the reference prefix
    is a plain sequential scan)."""
    from pandamapreduce_spark.plans.training import PACK_TOKENS

    counts, doc_words = _corpus_counts()
    _, seqs = py_bpe(counts, BPE_MERGES)
    expect = {}
    offset = 0
    for doc_id in sorted(doc_words):
        n = sum(len(seqs[w]) for w in doc_words[doc_id])
        first = offset // PACK_TOKENS
        last = (offset + max(n, 1) - 1) // PACK_TOKENS
        expect[doc_id] = (n, offset, first, last, last - first + 1)
        offset += n
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["pack_first"],
            r["pack_last"],
            r["n_packs"],
        )
        for r in REGISTRY["q208_bpe_pack"].build(spark, SF_DIR).collect()
    }
    assert got == expect


# --- layer 1b: property form (hypothesis) -----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_SYM = st.sampled_from(["a", "b", "c", "ab", "bc", "aa", "abc", "0", "a0"])


@settings(max_examples=300, deadline=None)
@given(syms=st.lists(_SYM, max_size=14), l=_SYM, r=_SYM)
def test_wrapped_replace_equals_merge_scan_property(syms, l, r):
    """For ANY symbol sequence over paren-free symbols and ANY merge
    pair, the wrapped one-call replace equals the definitional
    leftmost non-overlapping scan — the paren delimiters make symbol
    boundaries unambiguous ('(ab)(c)' never matches '(a)(bc)'), so
    the equivalence is structural, not fixture luck."""
    assert wrapped_replace(syms, l, r) == merge_scan(syms, l, r)
