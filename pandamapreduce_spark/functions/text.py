"""Text column functions: tokenization, n-gram shingling, normalization,
MinHash signatures, and md5-derived integer hashes.

The reference's tokenizer is its wordcount map callback
(``apps/wordcount/wc_api.cu:35-59``: split on non-alpha after
uppercasing, keep long words); these generalize it into reusable
column builders. Hashing uses md5 — available with identical output in
both Spark and DuckDB — so every derived operator (minhash, simhash,
fingerprints, LSH) is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenization ---------------------------------------------------------


#: Explicit ASCII whitespace class: Java's \s ([ \t\n\x0b\f\r]) and
#: RE2's \s ([ \t\n\f\r]) disagree on \x0b — spelling the class out
#: makes Spark and the DuckDB oracle tokenize identically.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]+"


def tokens(col: Column | str, pattern: str = WS_CLASS) -> Column:
    """Split into tokens, dropping empty strings (split artifacts)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), pattern), lambda t: t != "")


def tokens_sql(expr: str, pattern: str = WS_CLASS) -> str:
    return f"list_filter(string_split_regex(trim({expr}), '{pattern}'), t -> t <> '')"


# --- normalization --------------------------------------------------------


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for dedup: lowercase, non-alnum → space,
    collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " +", " "))


def normalize_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"


# --- n-gram shingles ------------------------------------------------------


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Built entirely from JVM expressions: split → sequence → transform,
    so it codegens; no Python crosses the row path.
    """
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def word_ngrams_sql(expr: str, n: int = 3) -> str:
    toks = tokens_sql(expr)
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"[array_to_string(({toks})[i:i+{n - 1}], ' ') for i in range(1, len({toks}) - {n} + 2)] "
        f"ELSE [] END)"
    )


# --- md5-derived hashes ---------------------------------------------------


def hex16(col: Column | str) -> Column:
    """First 16 hex digits of md5 as a non-negative bigint (63-bit)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hex16_sql(expr: str) -> str:
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


# --- MinHash --------------------------------------------------------------


def minhash_hashes(s: Column) -> tuple[Column, Column]:
    """The two 48-bit base hashes (h1, h2) of one shingle, from a
    single md5: hex digits [1..12] and [17..28]. The Carter-Wegman
    family is ``h_i = h1 + i·h2`` — one crypto hash per shingle
    instead of ``num_hashes``, and max value 12·2^48 < 2^52 stays
    exact in bigint AND double."""
    m = F.md5(s)
    h1 = F.conv(F.substring(m, 1, 12), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(m, 17, 12), 16, 10).cast("bigint")
    return h1, h2


def minhash_sig(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: array of ``num_hashes`` bigint minima.

    Hash family i over shingle s: ``h1(s) + i·h2(s)`` with h1/h2 the
    two 48-bit halves of md5(s) (Carter-Wegman universal hashing — the
    same construction Spark MLlib's MinHashLSH uses, but md5-seeded so
    the DuckDB oracle reproduces it bit-for-bit). The min over the
    doc's shingle set approximates a uniform permutation minimum.
    Empty shingle sets map to nulls so they never collide.
    """

    # Evaluation-count discipline: a higher-order function's ARGUMENT
    # is evaluated once per row, but its lambda BODY re-evaluates per
    # element — so md5 must never sit inside a lambda that runs once
    # per hash member (that shape costs 12 md5s per shingle; measured
    # 3-6x slower on LSH-heavy plans). Chain: md5 once per shingle →
    # (h1, h2) pair once per shingle → 12 mul-adds per shingle →
    # elementwise-min fold across shingles.
    def pair(m: Column) -> Column:
        h1 = F.conv(F.substring(m, 1, 12), 16, 10).cast("bigint")
        h2 = F.conv(F.substring(m, 17, 12), 16, 10).cast("bigint")
        return F.struct(h1.alias("a"), h2.alias("b"))

    pairs = F.transform(F.transform(shingles, F.md5), pair)
    fam = F.transform(
        pairs,
        lambda p: F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)), lambda i: p["a"] + i.cast("bigint") * p["b"]
        ),
    )
    init = F.array_repeat(F.lit(None).cast("bigint"), num_hashes)
    # least() skips nulls, so the all-null init is the fold identity
    sig = F.aggregate(fam, init, lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)))
    return F.when(F.size(shingles) > 0, sig).otherwise(init)


def minhash_sig_sql(shingles_expr: str, num_hashes: int) -> str:
    h1 = "cast(concat('0x', substr(md5(s), 1, 12)) as bigint)"
    h2 = "cast(concat('0x', substr(md5(s), 17, 12)) as bigint)"
    return (
        f"CASE WHEN len({shingles_expr}) > 0 THEN "
        f"[list_min([{h1} + i * {h2} for s in {shingles_expr}]) for i in range(0, {num_hashes})] "
        f"ELSE [cast(NULL as bigint) for i in range(0, {num_hashes})] END"
    )
