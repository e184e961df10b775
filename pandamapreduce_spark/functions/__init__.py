"""Engine column-function library (JVM-side builders, no Python UDFs).

Everything here returns pyspark Columns built from built-in functions,
so the hot path stays inside whole-stage codegen. Each helper has a
DuckDB-SQL twin used by the oracle queries (suffix ``_sql``).
"""

from pandamapreduce_spark.functions.text import (
    tokens,
    tokens_sql,
    word_ngrams,
    word_ngrams_sql,
    normalize_text,
    normalize_text_sql,
    minhash_hashes,
    minhash_sig,
    minhash_sig_sql,
    hex16,
    hex16_sql,
)
from pandamapreduce_spark.functions.vector import (
    dot,
    dot_sql,
    l2norm,
    cosine,
    cosine_sql,
)

__all__ = [
    "tokens",
    "tokens_sql",
    "word_ngrams",
    "word_ngrams_sql",
    "normalize_text",
    "normalize_text_sql",
    "minhash_hashes",
    "minhash_sig",
    "minhash_sig_sql",
    "hex16",
    "hex16_sql",
    "dot",
    "dot_sql",
    "l2norm",
    "cosine",
    "cosine_sql",
]
