"""Text-analysis query surface over the ``documents`` table.

Reference parity: wordcount map/combine/reduce
(``apps/wordcount/wc_api.cu:35-59`` tokenize + length filter,
``:89-96`` combiner, ``:126-134`` reduce; driver uppercases input,
``apps/wordcount/wc_main.cpp:43-44``). The reference keeps words where
``p - start > 6`` with ``ws`` counting the terminator, i.e. ≥ 6
letters — we pin ``length(w) >= 6`` (documented decision, SURVEY §7.3).

Extensions (training-data-pipeline operators): token counting, quality
scoring, language-ID heuristic, document fingerprinting — all built
from JVM expressions with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandamapreduce_spark.catalog import load_table
from pandamapreduce_spark.functions import tokens, tokens_sql, word_ngrams, word_ngrams_sql, normalize_text, normalize_text_sql
from pandamapreduce_spark.plans.registry import query

#: language marker stopwords for the lang-id heuristic; order = tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "de", "y", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "du"),
    "zh": ("de", "shi", "le", "zai", "he", "you"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _wordcount_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.upper(F.col("text")), "[^A-Z]+")).alias("word"))
        .where(F.length("word") >= 6)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_WORDCOUNT_ORACLE_BASE = """
    SELECT word, count(*) AS cnt FROM (
      SELECT unnest(string_split_regex(upper(text), '[^A-Z]+')) AS word FROM documents
    ) WHERE length(word) >= 6
    GROUP BY word
"""


@query(
    "q20_wordcount",
    oracle=_WORDCOUNT_ORACLE_BASE + " ORDER BY word",
    doc="Reference wordcount (A1 tokenize + A2 count): uppercase, split on non-[A-Z], keep len>=6, count per word.",
    bench=True,
    tags=("text", "wordcount", "ref"),
)
def q20_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: explode fans out ~100 tokens/doc; partial aggregation
    (the reference's combiner, O6) collapses them before the shuffle,
    so shuffle volume is O(vocab × partitions), not O(tokens)."""
    return _wordcount_df(spark, sf_dir).orderBy("word")


@query(
    "q21_top_words",
    oracle=_WORDCOUNT_ORACLE_BASE + " ORDER BY cnt DESC, word LIMIT 20",
    doc="Top-k words by count (wordcount + TakeOrdered).",
    tags=("text", "topk"),
)
def q21_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _wordcount_df(spark, sf_dir).orderBy(F.col("cnt").desc(), F.col("word")).limit(20)


@query(
    "q22_corpus_stats",
    oracle=f"""
    SELECT count(*) AS n_docs,
           cast(sum(len({tokens_sql("text")})) as bigint) AS n_tokens,
           (SELECT count(DISTINCT word) FROM (
              SELECT unnest(string_split_regex(upper(text), '[^A-Z]+')) AS word FROM documents
            ) WHERE word <> '') AS n_distinct_words,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM documents
    """,
    doc="Corpus-level stats: doc/token/vocab/char counts in one pass.",
    tags=("text", "agg"),
)
def q22_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.upper(F.col("text")), "[^A-Z]+")).alias("word"))
        .where(F.col("word") != "")
        .agg(F.countDistinct("word").alias("n_distinct_words"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return stats.crossJoin(vocab).select("n_docs", "n_tokens", "n_distinct_words", "total_chars")


@query(
    "q23_token_count",
    oracle=f"""
    SELECT doc_id, len({tokens_sql("text")}) AS n_tokens,
           length(text) AS n_chars_measured,
           len(list_filter({tokens_sql("text")}, t -> length(t) >= 4)) AS n_long_tokens
    FROM documents ORDER BY doc_id
    """,
    doc="Per-document token counting (whitespace tokenizer + length classes).",
    tags=("text",),
)
def q23_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure map-side (no shuffle but the output order); at 100 TB
    this runs as a scan-project with zero exchange."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 4)).alias("n_long_tokens"),
    ).orderBy("doc_id")


def _stop_list_sql(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "q24_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {tokens_sql("text")} AS toks, text FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           (cast(length(regexp_replace(text, '[^a-z]', '', 'g')) as double)
              / cast(length(text) as double)) AS alpha_ratio,
           (cast(len(list_filter(toks, t -> list_contains({_stop_list_sql(STOPWORDS)}, t))) as double)
              / cast(len(toks) as double)) AS stopword_ratio,
           (cast(length(replace(text, ' ', '')) as double) / cast(len(toks) as double)) AS mean_token_len
    FROM t WHERE len(toks) > 0
    ORDER BY doc_id
    """,
    doc="Per-document quality signals: alpha ratio, stopword ratio, mean token length.",
    tags=("text", "quality"),
)
def q24_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for pretraining-data filtering. All ratios are
    int/int double divisions → bitwise-reproducible. No shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks)
    return (
        docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            (F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("double") / F.length("text").cast("double")).alias(
                "alpha_ratio"
            ),
            (
                F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double") / n_tokens.cast("double")
            ).alias("stopword_ratio"),
            (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_tokens.cast("double")).alias(
                "mean_token_len"
            ),
        )
        .where(F.col("n_tokens") > 0)
        .orderBy("doc_id")
    )


@query(
    "q25_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {tokens_sql("text")} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
        {", ".join(f"len(list_filter(toks, t -> list_contains({_stop_list_sql(ws)}, t))) AS s_{code}" for code, ws in LANG_MARKERS.items())}
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, lang,
      CASE {" ".join(f"WHEN s_{c} >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN '{c}'" for c in LANG_MARKERS)} END AS predicted,
      (CASE {" ".join(f"WHEN s_{c} >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN '{c}'" for c in LANG_MARKERS)} END = lang) AS correct
    FROM s ORDER BY doc_id
    """,
    doc="Language-ID heuristic: marker-stopword hit counts per language, argmax with fixed tie-break.",
    tags=("text", "langid"),
)
def q25_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic n-gram/stopword language scorer (the classic
    fastText-free fallback). Map-only; argmax via chained CASE with a
    fixed language priority for ties."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    def marker_hits(ws: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = docs.select(
        "doc_id",
        "lang",
        *[marker_hits(ws).alias(f"s_{code}") for code, ws in LANG_MARKERS.items()],
        F.size(toks).alias("n_toks"),
    ).where(F.col("n_toks") > 0)
    best = F.greatest(*[F.col(f"s_{c}") for c in LANG_MARKERS])
    predicted = F.lit(None).cast("string")
    for code in reversed(list(LANG_MARKERS)):
        predicted = F.when(F.col(f"s_{code}") >= best, F.lit(code)).otherwise(predicted)
    return scored.select(
        "doc_id", "lang", predicted.alias("predicted"), (predicted == F.col("lang")).alias("correct")
    ).orderBy("doc_id")


@query(
    "q49_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({tokens_sql("text")}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             cast(round(cast(tf.tf * ln(cast(n.n_docs as double) / df.df) as decimal(18,6)), 6) as double) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    ORDER BY doc_id, term
    """,
    doc="TF-IDF: term/document frequencies, top-3 scoring terms per document.",
    tags=("text", "tfidf"),
)
def q49_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic two-aggregation TF-IDF: tf per (doc,term), df per term,
    n_docs as a literal-free cross join. Scale: both aggregations
    partial-combine. The df side carries NO broadcast hint — vocabulary
    GROWS with the corpus (a 100 TB crawl has billions of distinct
    terms), so a forced broadcast is the q03-customer OOM hazard;
    under the threshold Catalyst/AQE broadcast it anyway, beyond it
    the tf⋈df join shuffles on term, which both sides already
    partition by. n_docs (one row) keeps its hint. tfidf rounds
    through decimal: Spark and DuckDB ln() differ by 1 ulp on ~9% of
    inputs, so raw doubles would flake — 6-decimal rounding absorbs
    it."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).cast("decimal(18,6)"), 6
            )
            .cast("double")
            .alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "term")
    )


@query(
    "q26_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({normalize_text_sql("text")}) AS full_fp,
           list_min([md5(g) for g in {word_ngrams_sql("text", 3)}]) AS min_shingle_fp,
           substr(md5({normalize_text_sql("text")}), 1, 8) AS short_fp
    FROM documents ORDER BY doc_id
    """,
    doc="Document fingerprinting: whole-doc hash + winnowing-style min-shingle hash.",
    tags=("text", "fingerprint"),
)
def q26_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash-style fingerprints: the min-over-shingle-hashes is
    the 1-hash MinHash (winnowing degenerate case). Map-only."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    norm = normalize_text("text")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("full_fp"),
        F.array_min(F.transform(word_ngrams("text", 3), lambda g: F.md5(g))).alias("min_shingle_fp"),
        F.substring(F.md5(norm), 1, 8).alias("short_fp"),
    ).orderBy("doc_id")


_BPE_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


@query(
    "q67_bpe_token_count",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '{_BPE_PAT}') AS bt,
             len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           cast(sum(len(bt)) as bigint) AS total_bpe_tokens,
           cast(sum(len(list_filter(bt, t -> t ~ '^[a-z]+$'))) as bigint) AS word_tokens,
           cast(sum(len(list_filter(bt, t -> t ~ '^[0-9]+$'))) as bigint) AS num_tokens,
           cast(sum(ws_tokens) as bigint) AS total_ws_tokens,
           cast(round(sum(len(bt)) * 1.0 / sum(ws_tokens), 4) as double) AS bpe_per_ws
    FROM toks GROUP BY lang ORDER BY lang
    """,
    doc="BPE-ish regex token counting (letter/digit/punct runs) vs whitespace tokens per language — the pretokenizer-granularity cost estimate for training-data budgeting.",
    tags=("text", "tokens", "bpe"),
)
def q67_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only per-doc token classing then one partial-agg shuffle on
    lang; at 100 TB the regexp runs in whole-stage codegen next to the
    scan — no data moves until the 4-row-per-lang partials."""
    docs = load_table(spark, sf_dir, "documents")
    bt = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PAT), 0)
    per_doc = docs.select(
        "lang",
        F.size(bt).alias("n_bpe"),
        F.size(F.filter(bt, lambda t: t.rlike("^[a-z]+$"))).alias("n_word"),
        F.size(F.filter(bt, lambda t: t.rlike("^[0-9]+$"))).alias("n_num"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_ws"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            F.sum("n_word").cast("bigint").alias("word_tokens"),
            F.sum("n_num").cast("bigint").alias("num_tokens"),
            F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
            F.round(F.sum("n_bpe") / F.sum("n_ws"), 4).cast("double").alias("bpe_per_ws"),
        )
        .orderBy("lang")
    )


_RB, _RM = 131, (1 << 31) - 1  # Rabin-Karp base / Mersenne modulus


def _roll(col: "F.Column") -> "F.Column":
    """Rolling (Rabin-Karp/Horner) hash of a string column as a pure
    Catalyst expression — fold over code points, whole-stage codegen,
    no UDF: h = fold(acc*B + code mod M)."""
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(codes, F.lit(0).cast("bigint"), lambda acc, c: (acc * _RB + c) % _RM)


def _roll_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in split({expr}, '')]), "
        f"(acc, c) -> (acc * {_RB} + c) % {_RM})"
    )


@query(
    "q84_rolling_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {_roll_sql("text")} AS doc_fp,
           list_min([{_roll_sql("substr(text, b*128 + 1, 128)")}
                     for b in range(0, cast(ceil(len(text) / 128.0) as int))]) AS block_min_fp,
           cast(ceil(len(text) / 128.0) as int) AS n_blocks
    FROM documents ORDER BY doc_id
    """,
    doc="Rolling-hash (Rabin-Karp) document fingerprint + min over 128-char block fingerprints — computed as Catalyst fold expressions, no UDF.",
    tags=("text", "fingerprint"),
)
def q84_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both fingerprints are map-only fold expressions living in
    whole-stage codegen next to the scan — zero shuffles before the
    final order-by. The block-min variant is the content-sampled
    fingerprint a chunk-level dedup uses (cf. q26's shingle min)."""
    docs = load_table(spark, sf_dir, "documents")
    nb = F.ceil(F.length("text") / F.lit(128.0)).cast("int")
    block = F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda b: _roll(F.substring(F.col("text"), b * F.lit(128) + 1, F.lit(128))),
    )
    # empty text → nb=0, where sequence(0, -1) would step DOWN to
    # [0, -1] and fabricate two bogus blocks; the oracle's range(0, 0)
    # is empty and yields NULL — guard to match (ADVICE r1)
    return docs.select(
        "doc_id",
        _roll(F.col("text")).alias("doc_fp"),
        F.when(nb > 0, F.array_min(block)).otherwise(F.lit(None).cast("bigint")).alias("block_min_fp"),
        nb.alias("n_blocks"),
    ).orderBy("doc_id")


# --- BM25 top-k retrieval -------------------------------------------------

BM25_TERMS = ("spark", "query", "sort")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

#: (doc_id, bm25) scores for every document matching BM25_TERMS —
#: shared between q114 (lexical top-k) and q148 (RRF fusion), so the
#: two lanes rank the IDENTICAL scoring expression.
BM25_SCORES_SQL = f"""
    WITH doclen AS (
      SELECT doc_id, len({tokens_sql('text')}) AS dl FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(cast(dl as double)) AS avgdl FROM doclen
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
      ) WHERE term IN {BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    idf AS (
      SELECT term, ln(1.0 + (stats.n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
      FROM tf, stats GROUP BY term, stats.n_docs
    )
    SELECT tf.doc_id,
           cast(round(cast(sum(idf.idf * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * doclen.dl / stats.avgdl)))
             as decimal(18,6)), 6) as double) AS bm25
    FROM tf
    JOIN idf USING (term)
    JOIN doclen USING (doc_id)
    CROSS JOIN stats
    GROUP BY tf.doc_id
"""


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document matching a BM25_TERMS term —
    the scoring dataflow shared by q114 and q148 (see q114 docstring
    for the scale shape)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = tokens("text")
    doclen = docs.select("doc_id", F.size(toks).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.crossJoin(F.broadcast(stats.select("n_docs")))
        .groupBy("term", "n_docs")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            F.log(
                1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    return (
        tf.join(F.broadcast(idf), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
        .groupBy("doc_id")
        # 6-dp decimal rounding BEFORE the top-k cut (q49's ln-parity
        # pattern): JVM vs libm ln differ by 1 ulp, so an unrounded
        # score could flip the order at the LIMIT boundary.
        .agg(F.round(F.sum("s").cast("decimal(18,6)"), 6).cast("double").alias("bm25"))
    )


@query(
    "q114_bm25_search",
    oracle=f"""
    SELECT doc_id, bm25 FROM ({BM25_SCORES_SQL})
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
    doc=f"BM25 top-{BM25_TOPK} document retrieval for a fixed keyword query {BM25_TERMS}: tf/idf/length-normalized Okapi scoring, the lexical-search counterpart of the ANN queries.",
    tags=("text", "search"),
)
def q114_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) retrieval as pure dataflow.

    Scale shape: the corpus is tokenized once; the ``isin`` filter on
    query terms happens map-side BEFORE any shuffle, so the tf
    relation is |matching postings|, not the corpus. Document length
    and the (n_docs, avgdl) scalar pair come from a one-row aggregate
    that Spark broadcasts (no driver collect); per-term df is a
    ~|terms|-row aggregate joined back by broadcast. The only
    corpus-sized shuffle is the tf groupBy on (doc_id, term) — partial
    counts make it |distinct postings|. Top-k compiles to
    TakeOrderedAndProject, never a global sort.
    """
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# --- q119: collocation mining via lift ------------------------------------

COLLOC_MIN_COUNT = 5
COLLOC_TOPK = 50


@query(
    "q119_collocations",
    oracle=f"""
    WITH tok AS (
      SELECT {tokens_sql('text')} AS tokens FROM documents
    ),
    toks AS (SELECT unnest(tokens) AS w FROM tok),
    uni AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
    tot AS (SELECT count(*) AS n_total FROM toks),
    pairs AS (
      SELECT tokens[p] AS a, tokens[p + 1] AS b FROM (
        SELECT tokens, unnest(generate_series(1, len(tokens) - 1)) AS p FROM tok
      )
    ),
    big AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY a, b),
    scored AS (
      SELECT big.a, big.b, big.n_ab,
             (cast(big.n_ab as double) * cast(tot.n_total as double))
               / (cast(ua.n as double) * cast(ub.n as double)) AS lift
      FROM big
      JOIN uni ua ON big.a = ua.w
      JOIN uni ub ON big.b = ub.w
      CROSS JOIN tot
      WHERE big.n_ab >= {COLLOC_MIN_COUNT}
    )
    SELECT a, b, n_ab, lift FROM scored
    ORDER BY lift DESC, a, b LIMIT {COLLOC_TOPK}
    """,
    doc=f"Collocation mining: adjacent-token pairs scored by lift = P(ab)/(P(a)P(b)) (the transcendental-free PMI variant, exactly cross-engine-reproducible) — the phrase-extraction signal for tokenizer merges; min count {COLLOC_MIN_COUNT}, top {COLLOC_TOPK}.",
    tags=("text", "ngram", "collocation"),
)
def q119_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift rather than PMI on purpose: PMI's log() differs between
    the JVM and libm by 1 ulp on ~10% of inputs (measured — see q59),
    while lift is pure *,/ arithmetic and hashes identically. Ranking
    is order-isomorphic to PMI (log is monotone).

    Scale shape: unigram and bigram counts are classic partial-agg
    shuffles on token keys; the two unigram joins are equi-joins AQE
    can broadcast (vocab ≪ corpus); the corpus total is a one-row
    broadcast. Top-k compiles to TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    t = tokens("text")
    tok = docs.select(t.alias("tokens"))
    toks = tok.select(F.explode("tokens").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    pairs = tok.select(
        F.explode(
            F.when(
                F.size("tokens") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("tokens") - 1),
                    lambda i: F.struct(
                        F.element_at("tokens", i).alias("a"),
                        F.element_at("tokens", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("p")
    ).select("p.a", "p.b")
    big = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab")).where(F.col("n_ab") >= COLLOC_MIN_COUNT)
    ua = uni.select(F.col("w").alias("a"), F.col("n").alias("na"))
    ub = uni.select(F.col("w").alias("b"), F.col("n").alias("nb"))
    return (
        big.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            (
                (F.col("n_ab").cast("double") * F.col("n_total").cast("double"))
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "a", "b")
        .limit(COLLOC_TOPK)
    )


# --- q196: positional phrase search ------------------------------------------

PHRASE = ("table", "scan")  # the fixed 2-word query phrase


@query(
    "q196_phrase_search",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {tokens_sql("text")} AS arr FROM documents
    ),
    hits AS (
      SELECT doc_id,
             [i for i in range(1, len(arr)) if arr[i] = '{PHRASE[0]}'
                and arr[i + 1] = '{PHRASE[1]}'] AS pos_list
      FROM g
    )
    SELECT doc_id,
           cast(len(pos_list) as bigint) AS n_occurrences,
           cast(list_min(pos_list) as bigint) AS first_pos
    FROM hits WHERE len(pos_list) > 0
    ORDER BY doc_id
    """,
    doc=f"Positional phrase search for \"{PHRASE[0]} {PHRASE[1]}\": postings = (doc, position, term) triples FILTERED to the query terms before any shuffle, phrase match = an equi-join of the two posting lists on (doc_id, pos+1 = pos) — the positional-inverted-index primitive search engines use instead of substring scans; per-doc occurrence count and first position (1-based). The oracle verifies via a DuckDB list comprehension — a deliberately different formulation of the same math.",
    tags=("text", "search", "postings"),
)
def q196_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring LIKE-scan reads every byte of every document for
    every query; the index formulation touches only the query terms'
    postings — at 100 TB that is the entire difference between a
    search engine and a grep. The plan: posexplode to (doc, pos,
    term), filter term IN (w1, w2) BEFORE the exchange (predicate
    pushdown does the rest), then one equi-join keyed on (doc_id,
    adjacent position). Join fan-out is bounded by per-doc term
    frequency; everything shuffled is integer pairs.

    Exactness: positions are 1-based integers on both engines (the
    oracle's list comprehension vs the engine's posting join — two
    formulations, one answer), counts exact."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    postings = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "term")
    ).where(F.col("term").isin(*PHRASE))
    p1 = postings.where(F.col("term") == PHRASE[0]).select(
        "doc_id", (F.col("pos0") + 1).alias("p1")
    )
    p2 = postings.where(F.col("term") == PHRASE[1]).select(
        F.col("doc_id").alias("d2"), (F.col("pos0") + 1).alias("p2")
    )
    return (
        p1.join(p2, (p1["doc_id"] == p2["d2"]) & (p2["p2"] == p1["p1"] + 1))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("p1").cast("bigint").alias("first_pos"),
        )
        .orderBy("doc_id")
    )
