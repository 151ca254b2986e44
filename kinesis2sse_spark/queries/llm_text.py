"""Text-analysis operators over the ``documents`` table — token counting
(whitespace + BPE-ish regex), quality scoring, language-ID (stopword
n-gram heuristic), document fingerprinting (rolling polynomial hash),
TF-IDF top terms, n-gram extraction, stopword removal.

All JVM-side (split / higher-order functions / window) — no Python in the
hot path. The rolling hash uses (h*31 + ascii) mod 1e9+7 so the identical
integer arithmetic runs on both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, pin_cache
from kinesis2sse_spark.registry import register

BPE_ISH = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"

EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
ES_STOP = ("el", "la", "de", "que", "y", "en", "los", "se", "un", "una")
DE_STOP = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "text_token_count",
    bench=True,
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_ISH}')) AS n_bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letters runs / single digits / punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH), 0)).cast("bigint").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "text_quality_score",
    # floor(x*1e6 + 0.5)/1e6 instead of round(x, 6): both engines derive
    # the same IEEE double for x, but their round() differs in MODE at
    # exact half-way points (Spark HALF_UP vs DuckDB's nearest), which
    # flipped one sf0.1 doc whose composite score is exactly 0.5046875.
    # floor on the identical double is deterministic on both.
    oracle=f"""
    SELECT doc_id,
           n_tokens,
           floor((sw_hits * 1.0 / n_tokens) * 1000000 + 0.5) / 1000000 AS stopword_ratio,
           floor((alpha_chars * 1.0 / n_chars) * 1000000 + 0.5) / 1000000 AS alpha_ratio,
           floor(avg_tok_len * 1000000 + 0.5) / 1000000 AS avg_tok_len,
           floor(( least(n_tokens / 100.0, 1.0) * 0.4
                 + (sw_hits * 1.0 / n_tokens) * 0.3
                 + (alpha_chars * 1.0 / n_chars) * 0.3) * 1000000 + 0.5) / 1000000 AS quality
    FROM (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_chars,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({_sql_list(EN_STOP)}))) AS sw_hits,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
             length(replace(text, ' ', '')) * 1.0
               / len(string_split(text, ' ')) AS avg_tok_len
      FROM documents
    )
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, stopword ratio, alphabetic ratio, average
    token length, combined into a bounded score — the standard cheap
    pre-filter for LLM training corpora."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.expr(
        f"size(filter(split(text, ' '), t -> t IN ({_sql_list(EN_STOP)})))"
    )
    base = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        sw.alias("sw_hits"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).alias("alpha_chars"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) * F.lit(1.0)
            / F.size(toks)
        ).alias("avg_tok_len"),
    )
    sw_ratio = F.col("sw_hits") * 1.0 / F.col("n_tokens")
    alpha_ratio = F.col("alpha_chars") * 1.0 / F.col("n_chars")

    def r6(c):
        # explicit half-up on the shared double — engine round() modes
        # disagree at exact half-way points (see oracle comment)
        return F.floor(c * 1000000 + F.lit(0.5)) / 1000000

    return base.select(
        "doc_id",
        "n_tokens",
        r6(sw_ratio).alias("stopword_ratio"),
        r6(alpha_ratio).alias("alpha_ratio"),
        r6(F.col("avg_tok_len")).alias("avg_tok_len"),
        r6(
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
            + sw_ratio * 0.3
            + alpha_ratio * 0.3
        ).alias("quality"),
    )


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, c_en, c_es, c_de,
           CASE WHEN c_en >= c_es AND c_en >= c_de THEN 'en'
                WHEN c_es >= c_de THEN 'es'
                ELSE 'de' END AS lang_guess
    FROM (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t IN ({_sql_list(EN_STOP)}))) AS c_en,
             len(list_filter(string_split(text, ' '), t -> t IN ({_sql_list(ES_STOP)}))) AS c_es,
             len(list_filter(string_split(text, ' '), t -> t IN ({_sql_list(DE_STOP)}))) AS c_de
      FROM documents
    )
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-hit counting with a fixed precedence — the
    n-gram-heuristic family (a real system swaps in character n-gram
    profiles; the dataflow is identical)."""
    d = load_table(spark, sf_dir, "documents")

    def hits(words):
        return F.expr(f"size(filter(split(text, ' '), t -> t IN ({_sql_list(words)})))")

    base = d.select(
        "doc_id",
        hits(EN_STOP).cast("bigint").alias("c_en"),
        hits(ES_STOP).cast("bigint").alias("c_es"),
        hits(DE_STOP).cast("bigint").alias("c_de"),
    )
    return base.withColumn(
        "lang_guess",
        F.when(
            (F.col("c_en") >= F.col("c_es")) & (F.col("c_en") >= F.col("c_de")), "en"
        )
        .when(F.col("c_es") >= F.col("c_de"), "es")
        .otherwise("de"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
                          list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (h, c) -> (h * 31 + c) % 1000000007
           ) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash over the character
    stream, (h*31 + code) mod 1e9+7 — identical arithmetic on the oracle
    side, so the hash is verified bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(F.split("text", ""), lambda c: F.ascii(c).cast("long")),
        F.lit(7).cast("long"),
        lambda h, c: (h * 31 + c) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_tfidf_top_terms",
    bench=True,
    oracle="""
    WITH tf AS (
      SELECT doc_id, t.term, count(*) AS tf
      FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
      GROUP BY doc_id, t.term
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tfidf
    FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, fully relational: explode terms → tf per (doc, term) → df
    per term → idf = ln(N/df) → top-3 terms per doc. ONE explode +
    (doc,term) shuffle: the tf relation is persisted because both the
    df aggregate and the scoring join consume it (uncached, Spark
    instantiates the explode+shuffle subtree twice). N comes from a
    1-row aggregate broadcast into the scoring join — NOT an eager
    .count() at plan-build time, which would run a separate full-scan
    job before the query even starts (and again per bench rep). The
    vocabulary relation df carries NO forced hint (census class 4:
    Heaps'-law ~n^0.5 growth reaches ~4-5 GB at 100 TB, near the 8 GB
    broadcast ceiling) — AQE broadcasts it from measured sizes at
    fixture scale and falls back to the term-keyed shuffle tf already
    paid when the vocabulary outgrows the ceiling. No ML-lib
    dependency, no fixed-dim hashing collisions."""

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .transform(pin_cache)
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


BM25_QUERY_TERMS = ("hash", "join", "merge", "scan")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "text_bm25_search",
    oracle=f"""
    WITH q(term) AS (VALUES {", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)}),
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT d.doc_id, t.term, count(*) AS tf,
             max(CAST(len(string_split(d.text, ' ')) AS BIGINT)) AS dl
      FROM documents d, LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
      WHERE t.term IN (SELECT term FROM q)
      GROUP BY d.doc_id, t.term
    ),
    df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
             CAST(
               ln((n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (tf.tf * ({BM25_K1} + 1.0))
                 / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (tf.dl / avgdl)))
               AS DECIMAL(27,15)) AS c
      FROM tf
      JOIN df USING (term)
      CROSS JOIN stats
    ),
    scored AS (
      SELECT doc_id, floor(CAST(sum(c) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS score
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, rnk FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75): top-10 documents for a
    fixed multi-term query — the scoring function behind every lexical
    search engine, expressed fully relationally. Term frequencies come
    from ONE explode filtered to the query terms BEFORE the shuffle
    (the (doc,term) exchange carries |Q| terms per doc, not the whole
    vocabulary — at 100 TB this is the difference between shuffling a
    posting-list slice and shuffling the corpus); document frequencies
    aggregate from the tf relation (persisted — df and the scoring
    join both consume it) and BROADCAST back with the 1-row
    corpus-stats aggregate (df's forced hint is legitimate: tf is
    pre-filtered to BM25_QUERY_TERMS, so df is bounded by |Q| rows —
    census class 1, unlike the unbounded TF-IDF/PMI vocabularies). Per-term contributions are quantized to
    DECIMAL(27,15) before the per-doc sum (registry ladder step 3), so
    the |Q|-term summation order cannot move a score between engines;
    the top-10 ranks over floor-rounded scores with a doc_id tiebreak.
    idf uses the +1 ("Lucene") form, always positive."""

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    dl = d.select("doc_id", F.size(toks).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    terms = list(BM25_QUERY_TERMS)
    # dl rides through the tf aggregation (functionally dependent on
    # doc_id), so scoring needs NO join back to a per-doc length
    # relation — one less corpus scan and one less doc-keyed join
    tf = (
        d.select("doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
        .transform(pin_cache)
    )
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    k1, b = BM25_K1, BM25_B
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
    contrib = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (idf * (F.col("tf") * (k1 + 1.0)) / norm).cast("decimal(27,15)").alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        (F.floor(F.sum("c").cast("double") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "score"
        )
    )
    w = Window.partitionBy().orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("doc_id", "score", "rnk")
    )


@register(
    "text_ngrams",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u
      WHERE len(t) >= 2
    )
    SELECT doc_id,
           count(DISTINCT bigram) AS n_distinct_bigrams,
           min(bigram) AS first_bigram
    FROM bg GROUP BY doc_id
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word n-gram extraction (bigrams) via sequence+transform — the same
    shingling primitive the MinHash dedup uses."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
    )
    return (
        d.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bigram").alias("n_distinct_bigrams"),
            F.min("bigram").alias("first_bigram"),
        )
    )


@register(
    "text_scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, 'data', '[MASK]', 'g'),
                          '[0-9]+', '#', 'g') AS scrubbed,
           len(regexp_extract_all(text, 'data')) AS n_masked
    FROM documents
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text scrubbing/masking: regexp_replace chains (the PII-redaction
    shape — swap the patterns for email/phone/SSN in production) plus a
    count of masked spans."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", "data", "[MASK]"), "[0-9]+", "#"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit("data"), 0))
        .cast("bigint")
        .alias("n_masked"),
    )


@register(
    "sample_systematic",
    oracle="""
    SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 = 3
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sampling: key-mod bucketing — the
    reproducible alternative to Bernoulli sample() for carving
    train/val/test splits (in production the key is hashed first so the
    sample is unbiased w.r.t. key order)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 10 == 3).select("doc_id", "n_chars")


@register(
    "pipeline_training_export",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text, lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({_sql_list(EN_STOP)}))) * 1.0
               / len(string_split(text, ' ')) AS sw_ratio
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE n_tokens >= 30 AND sw_ratio >= 0.02 AND lang IN ('en', 'es', 'de')
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, text, min(n_chars) AS n_chars
      FROM kept GROUP BY text
    )
    SELECT lang, count(*) AS n_docs, CAST(sum(k.n_chars) AS BIGINT) AS total_chars
    FROM deduped d JOIN kept k USING (doc_id)
    GROUP BY lang
    """,
)
def pipeline_training_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline: quality filter (length +
    stopword ratio) → language allowlist → exact dedup (keep lowest
    doc_id) → per-language corpus stats. One scan, one dedup shuffle,
    one stats shuffle — the end-to-end shape every operator above exists
    to serve."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.expr(f"size(filter(split(text, ' '), t -> t IN ({_sql_list(EN_STOP)})))")
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        (sw * 1.0 / F.size(toks)).alias("sw_ratio"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 30)
        & (F.col("sw_ratio") >= 0.02)
        & F.col("lang").isin("en", "es", "de")
    )
    deduped = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min("n_chars").alias("n_chars")
    )
    return (
        deduped.join(kept.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "text_stopword_removal",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '),
                           t -> t NOT IN ({_sql_list(EN_STOP)}))) AS n_content_tokens,
           array_to_string(
             list_filter(string_split(text, ' '),
                         t -> t NOT IN ({_sql_list(EN_STOP)}))[1:5], ' ') AS head_content
    FROM documents
    """,
)
def text_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cleaned = F.expr(
        f"filter(split(text, ' '), t -> t NOT IN ({_sql_list(EN_STOP)}))"
    )
    return d.select(
        "doc_id",
        F.size(cleaned).cast("bigint").alias("n_content_tokens"),
        F.array_join(F.slice(cleaned, 1, 5), " ").alias("head_content"),
    )


@register(
    "decontaminate_ngram",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS s
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) u
      WHERE len(t) >= 5
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
    contaminated AS (
      SELECT DISTINCT doc_id FROM sh
      WHERE doc_id % 50 <> 0 AND s IN (SELECT s FROM bench)
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id % 50 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop training documents sharing any
    5-gram with the held-out/benchmark set (docs with doc_id % 50 == 0
    stand in for the benchmark corpus). The benchmark shingle set is
    tiny relative to the corpus, so it BROADCASTS — candidate documents
    explode their shingles map-side, probe the broadcast set, and
    anti-join away hits without ever shuffling the corpus shingles. At
    100 TB the corpus-side explode stays embarrassingly parallel; only
    the benchmark distinct (small) exchanges."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 5),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 5)),
    )
    sh = (
        d.filter(F.size(toks) >= 5)
        .select("doc_id", F.explode(shingles).alias("s"))
    )
    bench_sh = sh.filter(F.col("doc_id") % 50 == 0).select("s").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )


@register(
    "sample_stratified",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn % 5 = 1
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified systematic sampling: every 5th document per language
    stratum in doc_id order — reproducible per-stratum rates where
    Bernoulli sample() would drift on small strata. One shuffle on the
    stratum key; each stratum ranks independently in parallel (contrast
    with a global row_number, which would serialize)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 5 == 1)
        .select("doc_id", "lang")
    )


@register(
    "select_token_budget",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked WHERE cum_tokens <= 5000
    """,
)
def select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: take documents in quality order (n_chars
    desc, doc_id tiebreak) until the cumulative token count reaches the
    budget. The oracle states a single global running sum; the Spark
    plan is the DISTRIBUTED PREFIX SUM — per-key (n_chars) partial sums
    cumsum'd over the tiny key-summary, broadcast back as offsets, plus
    a within-key running sum partitioned BY key — so no stage ever
    collapses to one partition the way a global ORDER BY window would.
    At 100 TB the only serial work is the cumsum over distinct quality
    keys (small). The scored relation is persisted: it feeds both the
    key summary and the final join, and uncached each consumer would
    re-scan and re-split the full text column."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).transform(pin_cache)
    # tiny per-key summary: one row per distinct n_chars value
    key_sums = scored.groupBy("n_chars").agg(F.sum("n_tokens").alias("key_tokens"))
    wk = Window.orderBy(F.col("n_chars").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = key_sums.select(
        "n_chars",
        (F.sum("key_tokens").over(wk) - F.col("key_tokens")).alias("offset"),
    )
    ww = Window.partitionBy("n_chars").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        scored.join(F.broadcast(offsets), "n_chars")
        .withColumn("cum_tokens", F.col("offset") + F.sum("n_tokens").over(ww))
        .filter(F.col("cum_tokens") <= 5000)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


SEQ_LEN = 512  # context-window length (tokens) for training packing
PACK_KEY_SPAN = 1000  # docs per prefix-sum key (tune ≈ corpus/partitions)


@register(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_tok,
           CAST((cum - n_tokens) // {SEQ_LEN} AS BIGINT) AS first_block,
           CAST((cum - 1) // {SEQ_LEN} AS BIGINT) AS last_block
    FROM c
    """,
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LM training: concatenate the corpus in
    doc_id order and chunk into SEQ_LEN-token context windows — each
    doc's global token offset and the block range it lands in. The
    oracle states one global running sum; the Spark plan is the same
    DISTRIBUTED PREFIX SUM as select_token_budget — per-key partials
    (key = contiguous doc_id span) cumsum'd over the tiny key summary
    and broadcast back, plus a within-key window — so nothing collapses
    to one partition. At 100 TB the serial work is one row per
    PACK_KEY_SPAN docs; the per-doc block math is pure projection.
    Downstream, grouping by block id materializes the training
    batches; docs straddling a boundary continue in the next block
    (standard concat-then-chunk semantics). The token-count relation is
    persisted: the key summary and the final join both consume it, and
    uncached each would re-scan and re-split the full text column."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") - F.col("doc_id") % PACK_KEY_SPAN).alias("k"),
    ).transform(pin_cache)
    key_sums = t.groupBy("k").agg(F.sum("n_tokens").alias("key_tokens"))
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = key_sums.select(
        "k", (F.sum("key_tokens").over(wk) - F.col("key_tokens")).alias("offset")
    )
    ww = Window.partitionBy("k").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.col("offset") + F.sum("n_tokens").over(ww)
    start = cum - F.col("n_tokens")
    # `div` = exact integer division — a double floor would lose
    # precision past 2^53 global tokens, within reach at 100 TB
    return (
        t.join(F.broadcast(offsets), "k")
        .select(
            "doc_id",
            "n_tokens",
            start.alias("start_tok"),
            start.alias("__s"),
            (cum - 1).alias("__e"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_tok",
            F.expr(f"__s div {SEQ_LEN}").alias("first_block"),
            F.expr(f"__e div {SEQ_LEN}").alias("last_block"),
        )
    )


@register(
    "text_repetition_score",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              FOR i IN range(1, len(t) - 1)] AS g
      FROM toks WHERE len(t) >= 3
    )
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS n_grams,
           round(1.0 - len(list_distinct(g)) * 1.0 / len(g), 6) AS dup_gram_ratio
    FROM grams
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (the Gopher/C4-style duplicate-n-gram
    fraction): 1 - distinct/total word-3-grams per document. High values
    flag boilerplate and degenerate generations before training. Pure
    per-row array arithmetic inside whole-stage codegen — no shuffle,
    embarrassingly parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    return (
        d.filter(F.size(toks) >= 3)
        .select("doc_id", grams.alias("g"))
        .select(
            "doc_id",
            F.size("g").cast("bigint").alias("n_grams"),
            F.round(
                1.0 - F.size(F.array_distinct("g")) * 1.0 / F.size("g"), 6
            ).alias("dup_gram_ratio"),
        )
    )


@register(
    "mix_domain_weights",
    oracle="""
    WITH per AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT count(*) AS k, sum(n_docs) AS total FROM per)
    SELECT source, n_docs, n_tokens,
           round((1.0 / k) / (n_docs * 1.0 / total), 6) AS sample_weight
    FROM per, tot
    """,
)
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling weight that turns
    the corpus's natural source distribution into a uniform target mix
    (weight = target_share / actual_share; swap the uniform target for a
    tuned mixture vector in practice). One groupBy(source) aggregate +
    one broadcast of the k-row summary — the corpus never shuffles
    beyond the map-side-combined count. The k-row per-source summary is
    persisted — it feeds both the total and the final projection, and
    uncached each consumer re-runs the full scan-and-split aggregate."""

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    ).transform(pin_cache)
    tot = per.agg(F.count("*").alias("k"), F.sum("n_docs").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round((1.0 / F.col("k")) / (F.col("n_docs") * 1.0 / F.col("total")), 6).alias(
            "sample_weight"
        ),
    )


@register(
    "filter_quality_percentile",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    p AS (SELECT round(quantile_cont(n_tokens, 0.1), 6) AS p10 FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM t, p WHERE n_tokens > p10
    """,
)
def filter_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-threshold filtering: drop the bottom decile by token
    count (stand-in for any scalar quality score). The exact percentile
    is one aggregate row broadcast back as a predicate — same
    one-scan-plus-broadcast shape as retention_last_n, so parquet
    min/max stats can prune whole files below the cut at scale. Both
    engines use linearly-interpolated percentile_cont semantics; the
    threshold is rounded to 6 dp on BOTH sides so a one-ULP
    interpolation difference at an integer index can't flip boundary
    docs between engines. The token-count relation is persisted: the
    percentile aggregate and the filter join both consume it, and
    uncached each would re-scan and re-split the full text column."""

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    ).transform(pin_cache)
    p = t.agg(F.round(F.percentile("n_tokens", F.lit(0.1)), 6).alias("p10"))
    return (
        t.join(F.broadcast(p), F.col("n_tokens") > F.col("p10"), "inner")
        .select("doc_id", "n_tokens")
    )


HIST_BUCKET = 8  # tokens per histogram bucket


@register(
    "hist_token_lengths",
    oracle=f"""
    WITH t AS (
      SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT CAST(n_tokens // {HIST_BUCKET} AS BIGINT) AS bucket,
           CAST(n_tokens // {HIST_BUCKET} * {HIST_BUCKET} AS BIGINT) AS lo_tokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM t GROUP BY 1, 2
    """,
)
def hist_token_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (fixed-width buckets): the length
    distribution every packing/curriculum decision starts from. One
    map-side-combined groupBy over bucket ids — the shuffle carries at
    most n_buckets rows per partition regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    b = F.expr(f"size(split(text, ' ')) div {HIST_BUCKET}")
    return (
        d.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "bucket",
            (F.col("bucket") * HIST_BUCKET).cast("bigint").alias("lo_tokens"),
            "n_docs",
        )
    )


# Multiplicative id hash for the split: exact BIGINT arithmetic on both
# engines, mod a large prime, bucketed 0-99. 80/10/10 by bucket range.
# doc_id is reduced mod the prime BEFORE multiplying by Knuth's
# 2654435761 so the product stays < 2.66e18 < 2^63 for ANY int64 id —
# a raw doc_id*2654435761 overflows past id ~3.5e9, where Spark
# (non-ANSI) wraps silently but DuckDB raises, i.e. the engines would
# diverge exactly at the scale this split targets. Mod distributes over
# multiplication, so buckets are unchanged for in-range ids.
SPLIT_HASH = "((doc_id % 1000000007) * 2654435761) % 1000000007 % 100"


@register(
    "pipeline_dataset_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {SPLIT_HASH} < 80 THEN 'train'
                WHEN {SPLIT_HASH} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def pipeline_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10): every doc's split
    is a pure function of its stable id — reproducible across runs,
    machines, and corpus growth (a new doc never moves an old one, the
    property random splits and modulo-on-row-number both lack). Pure
    projection, zero shuffles; at 100 TB the split is computable at
    write time and usable as a partition column so each split prunes to
    its own files. Content-keyed variants swap the id hash for a text
    fingerprint (see text_fingerprint) to keep exact duplicates in the
    same split."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(SPLIT_HASH)
    return d.select(
        "doc_id",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "classify_quality_linear",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             list_aggregate(
               list_transform(string_split(text, ' '),
                 t -> (list_reduce(
                         list_prepend(CAST(7 AS BIGINT),
                             list_transform(string_split_regex(t, ''),
                                            c -> CAST(ascii(c) AS BIGINT))),
                         (h, c) -> (h * 31 + c) % 1000000007
                       ) % 1001) - 500),
               'sum') AS score_int
      FROM documents
    )
    SELECT doc_id,
           score_int / 1000.0 AS score,
           score_int > 0 AS is_quality
    FROM scored
    """,
)
def classify_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed token features — the
    fastText-style filter shape every LLM data pipeline runs (CCNet,
    Gopher rules): tokenize, hash each token into a weight table,
    sum weights, threshold.

    The weight table here is a pure function of the token's rolling
    hash ((hash % 1001) - 500, i.e. ~U[-500,500] per mille) so the
    DuckDB oracle reproduces the model bit-for-bit; a real model swaps
    in a broadcast map lookup with identical plan shape. Scoring stays
    in INT64 space (order-independent under reassociation) and divides
    by 1000 exactly once, so partial-aggregation order can never flip
    the hash — the FP ladder's rule 3 applied preemptively. All
    JVM-side nested higher-order functions (transform + aggregate):
    zero shuffles, zero Python, embarrassingly parallel at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    token_weight = lambda t: (
        F.aggregate(
            F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long")),
            F.lit(7).cast("long"),
            lambda h, c: (h * 31 + c) % 1000000007,
        )
        % 1001
        - 500
    )
    score_int = F.aggregate(
        F.transform(F.split("text", " "), token_weight),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return d.select(
        "doc_id",
        (score_int / 1000.0).alias("score"),
        (score_int > 0).alias("is_quality"),
    )


@register(
    "pipeline_split_leakage",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                            list_transform(string_split_regex(text, ''),
                                           c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 31 + c) % 1000000007
             ) AS fingerprint,
             CASE WHEN {SPLIT_HASH} < 80 THEN 'train'
                  WHEN {SPLIT_HASH} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT fingerprint,
           count(*) AS n_docs,
           count(DISTINCT split) AS n_splits,
           CAST(count(DISTINCT split) > 1 AS BOOLEAN) AS leaked,
           min(doc_id) AS first_doc_id,
           string_agg(DISTINCT split, ',' ORDER BY split) AS splits
    FROM keyed
    GROUP BY fingerprint
    """,
)
def pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: a census of every content
    fingerprint group with its copy count, the distinct splits its
    copies landed in, and a ``leaked`` flag marking exact-duplicate
    documents whose copies landed in DIFFERENT dataset splits — the
    leakage an id-hash split permits and a content-keyed split
    prevents. A release gate asserts ``leaked`` is everywhere false
    before training; emitting the full census (not just the leaking
    groups) keeps the audit result non-degenerate on a corpus with no
    duplicates, so a driver/oracle row is evidence the fingerprinting
    ran rather than an empty set that any ``LIMIT 0`` would match.

    One map-side-combined groupBy on the 8-byte fingerprint is the only
    shuffle — no self-join, no pair explosion, so a fingerprint with a
    million copies costs one group, not 10^12 pairs. At 100 TB both
    fingerprint and split are computed at ingest and stored, making
    this a pure aggregate over two thin columns; extend to NEAR-dup
    leakage by swapping the fingerprint for the MinHash band keys
    (dedup_minhash_lsh)."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(F.split("text", ""), lambda c: F.ascii(c).cast("long")),
        F.lit(7).cast("long"),
        lambda h, c: (h * 31 + c) % 1000000007,
    )
    bucket = F.expr(SPLIT_HASH)
    keyed = d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    return (
        keyed.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("split").alias("n_splits"),
            F.min("doc_id").alias("first_doc_id"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        )
        .select(
            "fingerprint",
            "n_docs",
            "n_splits",
            (F.col("n_splits") > 1).alias("leaked"),
            "first_doc_id",
            "splits",
        )
    )


@register(
    "text_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), chars AS (
      SELECT string_split_regex(w, '') AS cs FROM words WHERE length(w) >= 2
    ), pairs AS (
      SELECT cs[i] AS a, cs[i + 1] AS b
      FROM chars, LATERAL (SELECT unnest(range(1, len(cs))) AS i) t
    ), counted AS (
      SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b
    )
    SELECT a, b, cnt, rnk FROM (
      SELECT a, b, cnt,
             row_number() OVER (ORDER BY cnt DESC, a, b) AS rnk
      FROM counted
    ) WHERE rnk <= 20
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training step: count adjacent symbol pairs across every
    word occurrence in the corpus and rank the top-20 merge candidates
    — the inner loop of byte-pair-encoding vocabulary induction (the
    highest-count pair becomes the next merge rule; re-tokenize and
    repeat). Pair extraction is a per-row higher-order function (no
    Python), counting is ONE map-side-combined shuffle on the pair key,
    and the global rank runs over the tiny distinct-pair relation — at
    100 TB each merge iteration costs exactly one aggregate pass, and
    the re-tokenization between iterations is a broadcast map of the
    accumulated merge rules."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.length("w") >= 2
    )
    chars = F.split("w", "")
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(chars) - 2),
                lambda i: F.struct(
                    F.element_at(chars, i + 1).alias("a"),
                    F.element_at(chars, i + 2).alias("b"),
                ),
            )
        ).alias("p")
    )
    counted = pairs.select("p.a", "p.b").groupBy("a", "b").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy().orderBy(F.col("cnt").desc(), "a", "b")
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("a", "b", "cnt", "rnk")
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str, n_merges: int = 5) -> list[tuple[str, str]]:
    """Full BPE vocabulary induction, distributed: repeat
    ``text_bpe_pair_counts``'s aggregate to pick the highest-count
    adjacent pair (ties broken lexicographically), then re-tokenize
    every word with a greedy left-to-right merge expressed as a JVM
    fold (F.aggregate) — no Python touches the corpus; the driver only
    pulls ONE row per iteration (the merge rule). Each iteration
    localCheckpoints the symbol relation so the logical plan stays O(1)
    across merges (the dedup_connected_components lesson: break lineage
    in every driver-looped iterative operator or Catalyst analysis,
    not the data, becomes the bottleneck). Returns the learned merge
    rules in order."""
    d = load_table(spark, sf_dir, "documents")
    # Train over the WORD-FREQUENCY table, not word occurrences — the
    # standard BPE trick (r13 opt round): duplicate words contribute
    # identical pair multisets, so weighting each distinct word's pair
    # counts by its corpus frequency yields byte-identical counts (and
    # therefore identical argmax rules) while the per-iteration fold
    # re-tokenizes |vocabulary| rows instead of |occurrences| (guide
    # §1.2 — don't compute things you throw away; measured 13.7 -> see
    # OPTIMIZATION_r13.md). The groupBy also spreads the fold across
    # cores where the raw explode inherited the scan's few partitions.
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    syms = words.select(F.split("w", "").alias("s"), "cnt")
    empty_pairs = F.array().cast("array<struct<a:string,b:string>>")
    rules: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_col = F.when(
            F.size("s") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("s") - 2),
                lambda i: F.struct(
                    F.element_at("s", i + 1).alias("a"),
                    F.element_at("s", i + 2).alias("b"),
                ),
            ),
        ).otherwise(empty_pairs)
        top = (
            syms.select(F.explode(pair_col).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .first()
        )
        if top is None:
            break
        a, b = top["a"], top["b"]
        rules.append((a, b))
        merged = F.aggregate(
            "s",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        syms = syms.select(merged.alias("s"), "cnt").localCheckpoint(eager=True)
    return rules


BPE_TRAIN_MERGES = 4


def _bpe_train_oracle(n_merges: int) -> str:
    """Unrolled BPE-induction oracle: each word is encoded as the
    concatenation of US+symbol+US (US = chr(31), outside the fixtures'
    printable-ASCII alphabet), so the pair (a, b) occurs as the exact
    substring US a US US b US only at full-symbol boundaries, and
    DuckDB's replace() — left-to-right, non-overlapping, resuming
    AFTER each replacement — replays the Spark side's greedy
    left-fold merge byte-exactly (a merged token is re-wrapped as one
    symbol and never chain-merges within the same rule, in both
    formulations). Per iteration: re-split the string form into
    symbols, count adjacent pairs, argmax with the identical
    (cnt DESC, a, b) tie-break, substitute. Integer/string arithmetic
    end to end — no FP ladder needed."""
    its = []
    for i in range(n_merges):
        its.append(f"""
    syms{i} AS (
      SELECT string_split(trim(ws, chr(31)), chr(31)||chr(31)) AS s
      FROM words{i}
    ),
    pairs{i} AS (
      SELECT s[i.x] AS a, s[i.x + 1] AS b, count(*) AS cnt
      FROM syms{i}, LATERAL (SELECT unnest(range(1, len(s))) AS x) i
      GROUP BY 1, 2
    ),
    top{i} AS (SELECT a, b FROM pairs{i} ORDER BY cnt DESC, a, b LIMIT 1),
    words{i + 1} AS (
      SELECT replace(ws,
               chr(31)||t.a||chr(31)||chr(31)||t.b||chr(31),
               chr(31)||t.a||t.b||chr(31)) AS ws
      FROM words{i}, top{i} t
    )""")
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS rule_idx, a, b FROM top{i}"
        for i in range(n_merges)
    )
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    words0 AS (
      SELECT array_to_string(list_transform(string_split(w, ''),
               c -> chr(31)||c||chr(31)), '') AS ws
      FROM tok WHERE length(w) >= 2
    ),{','.join(its)}
    {finals}
    """


@register("pipeline_bpe_train", oracle=_bpe_train_oracle(BPE_TRAIN_MERGES))
def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary INDUCTION as a registered operator: learn the
    first BPE_TRAIN_MERGES merge rules from the corpus with
    ``bpe_train_merges`` (the distributed train loop — one pair-count
    aggregate per iteration, JVM-fold re-tokenization, localCheckpoint
    lineage break) and emit the learned merge table (rule_idx, a, b).
    The model comes back to the driver by design — a tokenizer vocab
    IS a driver-sized artifact, like ml_kmeans centroids — while every
    corpus touch stays distributed. The oracle unrolls the fixed
    iteration count into chained CTEs, replaying the greedy fold merge
    with non-overlapping string replace on a US-delimited symbol
    encoding (see _bpe_train_oracle) — integer-exact throughout, which
    is what moves this off the rows-only list; pytest additionally
    pins the loop against a hand-computed model
    (test_bpe_training_matches_python_model), and the frozen
    BPE_APPLY_RULES table consumed by pipeline_bpe_encode documents
    what a longer offline run of this operator produced."""
    rules = bpe_train_merges(spark, sf_dir, n_merges=BPE_TRAIN_MERGES)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(rules)],
        "rule_idx bigint, a string, b string",
    )


# Same overflow-safe multiplicative hash as SPLIT_HASH, mapped to a
# uniform draw in [0, 1e6) — integer arithmetic end to end, so the
# include/exclude decision can never diverge between engines by a ulp
# (a pow/log-based priority key could).
_PPS_DRAW = "((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000"


@register(
    "sample_weighted_pps",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(least(n_chars * 800, 1000000) AS BIGINT) AS inclusion_ppm
    FROM documents
    WHERE {_PPS_DRAW} < least(n_chars * 800, 1000000)
    """,
)
def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling: each document's
    inclusion probability scales with its weight (length here; quality
    score in production), decided by comparing a deterministic per-id
    uniform draw against the weight — the reproducible counterpart of
    weighted reservoir sampling for building size-biased training
    mixes. Pure integer arithmetic on both engines (a pow-based
    priority key would hang the decision on libm's last ulp), zero
    shuffles, and like the dataset split it is computable at write
    time: a stored inclusion_ppm column turns any later re-sample into
    a pushed-down filter."""
    d = load_table(spark, sf_dir, "documents")
    draw = F.expr(_PPS_DRAW)
    ppm = F.least(F.col("n_chars") * 800, F.lit(1000000)).cast("bigint")
    return d.select("doc_id", "n_chars", ppm.alias("inclusion_ppm")).where(
        draw < F.col("inclusion_ppm")
    )


NEG_SAMPLES_K = 4
# Overflow-safe multiplicative hash (same family as SPLIT_HASH): the
# reduced anchor stays < 1e9+7, times 2654435761 stays < 2.66e18 < 2^63.
_NEG_HASH = (
    f"(((doc_id % 1000000007) * {NEG_SAMPLES_K} + k + 1) % 1000000007 "
    "* 2654435761) % 1000000007"
)


@register(
    "pipeline_negative_sampling",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    ks AS (SELECT CAST(unnest(range({NEG_SAMPLES_K})) AS BIGINT) AS k),
    sampled AS (
      SELECT d.doc_id, ks.k,
             (d.doc_id + 1 + ({_NEG_HASH}) % greatest(n.n_docs - 1, 1)) % n.n_docs AS neg_id
      FROM documents d, ks, n
    )
    SELECT doc_id AS anchor_id, k, neg_id FROM sampled
    """,
)
def pipeline_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document draws K pseudo-random negatives via a multiplicative hash
    mapped into the id space with a nonzero modular SHIFT, so a
    negative can never equal its anchor and every anchor gets exactly
    K distinct-by-k draws. Pair with dedup_ngram_jaccard's near-dup
    pairs as positives for a full contrastive set.

    Scale shape: ZERO shuffles beyond the 1-row corpus count that
    broadcasts into the map stage — no global rank, no join, no RNG
    state; reruns and retried tasks produce identical pairs (the
    seeded-hash property every reproducible training pipeline needs).
    Precondition: doc_ids dense 0..N-1 (the fixtures' layout, asserted
    in tests; sparse id spaces need one rank pass first). The modulus
    is clamped with greatest(n_docs - 1, 1) on BOTH engines so a
    single-document corpus degrades to self-pairs instead of a
    modulo-by-zero error."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count("*").alias("n_docs"))
    ks = F.explode(F.sequence(F.lit(0), F.lit(NEG_SAMPLES_K - 1))).alias("k0")
    return (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "n_docs", ks)
        .select("doc_id", "n_docs", F.col("k0").cast("bigint").alias("k"))
        .select(
            F.col("doc_id").alias("anchor_id"),
            "k",
            (
                (
                    F.col("doc_id")
                    + 1
                    + F.expr(_NEG_HASH) % F.greatest(F.col("n_docs") - 1, F.lit(1))
                )
                % F.col("n_docs")
            ).alias("neg_id"),
        )
    )


# support floor: low enough that the driver-scale corpus (sf0.01,
# ~47k adjacent pairs) clears it non-degenerately, high enough that
# rare-pair PMI noise never reaches the top-20 at bench scale
PMI_MIN_COUNT = 20


@register(
    "text_cooccurrence_pmi",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT t[i] AS a, t[i + 1] AS b
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u
      WHERE len(t) >= 2
    ),
    cab AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY a, b),
    uni AS (
      SELECT term, count(*) AS n_t
      FROM toks, LATERAL (SELECT unnest(t) AS term) v
      GROUP BY term
    ),
    totals AS (
      SELECT (SELECT CAST(sum(n_ab) AS DOUBLE) FROM cab) AS tp,
             (SELECT CAST(sum(n_t) AS DOUBLE) FROM uni) AS tu
    ),
    scored AS (
      SELECT cab.a, cab.b, cab.n_ab,
             floor(ln((cab.n_ab / tp) / ((ua.n_t / tu) * (ub.n_t / tu)))
                   * 1000000 + 0.5) / 1000000 AS pmi
      FROM cab
      JOIN uni ua ON ua.term = cab.a
      JOIN uni ub ON ub.term = cab.b
      CROSS JOIN totals
      WHERE cab.n_ab >= {PMI_MIN_COUNT}
    )
    SELECT a, b, n_ab, pmi, rnk FROM (
      SELECT a, b, n_ab, pmi,
             row_number() OVER (ORDER BY pmi DESC, a, b) AS rnk
      FROM scored
    ) WHERE rnk <= 20
    """,
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs: the
    top-20 most-associated bigrams with support >= PMI_MIN_COUNT — the
    collocation statistic behind phrase detection and embedding-corpus
    prep (word2vec-style pair weighting). One explode builds the
    ordered-pair relation, one the unigram relation; both aggregate
    with map-side combine down to vocabulary-bounded sizes. The two
    unigram count joins carry NO forced hint (census class 4: the
    vocabulary grows ~n^0.5 by Heaps' law to ~4-5 GB at 100 TB, near
    the 8 GB ceiling) — AQE broadcasts them from measured sizes at
    fixture scale and falls back to a term-keyed shuffle of the
    vocabulary-bounded relations beyond. Corpus totals ride in as
    1-row broadcasts;
    PMI evaluates the identical IEEE expression both sides under the
    floor ladder, and the support threshold filters on exact integer
    counts, so the cut cannot drift."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = (
        d.where(F.size(toks) >= 2)
        .select(
            F.posexplode(F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)")).alias("i", "a"),
            toks.alias("t"),
        )
        .select("a", F.expr("t[i + 1]").alias("b"))
    )

    # cab and uni are each multi-consumer (scoring join + totals fold);
    # persisted so the corpus explodes exactly twice total, and the
    # corpus-wide totals FOLD from the count relations (rollup reuse)
    # instead of re-scanning the corpus
    cab = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .transform(pin_cache)
    )
    uni = (
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_t"))
        .transform(pin_cache)
    )
    totals = cab.agg(F.sum("n_ab").cast("double").alias("tp")).crossJoin(
        uni.agg(F.sum("n_t").cast("double").alias("tu"))
    )
    ua = uni.select(F.col("term").alias("a"), F.col("n_t").alias("na"))
    ub = uni.select(F.col("term").alias("b"), F.col("n_t").alias("nb"))
    pmi = F.log(
        (F.col("n_ab") / F.col("tp"))
        / ((F.col("na") / F.col("tu")) * (F.col("nb") / F.col("tu")))
    )
    scored = (
        cab.where(F.col("n_ab") >= PMI_MIN_COUNT)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "n_ab",
            (F.floor(pmi * 1000000 + F.lit(0.5)) / 1000000).alias("pmi"),
        )
    )
    w = Window.partitionBy().orderBy(F.col("pmi").desc(), "a", "b")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("a", "b", "n_ab", "pmi", "rnk")
    )


# Frozen BPE merge table (in application order), as trained offline by
# bpe_train_merges — tokenizer APPLICATION takes a given vocab; freezing
# it keeps the operator SF-independent and oracle-replayable.
BPE_APPLY_RULES = (
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
    ("j", "o"), ("jo", "i"), ("joi", "n"),
)


def _bpe_oracle_expr() -> str:
    """Unrolled merge passes over the rule table (DuckDB list_reduce has
    no separate-init form, so the accumulator is a list-of-symbols and
    each element rides in as a single-symbol list)."""
    expr = "string_split_regex(w, '')"
    for a, b in BPE_APPLY_RULES:
        expr = f"""list_reduce(
          list_transform({expr}, s -> [s]),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '{a}' AND x[1] = '{b}'
                           THEN list_append(acc[1:len(acc)-1], '{a}{b}')
                           ELSE list_concat(acc, x) END)"""
    return expr


@register(
    "pipeline_bpe_encode",
    oracle=f"""
    WITH encs AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), w -> {_bpe_oracle_expr()}) AS e
      FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(e, x -> len(x))) AS BIGINT) AS n_syms,
           CAST(len(e) AS BIGINT) AS n_words,
           array_to_string(e[1], '|') AS first_enc
    FROM encs
    """,
)
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale: encode every word of every
    document with a frozen BPE merge table (the output of
    bpe_train_merges), greedy left-to-right, one pass per rule in
    training order — the exact fold the trainer used, now applied with
    the rules as broadcast-constant expressions. Pure JVM higher-order
    functions: no Python, no shuffle, no join — the whole operator is
    a map stage over the corpus scan, which is what tokenization must
    be at 100 TB (it runs over every byte of the corpus; anything
    beyond a scan-projection would dominate the pipeline). The oracle
    replays the identical fold per rule (unrolled), so the encoding is
    verified token-for-token via first_enc and count-exactly via
    n_syms."""
    d = load_table(spark, sf_dir, "documents")
    empty = F.array().cast("array<string>")

    def merge_pass(sym_col, a: str, b: str):
        return F.aggregate(
            sym_col,
            empty,
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    def encode(w):
        col = F.split(w, "")
        for a, b in BPE_APPLY_RULES:
            col = merge_pass(col, a, b)
        return col

    # Encode each DISTINCT word once and join the encodings back to the
    # word-occurrence stream (r13 opt round): the 14-rule fold is an
    # interpreted HOF chain with O(len^2) array-concat accumulators, and
    # running it per OCCURRENCE re-paid it for every duplicate word —
    # |vocabulary| folds instead of |occurrences| is a ~50x CPU cut
    # (measured 20.1 -> see OPTIMIZATION_r13.md). Per-word encodings are
    # identical, so per-doc aggregates are identical: n_syms =
    # sum(|enc(w)|) over the doc's words, n_words = the word count,
    # first_enc = the pos-0 word's encoding (min_by on the posexplode
    # index). No forced broadcast hint on the vocab join: vocabulary
    # grows with corpus (Heaps' law), so AQE must keep the size-based
    # fallback. The per-doc groupBy partial-aggregates map-side (a doc's
    # words stay in one scan partition), so the exchange carries ~one
    # row per doc.
    occ = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    venc = occ.select("w").distinct().select("w", encode(F.col("w")).alias("enc"))
    return (
        occ.join(venc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.size("enc")).cast("bigint").alias("n_syms"),
            F.count("*").cast("bigint").alias("n_words"),
            F.concat_ws("|", F.min_by("enc", "pos")).alias("first_enc"),
        )
    )


@register(
    "stats_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             length(text) AS n_chars
      FROM documents
    ),
    wide AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
             CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens,
             round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
             1.0 - CAST(count(DISTINCT text) AS DOUBLE) / count(*) AS dup_fraction,
             CAST(count(*) FILTER (lang = 'en') AS DOUBLE) / count(*) AS frac_en
      FROM base
      HAVING count(*) > 0
    )
    SELECT metric, floor(value * 1000000 + 0.5) / 1000000 AS value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM wide
      UNION ALL SELECT 'total_tokens', total_tokens FROM wide
      UNION ALL SELECT 'mean_tokens', mean_tokens FROM wide
      UNION ALL SELECT 'p50_tokens', p50_tokens FROM wide
      UNION ALL SELECT 'dup_fraction', dup_fraction FROM wide
      UNION ALL SELECT 'frac_en', frac_en FROM wide
    )
    """,
)
def stats_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the one-page summary a training-data release ships
    (size, token budget, central tendency, exact-duplicate rate,
    language mix) — six metrics from ONE corpus scan: a single wide
    aggregate row (map-side combined; the duplicate rate's exact
    count-distinct is the only expensive term, swapped for HLL at real
    scale) stacked into (metric, value) rows, the stats_column_profile
    unpivot pattern. Integer-over-integer ratios and an interpolated
    median, all under the floor ladder."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "text",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    # ratios guarded on count > 0: an empty corpus must yield ZERO card
    # rows on both engines (the oracle's HAVING), not an ANSI
    # divide-by-zero here vs a NULL/inf row there
    n = F.count("*")
    wide = base.agg(
        n.cast("double").alias("n_docs"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.when(n > 0, F.sum("n_tokens").cast("double") / n).alias("mean_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
        F.when(
            n > 0, F.lit(1.0) - F.count_distinct("text").cast("double") / n
        ).alias("dup_fraction"),
        F.when(
            n > 0,
            F.count(F.when(F.col("lang") == "en", 1)).cast("double") / n,
        ).alias("frac_en"),
    ).where(F.col("n_docs") > 0)
    stacked = wide.selectExpr(
        "stack(6, 'n_docs', n_docs, 'total_tokens', total_tokens,"
        " 'mean_tokens', mean_tokens, 'p50_tokens', p50_tokens,"
        " 'dup_fraction', dup_fraction, 'frac_en', frac_en) AS (metric, value)"
    )
    return stacked.select(
        "metric", (F.floor(F.col("value") * 1000000 + F.lit(0.5)) / 1000000).alias("value")
    )


# Laplace-smoothed bigram NLL, shared verbatim by text_perplexity_bigram
# and filter_perplexity_band so the model convention cannot drift
# between the scorer and the band filter built on it.
_PPL_ORACLE_CTES = """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT doc_id, t[i] AS a, t[i + 1] AS b
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u
      WHERE len(t) >= 2
    ),
    cab AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY a, b),
    uni AS (
      SELECT term, count(*) AS n_t
      FROM toks, LATERAL (SELECT unnest(t) AS term) v
      GROUP BY term
    ),
    vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
    scored AS (
      SELECT p.doc_id,
             CAST(floor(-ln((cab.n_ab + 1.0) / (ua.n_t + v))
                        * 1000000000000 + 0.5) AS BIGINT) AS c
      FROM pairs p
      JOIN cab ON cab.a = p.a AND cab.b = p.b
      JOIN uni ua ON ua.term = p.a
      CROSS JOIN vocab
    ),
    perdoc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             floor(CAST(sum(c) AS DOUBLE) / 1000000000000 / count(*)
                   * 1000000 + 0.5) / 1000000 AS nll
      FROM scored GROUP BY doc_id
    )"""


@register(
    "text_perplexity_bigram",
    oracle=f"""
    WITH {_PPL_ORACLE_CTES}
    SELECT doc_id, n_bigrams, nll FROM perdoc
    """,
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring — the CCNet-style perplexity
    filter: train Laplace-smoothed bigram probabilities ON the corpus,
    score every document by its mean negative log-likelihood (low =
    fluent/typical, high = noise — the standard cheap fluency signal
    for LLM corpus filtering, usually thresholded downstream with
    filter_quality_percentile). One explode builds the per-doc bigram
    stream; the model tables (bigram counts, unigram counts, vocab
    size) join back onto it by equi-key. The joins carry NO forced
    broadcast hint: on real web text, distinct bigram TYPES grow
    near-linearly with corpus size (heaps' law on pairs), so at 100 TB
    the (a, b, n_ab) model relation is hundreds of GB — far past
    Spark's 8 GB broadcast ceiling — and a forced hint would disable
    AQE's size-based fallback and kill the job the day the vocabulary
    opens up. Instead AQE picks the strategy from measured sizes:
    broadcast while the model is small (this fixture's closed
    vocabulary), shuffle-hash/sort-merge on the equi-keys once it
    isn't. Only the ONE-ROW vocab total keeps a hint. Per-bigram NLL
    terms floor-quantize to scaled integers before the per-doc sum
    (the gram-matrix rule), so within-doc summation order is exact."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # Tokens enter as xxhash64 LONGS (the shingle-ladder trick,
    # llm_dedup._shingle_hash_arr): identity only ever feeds equality
    # (count groupBys, scoring joins, the vocab count), so the pinned
    # stream caches two 8-byte ids per bigram instead of two strings
    # and every downstream exchange keys on longs. Exact up to 64-bit
    # collisions — the string-side oracle would surface one as a hash
    # mismatch.
    pairs = (
        d.where(F.size(toks) >= 2)
        .select("doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("th"))
        .select(
            "doc_id",
            F.posexplode(F.expr("slice(th, 1, size(th) - 1)")).alias("i", "a"),
            F.col("th"),
        )
        .select("doc_id", "a", F.expr("th[i + 1]").alias("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager pins (the connected_components rule): pairs feeds the
    # bigram-count aggregate AND the scoring join's probe side; uni
    # feeds the vocab total AND the broadcast model join — independent
    # stages of one action race an unpopulated cache and re-run the
    # corpus explodes concurrently ("Block rdd_N already exists").
    pairs.count()
    cab = pairs.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    uni = (
        d.select(F.explode(F.transform(toks, lambda t: F.xxhash64(t))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    uni.count()
    vocab = uni.agg(F.count("*").cast("double").alias("v"))
    nll_term = -F.log(
        (F.col("n_ab") + 1.0) / (F.col("n_t") + F.col("v"))
    )
    scored = (
        pairs.join(cab, ["a", "b"])
        .join(uni.select(F.col("term").alias("a"), "n_t"), "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(nll_term * 1000000000000 + F.lit(0.5)).alias("c"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (
            F.floor(
                F.sum("c").cast("double") / 1000000000000 / F.count("*") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("nll"),
    )


PPL_BAND_BUCKET = 1 << 28  # integer-NLL bucket for the two-level prefix rank
PPL_BAND_NAMES = ("head", "middle", "tail")


@register(
    "filter_perplexity_band",
    oracle=f"""
    WITH {_PPL_ORACLE_CTES},
    si AS (
      SELECT doc_id, n_bigrams, nll,
             CAST(floor(nll * 1000000 + 0.5) AS BIGINT) AS s
      FROM perdoc
    ),
    h AS (SELECT s, count(*) AS c FROM si GROUP BY s),
    r AS (
      SELECT s, CAST(sum(c) OVER (ORDER BY s) - c AS BIGINT) AS less
      FROM h
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM si),
    bands AS (
      SELECT s, CAST(least(2, less * 3 // n) AS BIGINT) AS band
      FROM r, total
    )
    SELECT si.doc_id, si.n_bigrams, si.nll, b.band,
           CASE b.band WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                       ELSE 'tail' END AS band_name
    FROM si JOIN bands b USING (s)
    """,
)
def filter_perplexity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail banding (Wenzek et al. 2020): score every
    document with the corpus-trained bigram LM (text_perplexity_bigram,
    shared CTE so the model convention cannot drift), then split the
    corpus into perplexity TERCILES — head = most fluent third, kept
    outright; middle = kept or re-sampled; tail = usually dropped. The
    standard decision CCNet pipelines publish per language bucket.

    The tercile rank is EXACT but never uses a corpus-sized
    single-partition window: ranks come from the two-level distributed
    prefix pattern (ml_auc_roc's machinery) — bucket the integer NLL by
    div 2^28, cumulate bucket subtotals in a window over the tiny
    bucket relation, broadcast the offsets back, and rank within
    buckets only. The |distinct NLL| band table then broadcasts onto
    the scored corpus, so at 100 TB the corpus-sized relations cross
    one exchange (the NLL histogram's) and the banding itself is
    map-side. Ties share a rank, hence a band, on both engines; the
    band key is the exact integer floor(nll*1e6 + 0.5), immune to the
    (k/1e6)*1e6 ulp trap."""
    from pyspark import StorageLevel

    perdoc = text_perplexity_bigram(spark, sf_dir)
    si = perdoc.select(
        "doc_id",
        "n_bigrams",
        "nll",
        F.floor(F.col("nll") * 1000000 + F.lit(0.5)).cast("bigint").alias("s"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Eager pin (the connected_components rule): si's subtree is the
    # ENTIRE perplexity pipeline (explode + model joins + per-doc agg),
    # and three independent branches of one action consume it (the
    # histogram, the total, and the final join) — an unpopulated cache
    # races and the pipeline computes concurrently more than once.
    si.count()
    h = si.groupBy("s").agg(F.count("*").alias("c")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Eager pin: h feeds two independent branches of the final action
    # (the koff/off bucket-offset chain and the within-bucket ranked
    # side) — same cache-population race class as si above.
    h.count()
    ks = h.withColumn("k", F.expr(f"s div {PPL_BAND_BUCKET}"))
    koff = ks.groupBy("k").agg(F.sum("c").alias("kc"))
    wk = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = koff.select("k", (F.sum("kc").over(wk) - F.col("kc")).alias("off"))
    ww = (
        Window.partitionBy("k")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = ks.join(F.broadcast(off), "k").select(
        "s",
        (F.col("off") + F.sum("c").over(ww) - F.col("c")).cast("bigint").alias("less"),
    )
    total = si.agg(F.count("*").cast("bigint").alias("n"))
    bands = ranked.crossJoin(F.broadcast(total)).select(
        "s",
        F.least(F.lit(2), F.expr("(less * 3) div n")).cast("bigint").alias("band"),
    )
    name = (
        F.when(F.col("band") == 0, PPL_BAND_NAMES[0])
        .when(F.col("band") == 1, PPL_BAND_NAMES[1])
        .otherwise(PPL_BAND_NAMES[2])
    )
    return si.join(F.broadcast(bands), "s").select(
        "doc_id", "n_bigrams", "nll", "band", name.alias("band_name")
    )


# Gopher quality rules (Rae et al. 2021, A1.1), fixture-calibrated:
# the published bounds are word count [50, 100k] and mean word length
# [3, 10]; this corpus is a bounded synthetic keyword stream (words
# 3.7-5.3 chars, docs 10-99 words), so the thresholds move inside the
# observed range to keep every rule NON-DEGENERATE (both pass and fail
# rows at the driver SF — the r8 fixture-degeneracy discipline). The
# symbol-ratio, bullet-line, and alphabetic-word rules are omitted
# outright: the fixture has no symbols, no newlines, and alpha_frac is
# 1.0 on every row, so their flags would attest nothing.
GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MWL = 4   # mean word length bounds, applied integer-exactly:
GOPHER_MAX_MWL = 5   # sum(len) >= 4*n  and  sum(len) <= 5*n
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2


@register(
    "filter_gopher_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(list_reduce(list_prepend(0, list_transform(w, x -> len(x))),
                              (a, b) -> a + b) AS BIGINT) AS chars_sum,
             CAST(len(list_filter(w, x -> x IN ({_sql_list(GOPHER_STOPWORDS)})))
                  AS BIGINT) AS stop_hits
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
    SELECT doc_id, n_words,
           floor(chars_sum * 1.0 / n_words * 1000000 + 0.5) / 1000000
             AS mean_word_len,
           stop_hits,
           n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
             AS ok_word_count,
           chars_sum >= {GOPHER_MIN_MWL} * n_words
             AND chars_sum <= {GOPHER_MAX_MWL} * n_words AS ok_mean_word_len,
           stop_hits >= {GOPHER_MIN_STOP_HITS} AS ok_stopwords,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AND chars_sum >= {GOPHER_MIN_MWL} * n_words
             AND chars_sum <= {GOPHER_MAX_MWL} * n_words
             AND stop_hits >= {GOPHER_MIN_STOP_HITS} AS keep
    FROM m
    """,
)
def filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021): per-document
    boolean flags for each heuristic — word-count bounds, mean-word-
    length bounds, minimum stop-word hits — plus the conjunctive keep
    decision, emitted per rule so downstream reporting can attribute
    WHY a document was dropped (the per-rule attribution is the point;
    a bare keep flag hides which heuristic fired). Pure map-side array
    arithmetic: zero shuffles, zero joins — the plan is a single scan
    projection at any corpus size. The mean-word-length bounds apply as
    integer cross-multiplications (chars_sum >= 4*n_words), so no FP
    comparison sits on a rule boundary; the reported mean itself floor-
    quantizes at 1e-6. Thresholds are fixture-calibrated (see the
    constants above) so every rule has both pass and fail rows."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    m = d.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)),
            F.lit(0),
            lambda a, b: a + b,
        ).cast("bigint").alias("chars_sum"),
        F.size(
            F.filter(w, lambda x: x.isin(*GOPHER_STOPWORDS))
        ).cast("bigint").alias("stop_hits"),
    )
    ok_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_mwl = (
        F.col("chars_sum") >= GOPHER_MIN_MWL * F.col("n_words")
    ) & (F.col("chars_sum") <= GOPHER_MAX_MWL * F.col("n_words"))
    ok_stop = F.col("stop_hits") >= GOPHER_MIN_STOP_HITS
    return m.select(
        "doc_id",
        "n_words",
        (
            F.floor(
                F.col("chars_sum").cast("double") / F.col("n_words") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mean_word_len"),
        "stop_hits",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_stop).alias("keep"),
    )


# DSIR (Data Selection with Importance Resampling, Xie et al., NeurIPS
# 2023): fixed hashed-bigram feature space, so the model relation is
# B-bounded BY CONSTRUCTION — corpus-independent and legitimately
# broadcastable, unlike the open-vocabulary bigram LM above.
DSIR_BUCKETS = 8192
DSIR_TARGET_SOURCE = "src0"  # the "target domain" corpus slice
DSIR_K = 100  # resample size
# char-fold word hash shared with text_fingerprint: h=7; h=(h*31+c)%1e9+7
_DSIR_WORD_HASH_SQL = (
    "list_reduce(list_prepend(CAST(7 AS BIGINT), "
    "list_transform(string_split_regex({w}, ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (h, c) -> (h * 31 + c) % 1000000007)"
)


@register(
    "filter_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    pairs AS (
      SELECT doc_id, source, t[i] AS a, t[i + 1] AS b
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u
      WHERE len(t) >= 2
    ),
    feats AS (
      SELECT doc_id, source,
             ({_DSIR_WORD_HASH_SQL.format(w='a')} * 31
              + {_DSIR_WORD_HASH_SQL.format(w='b')}) % {DSIR_BUCKETS} AS bucket
      FROM pairs
    ),
    tcnt AS (
      SELECT bucket, count(*) AS tb FROM feats
      WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY bucket
    ),
    scnt AS (
      SELECT bucket, count(*) AS sb FROM feats
      WHERE source <> '{DSIR_TARGET_SOURCE}' GROUP BY bucket
    ),
    tt AS (SELECT CAST(coalesce(sum(tb), 0) AS DOUBLE) AS t_total FROM tcnt),
    st AS (SELECT CAST(sum(sb) AS DOUBLE) AS s_total FROM scnt),
    model AS (
      SELECT s.bucket,
             CAST(floor((ln((coalesce(t.tb, 0) + 1.0) / (tt.t_total + {DSIR_BUCKETS}))
                       - ln((s.sb + 1.0) / (st.s_total + {DSIR_BUCKETS})))
                        * 1000000000000 + 0.5) AS BIGINT) AS c
      FROM scnt s LEFT JOIN tcnt t USING (bucket), tt, st
    ),
    perdoc AS (
      SELECT f.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(m.c) AS BIGINT) AS s
      FROM feats f JOIN model m USING (bucket)
      WHERE f.source <> '{DSIR_TARGET_SOURCE}'
      GROUP BY f.doc_id
    ),
    gum AS (
      SELECT doc_id, n_bigrams, s,
             CAST(floor(-ln(-ln(
               (CAST((doc_id % 1000003) * 2654435761 % 1000003 AS DOUBLE) + 1.0)
               / 1000004.0)) * 1000000000000 + 0.5) AS BIGINT) AS g
      FROM perdoc
    )
    SELECT doc_id, n_bigrams,
           floor(CAST(s AS DOUBLE) / 1000000000000 * 1000000 + 0.5) / 1000000
             AS logw
    FROM gum
    ORDER BY s + g DESC, doc_id
    LIMIT {DSIR_K}
    """,
)
def filter_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): score every
    raw-corpus document by its target-over-source likelihood ratio
    under two Laplace-smoothed bag-of-hashed-bigram models — the target
    model fit on the DSIR_TARGET_SOURCE slice, the source model on
    everything else — then resample the top-k via deterministic Gumbel-top-k
    (log w_i + Gumbel(hash(doc_id)) is a weighted sample without
    replacement, the standard trick, made replayable by deriving the
    Gumbel uniform from the overflow-safe multiplicative doc_id hash).

    Scale shape at 100 TB: one corpus explode into bigrams, char-fold
    word hashing entirely map-side (the same fingerprint fold both
    engines verify bit-for-bit), TWO B-bounded aggregates (B = 8192
    buckets FIXED by construction — this model relation legitimately
    broadcasts, in contrast to text_perplexity_bigram's open-vocabulary
    model where a forced hint would eventually exceed the 8 GB
    ceiling), one n-row doc-keyed shuffle for the per-doc sum, and a
    global top-k via TakeOrderedAndProject — never a full sort. The
    hashed feature relation persists once with an eager pin (three
    consumers: both model aggregates and the scoring probe).

    FP ladder: per-bucket log-ratios floor-quantize to 1e12-scaled
    BIGINTs before the per-doc integer sum (gram-matrix rule), and the
    Gumbel perturbation quantizes on the same scale, so the selection
    ORDER BY is a pure-integer comparison in both engines."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def whash(col):
        return F.aggregate(
            F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
            F.lit(7).cast("long"),
            lambda h, c: (h * 31 + c) % 1000000007,
        )

    # Hash each TOKEN once into a per-doc hash array, then form bigram
    # buckets by zipping the array against itself shifted by one — the
    # char fold runs once per token instead of twice per bigram (each
    # interior token is both the 'b' of one bigram and the 'a' of the
    # next), halving the dominant CPU cost, and the explode carries one
    # BIGINT instead of two strings. Same math, same oracle.
    hs = F.transform(toks, whash)
    buckets = F.zip_with(
        F.slice(hs, F.lit(1), F.size(hs) - 1),
        F.slice(hs, F.lit(2), F.size(hs) - 1),
        lambda ha, hb: (ha * 31 + hb) % DSIR_BUCKETS,
    )
    feats = (
        d.where(F.size(toks) >= 2)
        .select("doc_id", "source", F.explode(buckets).alias("bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager pin (the connected_components rule): feats feeds the two
    # model aggregates and the scoring probe — independent stages.
    feats.count()
    is_target = F.col("source") == DSIR_TARGET_SOURCE
    tcnt = feats.where(is_target).groupBy("bucket").agg(
        F.count("*").alias("tb")
    )
    scnt = feats.where(~is_target).groupBy("bucket").agg(
        F.count("*").alias("sb")
    )
    tt = tcnt.agg(F.coalesce(F.sum("tb"), F.lit(0)).cast("double").alias("t_total"))
    st = scnt.agg(F.sum("sb").cast("double").alias("s_total"))
    lr = F.log(
        (F.coalesce(F.col("tb"), F.lit(0)) + 1.0)
        / (F.col("t_total") + F.lit(float(DSIR_BUCKETS)))
    ) - F.log((F.col("sb") + 1.0) / (F.col("s_total") + F.lit(float(DSIR_BUCKETS))))
    model = (
        scnt.join(tcnt, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(st))
        .select(
            "bucket",
            F.floor(lr * 1000000000000 + F.lit(0.5)).cast("bigint").alias("c"),
        )
    )
    perdoc = (
        feats.where(~is_target)
        .join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("c").cast("bigint").alias("s"),
        )
    )
    u = (
        (F.col("doc_id") % 1000003) * F.lit(2654435761) % 1000003
    ).cast("double") + F.lit(1.0)
    g = F.floor(
        -F.log(-F.log(u / 1000004.0)) * 1000000000000 + F.lit(0.5)
    ).cast("bigint")
    return (
        perdoc.withColumn("score_q", F.col("s") + g)
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(DSIR_K)
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.floor(
                    F.col("s").cast("double") / 1000000000000 * 1000000 + F.lit(0.5)
                )
                / 1000000
            ).alias("logw"),
        )
    )


# Same overflow-safe multiplicative hash family as SPLIT_HASH, keyed on
# doc_id alone: the within-band shuffle key.
CURRICULUM_SHUFFLE = "((doc_id % 1000000007) * 2654435761) % 1000000007"


@register(
    "pipeline_curriculum_order",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    counts AS (SELECT n_tokens, count(*) AS c FROM t GROUP BY n_tokens),
    cum AS (
      SELECT n_tokens, c,
             coalesce(sum(c) OVER (ORDER BY n_tokens
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cb
      FROM counts
    ),
    total AS (SELECT sum(c) AS n FROM counts),
    bands AS (
      SELECT n_tokens, CAST(least(9, cb * 10 // n) AS BIGINT) AS band
      FROM cum, total
    )
    SELECT t.doc_id, t.source, t.n_tokens, b.band,
           ({CURRICULUM_SHUFFLE}) AS shuffle_key
    FROM t JOIN bands b USING (n_tokens)
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: every document gets its
    difficulty band (token-count decile — short/easy first) and a
    deterministic within-band shuffle key, so the training loader
    reads `ORDER BY band, shuffle_key` — monotone difficulty with
    decorrelated content inside each band, reproducible under task
    retry (seeded hash, no RNG). The decile assignment reuses the
    equi-depth histogram-of-histograms rewrite (the cumulative window
    runs over the token-count DOMAIN, never the corpus), the band
    table broadcasts back onto the corpus scan, and the actual
    ordering is a write-side repartitionByRange + sortWithinPartitions
    — the engine emits the KEYS; no global sort ever materializes in
    the query."""

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).transform(pin_cache)
    counts = (
        t.groupBy("n_tokens").agg(F.count("*").alias("c"))
        .transform(pin_cache)
    )
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "n_tokens", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cb")
    )
    total = counts.agg(F.sum("c").alias("n"))
    bands = cum.crossJoin(F.broadcast(total)).select(
        "n_tokens",
        F.expr("CAST(least(9, (cb * 10) div n) AS BIGINT)").alias("band"),
    )
    return t.join(F.broadcast(bands), "n_tokens").select(
        "doc_id",
        "source",
        "n_tokens",
        "band",
        F.expr(CURRICULUM_SHUFFLE).alias("shuffle_key"),
    )


HH_K = 40  # heavy-hitter threshold denominator: report freq > n/HH_K


@register(
    "text_heavy_hitters",
    bench=True,
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT term, count(*) AS cnt
    FROM tok, tot
    GROUP BY term, n
    HAVING count(*) * {HH_K} > n
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent terms via the classic two-pass distributed
    heavy-hitters algorithm: a bounded-memory Misra-Gries sketch per
    partition proposes candidates, then ONE exact counting pass over
    just those candidates verifies them against the freq > n/HH_K
    bar. The MG guarantee makes the candidate union a SUPERSET of the
    true heavy hitters (a term with global freq > n/k must exceed
    n_p/k in at least one partition, by pigeonhole), and the verify
    pass makes the OUTPUT exact — which is why this sketch operator
    has a real SQL oracle while HLL/approx-distinct stay rows-only.

    Scale shape: the sketch pass streams each partition once in Arrow
    batches; the carried state is trimmed back to <= HH_K counters
    after EACH batch fold, so peak memory is HH_K plus one batch's
    vocabulary (bounded by the Arrow batch size knob) — never a
    per-partition hashmap of the full corpus vocabulary, which is the
    point of MG at 100 TB: a skewed token stream can't OOM a task.
    Candidates are <= HH_K
    per partition, so the verify pass is a broadcast semi join onto
    the token explode plus one map-side-combined count, and the corpus
    total folds in as a 1-row broadcast (the tfidf lesson — no eager
    count() job). Threshold comparison is integer-exact
    (cnt * HH_K > n) so the two engines cannot diverge by a ulp."""
    d = load_table(spark, sf_dir, "documents")
    k = HH_K

    # self-contained closure (pickled by value; see multimodal.py).
    # Batched Misra-Gries via mergeable summaries (Agarwal et al.,
    # PODS'12): each Arrow batch's exact value_counts (itself an
    # error-0 MG summary) merges into the running counters by summing,
    # then subtracting the (k+1)-st largest combined count from all and
    # dropping non-positives — at most k counters survive and the
    # undercount error stays <= n_p/(k+1), so the superset property the
    # verify pass relies on is identical to token-at-a-time MG. The
    # fold is entirely vectorized pandas (split/explode/value_counts);
    # the previous per-token Python dict loop pushed the whole corpus
    # through the interpreter one op at a time. Peak memory is
    # O(batch vocabulary), bounded by the Arrow batch size, never the
    # corpus vocabulary.
    def mg_partition(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        for pdf in batches:
            chunk = pdf["text"].str.split(" ").explode().value_counts()
            combined = counters.add(chunk, fill_value=0)
            if len(combined) > k:
                cut = combined.nlargest(k + 1).iloc[-1]
                combined = combined[combined > cut] - cut
            counters = combined
        yield pd.DataFrame({"term": counters.index.astype(str)})

    candidates = d.select("text").mapInPandas(mg_partition, "term string").distinct()
    # pin_cache, not a lazy persist: toks feeds BOTH the 1-row total
    # aggregate and the candidate-scoring join — two independent
    # branches of the one final action race an unpopulated cache (the
    # r10 full-sweep race gate caught exactly this site under load)
    toks = d.select(F.explode(F.split("text", " ")).alias("term")).transform(
        pin_cache
    )
    total = toks.agg(F.count("*").alias("n"))
    return (
        toks.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n"))
        .select("term", "cnt")
    )


N_SHARDS = 16
# Same overflow-safe multiplicative hash family as SPLIT_HASH, mapped
# onto the shard count instead of percent buckets.
SHARD_HASH = f"((doc_id % 1000000007) * 2654435761) % 1000000007 % {N_SHARDS}"


@register(
    "pipeline_shard_assignment",
    oracle=f"""
    SELECT {SHARD_HASH} AS shard,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_bytes,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """,
)
def pipeline_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding for the training-export path — the
    step between curation and the trainer's data loader: every doc maps
    to one of N_SHARDS shards by the same overflow-safe multiplicative
    id hash as pipeline_dataset_split (stable under corpus growth and
    task retry, no RNG), and the query emits the per-shard census
    (docs, whitespace tokens, bytes, id range) that export jobs use to
    verify shard BALANCE before writing — a skewed shard is a straggler
    executor at write time and a hot data-loader worker at train time.
    At 100 TB the same expression is the DataFrameWriter's bucketBy /
    repartition key, so the census is a free byproduct of the write
    shuffle; integer-exact arithmetic end to end (no FP ladder needed).
    Plan: one map-side-combined corpus aggregation, N_SHARDS output
    rows."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.expr(SHARD_HASH).alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens"),
            F.sum(F.length("text").cast("bigint")).alias("n_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "text_vocab_entropy",
    oracle="""
    WITH cells AS (
      SELECT d.lang, u.tok, count(*) AS c
      FROM documents d, LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
      GROUP BY d.lang, u.tok
    ),
    tot AS (SELECT lang, sum(c) AS n FROM cells GROUP BY lang),
    contrib AS (
      SELECT cells.lang,
             CAST(floor((c * 1.0 / n) * log2(c * 1.0 / n)
                        * -1000000000000 + 0.5) AS BIGINT) AS e,
             n
      FROM cells JOIN tot ON cells.lang = tot.lang
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_tokens,
           count(*) AS vocab_size,
           CAST(sum(e) AS DOUBLE) / 1000000000000 AS entropy_bits
    FROM contrib GROUP BY lang
    """,
)
def text_vocab_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Shannon entropy (bits/token) of the unigram
    distribution — the corpus-diversity dial curation reports track
    alongside quality scores: entropy collapsing over a snapshot means
    the crawl is converging on boilerplate; comparing languages
    normalizes mixing weights (see mix_domain_weights). One corpus
    shuffle on (lang, token) with map-side partial counts; per-lang
    totals fold from the persisted cell relation (never re-scanning
    the corpus) and broadcast back onto it; the -p*log2(p) terms
    floor-quantize to scaled integers before the per-lang sum (the
    gram-matrix rule) so partial-aggregation order cannot move the
    total between engines. Output is |langs| rows."""

    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
        .transform(pin_cache)
    )
    tot = cells.groupBy("lang").agg(F.sum("c").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    contrib = cells.join(F.broadcast(tot), "lang").select(
        "lang",
        F.floor(p * F.log2(p) * -1000000000000 + F.lit(0.5)).alias("e"),
        "n",
    )
    return contrib.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        (F.sum("e").cast("double") / 1000000000000).alias("entropy_bits"),
    )


ZIPF_HEAD = 1000  # fit over the top-1000 ranks (the standard head fit)


@register(
    "text_zipf_slope",
    oracle=f"""
    WITH cnts AS (
      SELECT u.tok, count(*) AS c
      FROM documents d, LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) u
      GROUP BY u.tok
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM cnts
    ),
    pts AS (
      SELECT CAST(floor(ln(r) * 1000000000000 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(c) * 1000000000000 + 0.5) AS BIGINT) AS y,
             CAST(floor(ln(r) * ln(c) * 1000000000000 + 0.5) AS BIGINT) AS xy,
             CAST(floor(ln(r) * ln(r) * 1000000000000 + 0.5) AS BIGINT) AS xx
      FROM ranked WHERE r <= {ZIPF_HEAD}
    ),
    sums AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS DOUBLE) / 1000000000000 AS sx,
             CAST(sum(y) AS DOUBLE) / 1000000000000 AS sy,
             CAST(sum(xy) AS DOUBLE) / 1000000000000 AS sxy,
             CAST(sum(xx) AS DOUBLE) / 1000000000000 AS sxx
      FROM pts
    )
    SELECT (SELECT count(*) FROM cnts) AS vocab_size,
           n AS n_fit,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                 * 1000000 + 0.5) / 1000000 AS zipf_slope
    FROM sums
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit — the corpus-health diagnostic: natural
    text follows freq ~ rank^s with s near -1; synthetic or
    deduplicate-starved corpora bend away from it, so training-data
    reports chart the fitted slope per snapshot. OLS of ln(freq) on
    ln(rank) over the top-ZIPF_HEAD ranks (the standard head fit — the
    tail is Poisson noise and would swamp the regression; the cutoff
    also bounds the quantized partial sums safely under int64). One
    corpus shuffle into token counts; the global rank is a window over
    the vocab relation (vocab-sized, never corpus-sized — the
    value-domain-bounded WindowExec class every drift stat in this
    repo uses); the four OLS moments floor-quantize to scaled integers
    per point and sum exactly, so the closed-form slope is computed
    from identical doubles on both engines (not regr_slope, whose
    internal accumulation order is engine-specific)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    cnts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )

    cnts = cnts.transform(pin_cache)
    ranked = cnts.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("c").desc(), "tok"))
    )
    lnr, lnc = F.log(F.col("r")), F.log(F.col("c"))
    q = F.lit(1000000000000)
    pts = ranked.where(F.col("r") <= ZIPF_HEAD).select(
        F.floor(lnr * q + F.lit(0.5)).alias("x"),
        F.floor(lnc * q + F.lit(0.5)).alias("y"),
        F.floor(lnr * lnc * q + F.lit(0.5)).alias("xy"),
        F.floor(lnr * lnr * q + F.lit(0.5)).alias("xx"),
    )
    sums = pts.agg(
        F.count("*").alias("n"),
        (F.sum("x").cast("double") / q).alias("sx"),
        (F.sum("y").cast("double") / q).alias("sy"),
        (F.sum("xy").cast("double") / q).alias("sxy"),
        (F.sum("xx").cast("double") / q).alias("sxx"),
    )
    vocab = cnts.agg(F.count("*").alias("vocab_size"))
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return vocab.crossJoin(F.broadcast(sums)).select(
        "vocab_size",
        F.col("n").alias("n_fit"),
        (F.floor(slope * 1000000 + F.lit(0.5)) / 1000000).alias("zipf_slope"),
    )


MIX_ALPHA = 0.3  # temperature exponent (the common multilingual setting)


@register(
    "sample_temperature_mix",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS total FROM per),
    shares AS (
      SELECT lang, n_tokens,
             n_tokens * 1.0 / total AS s,
             CAST(floor(pow(n_tokens * 1.0 / total, {MIX_ALPHA})
                        * 1000000000000 + 0.5) AS BIGINT) AS sq
      FROM per, tot
    ),
    norm AS (SELECT sum(sq) AS z FROM shares)
    SELECT lang, n_tokens,
           floor(s * 1000000 + 0.5) / 1000000 AS share,
           floor((sq * 1.0 / z) * 1000000 + 0.5) / 1000000 AS alpha_share,
           floor((sq * 1.0 / z) / s * 1000000 + 0.5) / 1000000 AS sample_factor
    FROM shares, norm
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing — the standard multilingual
    sampling policy (q_i ∝ s_i^alpha with alpha ≈ 0.3): high-resource
    languages are down-sampled and low-resource ones up-sampled so the
    training mix flattens toward uniform without discarding data; the
    emitted sample_factor (= q_i / s_i) is the per-language epoch
    multiplier the data loader applies. One map-side-combined
    groupBy(lang) aggregate, then pure arithmetic on the |langs|-row
    relation with a broadcast total. pow(s, alpha) runs on the
    identical IEEE double both engines derived, and the normalizer
    sums floor-quantized integers (the gram-matrix rule) so the
    k-term denominator cannot drift with aggregation order."""

    d = load_table(spark, sf_dir, "documents")
    per = (
        d.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"))
        .transform(pin_cache)
    )
    tot = per.agg(F.sum("n_tokens").alias("total"))
    s = F.col("n_tokens") * 1.0 / F.col("total")
    shares = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        s.alias("s"),
        F.floor(F.pow(s, F.lit(MIX_ALPHA)) * 1000000000000 + F.lit(0.5)).alias("sq"),
    ).transform(pin_cache)
    norm = shares.agg(F.sum("sq").alias("z"))
    q = F.col("sq") * 1.0 / F.col("z")
    return shares.crossJoin(F.broadcast(norm)).select(
        "lang",
        "n_tokens",
        (F.floor(F.col("s") * 1000000 + F.lit(0.5)) / 1000000).alias("share"),
        (F.floor(q * 1000000 + F.lit(0.5)) / 1000000).alias("alpha_share"),
        (F.floor(q / F.col("s") * 1000000 + F.lit(0.5)) / 1000000).alias("sample_factor"),
    )


@register(
    "text_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_syllables,
           floor((206.835 - 1.015 * n_words
                  - 84.6 * (n_syllables * 1.0 / n_words))
                 * 1000000 + 0.5) / 1000000 AS flesch_score
    FROM m WHERE n_words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease readability score, the classic lexical
    quality dial curation stacks report next to stopword/length ratios
    (text_quality_score): 206.835 - 1.015*(words/sentence) -
    84.6*(syllables/word), with syllables approximated as vowel-group
    runs ([aeiouy]+ — groups cannot span the space delimiter, so one
    whole-text regexp count equals the per-word sum) and each document
    treated as ONE sentence (the synthetic corpus carries no sentence
    punctuation; on real text swap in a sentence splitter upstream).
    Pure per-row JVM expressions inside whole-stage codegen — zero
    shuffles, embarrassingly parallel at any corpus size; the score is
    one fixed-shape IEEE expression over two integers on both engines,
    floor-quantized at 1e6 (ladder step 2)."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("bigint")
    n_syll = F.size(F.regexp_extract_all("text", F.lit("[aeiouy]+"), 0)).cast(
        "bigint"
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * F.col("n_words")
        - F.lit(84.6) * (F.col("n_syllables") * 1.0 / F.col("n_words"))
    )
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_syll.alias("n_syllables"),
        )
        .where(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_syllables",
            (F.floor(score * 1000000 + F.lit(0.5)) / 1000000).alias("flesch_score"),
        )
    )


# Demo lexicon for the toxicity/blocklist gate — production swaps in a
# real list (the operator shape is identical: a broadcast-small array
# bound into a JVM filter). Terms chosen to hit the fixtures' vocabulary
# so the driver row is non-trivial.
TOXICITY_LEXICON = ("slow", "fail", "error", "bad")
TOXICITY_THRESHOLD_PPM = 40000  # flag docs with > 4% lexicon tokens


@register(
    "classify_toxicity_lexicon",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains({list(TOXICITY_LEXICON)!r}, t)))
               AS BIGINT) AS n_hits
      FROM documents
    )
    SELECT doc_id, n_tokens, n_hits,
           floor(n_hits * 1000000.0 / n_tokens + 0.5) / 1000000 AS hit_ratio,
           n_hits * 1000000 > {TOXICITY_THRESHOLD_PPM} * n_tokens AS flagged
    FROM m WHERE n_tokens > 0
    """,
)
def classify_toxicity_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based content gate — the blocklist filter every corpus
    pipeline runs before anything model-based (cheap, auditable, and
    the usual first cut for toxicity / NSFW / spam): per document,
    count tokens hitting a fixed lexicon and flag docs whose hit rate
    clears a ppm threshold. The lexicon binds as an array literal into
    a JVM-side filter (production: a broadcast variable over a
    many-thousand-term list — never a join, the corpus must not
    shuffle for a dimension this small). Zero shuffles; the flag
    compares integer cross-products (hits * 1e6 > ppm * tokens), so no
    FP boundary exists for engines to disagree on; the reported ratio
    floor-quantizes at 1e6."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lex = F.array(*[F.lit(t) for t in TOXICITY_LEXICON])
    n_tokens = F.size(toks).cast("bigint")
    n_hits = F.size(F.filter(toks, lambda t: F.array_contains(lex, t))).cast(
        "bigint"
    )
    return (
        d.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_hits.alias("n_hits"),
        )
        .where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            "n_hits",
            (
                F.floor(F.col("n_hits") * 1000000.0 / F.col("n_tokens") + F.lit(0.5))
                / 1000000
            ).alias("hit_ratio"),
            (
                F.col("n_hits") * 1000000
                > F.lit(TOXICITY_THRESHOLD_PPM) * F.col("n_tokens")
            ).alias("flagged"),
        )
    )


BOILERPLATE_DF = 3  # a 3-gram in >= this many distinct docs is boilerplate


@register(
    "text_boilerplate_fraction",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) u
      WHERE len(t) >= 3
    ),
    df AS (
      SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN df.df >= {BOILERPLATE_DF} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_boiler,
           floor(sum(CASE WHEN df.df >= {BOILERPLATE_DF} THEN 1 ELSE 0 END)
                 * 1000000.0 / count(*) + 0.5) / 1000000 AS boiler_frac
    FROM grams JOIN df USING (g)
    GROUP BY grams.doc_id
    """,
)
def text_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate detector (the CCNet/C4 idea at the
    n-gram level): the fraction of a document's word-3-gram POSITIONS
    whose gram occurs in >= BOILERPLATE_DF distinct documents.
    Complements text_repetition_score (intra-doc duplication) and
    dedup_ngram_novelty (first-occurrence freshness): this one finds
    the nav-bars and license headers that are globally common without
    being anyone's duplicate.

    Plan: explode grams once, hash each gram to an 8-byte xxhash64 key
    AT THE SCAN (the raw ~20-byte string never leaves the map side —
    the same key convention as the jaccard inverted index,
    llm_dedup.py), persist only (doc_id, gh), ONE shuffle keyed on the
    hash for the distinct-doc DF aggregate, join the |vocab|-row DF
    relation back onto the persisted gram relation on the same key —
    the shuffle partitioning is REUSED, not repeated — then a per-doc
    count. At 100 TB the hashed key cuts shuffle volume ~10x vs raw
    strings and keeps every exchange fixed-width; a 64-bit collision
    (odds ~n^2/2^65) merges two grams' DF counts, which only matters
    if it crosses the BOILERPLATE_DF boundary — negligible and
    deterministic. The oracle replays the identical semantics over raw
    grams. The fraction floor-quantizes at 1e6 from an exact integer
    pair."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = (
        d.where(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 3),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, 3))),
                )
            ).alias("gh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager pin (the connected_components rule): the DF aggregate's map
    # stage and the join's probe-side map stage are INDEPENDENT stages
    # of one action, so an unpopulated cache races and the explode
    # computes TWICE concurrently ("Block rdd_N already exists" warns).
    # Measured at the 100x curve point: wall-clock neutral on this idle
    # 32-core box (the duplicate ran on spare cores), but the duplicate
    # WORK is real — on a busy cluster it's half the stage's throughput
    # — and for fan-outs where the duplicated subtree is a whole
    # shuffle pipeline it doubles wall-clock too (graph_source_
    # modularity: 659 -> 292 s from this same pin). count() once.
    grams.count()
    df = grams.groupBy("gh").agg(F.count_distinct("doc_id").alias("df"))
    boiler = (F.col("df") >= BOILERPLATE_DF).cast("long")
    return (
        grams.join(df, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(boiler).cast("bigint").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            (
                F.floor(F.col("n_boiler") * 1000000.0 / F.col("n_grams") + F.lit(0.5))
                / 1000000
            ).alias("boiler_frac"),
        )
    )


CHUNK_LEN = 64  # context window, whitespace tokens
CHUNK_STRIDE = 48  # overlap = CHUNK_LEN - CHUNK_STRIDE = 16 tokens


@register(
    "pipeline_context_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    c AS (
      SELECT doc_id, t, len(t) AS n,
             (greatest(len(t) - {CHUNK_LEN}, 0) + {CHUNK_STRIDE} - 1)
               // {CHUNK_STRIDE} + 1 AS n_chunks
      FROM toks
    ),
    x AS (
      SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS i FROM c
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(least({CHUNK_LEN}, n - i * {CHUNK_STRIDE}) AS BIGINT) AS chunk_tokens,
           array_to_string(
             t[i * {CHUNK_STRIDE} + 1 :
               i * {CHUNK_STRIDE} + least({CHUNK_LEN}, n - i * {CHUNK_STRIDE})],
             ' ') AS chunk_text
    FROM x
    """,
)
def pipeline_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document context chunking: explode each document into
    overlapping CHUNK_LEN-token windows advancing by CHUNK_STRIDE —
    the doc-splitting step a RAG indexer or a fixed-context trainer
    runs before embedding/packing (pipeline_sequence_packing is the
    concat-then-chunk alternative; this one never crosses document
    boundaries and keeps a CHUNK_LEN-CHUNK_STRIDE token overlap so no
    span is split across chunks without context). Chunk count per doc
    is ceil(max(n - CHUNK_LEN, 0) / CHUNK_STRIDE) + 1, so every token
    is covered and the final chunk is never empty. Pure per-row
    split/sequence/explode/slice inside whole-stage codegen — no
    shuffle, embarrassingly parallel at any corpus size; at 100 TB the
    output is written partitioned by shard, never re-collected."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("t")).withColumn(
        "n", F.size("t").cast("bigint")
    )
    n_chunks = F.expr(
        f"(greatest(n - {CHUNK_LEN}, 0) + {CHUNK_STRIDE} - 1) "
        f"div {CHUNK_STRIDE} + 1"
    )
    x = t.withColumn("i", F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)))
    start = F.col("i") * CHUNK_STRIDE
    clen = F.least(F.lit(CHUNK_LEN).cast("bigint"), F.col("n") - start)
    return x.select(
        "doc_id",
        F.col("i").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        clen.cast("bigint").alias("chunk_tokens"),
        F.array_join(F.slice("t", (start + 1).cast("int"), clen.cast("int")), " ").alias(
            "chunk_text"
        ),
    )


@register(
    "text_tokenizer_fertility",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             CAST(length(text) AS BIGINT) AS n_cp
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
           floor(CAST(sum(n_bytes) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS bytes_per_token,
           floor(CAST(sum(n_cp) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS chars_per_token
    FROM per_doc GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: UTF-8 bytes and Unicode code
    points per (whitespace) token — the multilingual efficiency report
    that decides per-language sampling budgets (a language whose
    tokenizer burns 3x the bytes per token effectively gets 1/3 the
    context window, and training mixes correct for exactly this).
    Whitespace tokens stand in for the BPE tokenizer here; swap the
    token counter for pipeline_bpe_encode's output to audit a real
    vocabulary with the identical plan. One map-side-combined grouped
    aggregate over exact integer byte/codepoint/token counts; the two
    ratios are fixed-shape IEEE divisions floor-quantized at 1e6.
    Byte vs codepoint matters: octet_length diverges from length on
    any non-ASCII corpus (zh here), which is the fertility signal."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
        F.length("text").cast("bigint").alias("n_cp"),
    )
    g = per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_bytes").cast("bigint").alias("n_bytes"),
        F.sum("n_cp").cast("bigint").alias("n_cp"),
    )
    bpt = F.col("n_bytes").cast("double") / F.col("n_tokens").cast("double")
    cpt = F.col("n_cp").cast("double") / F.col("n_tokens").cast("double")
    return g.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_bytes",
        (F.floor(bpt * 1000000 + F.lit(0.5)) / 1000000).alias("bytes_per_token"),
        (F.floor(cpt * 1000000 + F.lit(0.5)) / 1000000).alias("chars_per_token"),
    )


BATCH_BUCKET_BASE = 16  # length buckets: [16*2^k, 16*2^(k+1)) tokens


@register(
    "pipeline_length_bucket_batching",
    oracle=f"""
    WITH t AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT greatest(CAST(floor(log2(CAST(greatest(n_tokens, 1) AS DOUBLE)
                                       / {BATCH_BUCKET_BASE})) AS BIGINT), -1) + 1
               AS bucket,
             n_tokens
      FROM t
    ),
    g AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(max(n_tokens) AS BIGINT) AS max_tokens
      FROM b GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(max(n_tokens) AS BIGINT) AS gmax,
             CAST(sum(n_tokens) AS BIGINT) AS gsum,
             CAST(count(*) AS BIGINT) AS gn
      FROM b
    )
    SELECT bucket, n_docs, sum_tokens, max_tokens,
           n_docs * max_tokens - sum_tokens AS pad_tokens,
           floor(CAST(n_docs * max_tokens - sum_tokens AS DOUBLE)
                 / CAST(n_docs * max_tokens AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS pad_frac,
           floor(CAST(n_docs * gmax - sum_tokens AS DOUBLE)
                 / CAST(n_docs * gmax AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS pad_frac_unbucketed
    FROM g, tot
    """,
)
def pipeline_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficiency report for length-bucketed batching: assign
    every document to a power-of-two token-length bucket
    ([16*2^k, 16*2^(k+1))) and report, per bucket, the pad tokens a
    batch padded to the bucket max would waste vs padding everything
    to the GLOBAL max — the report that justifies (and sizes) bucketed
    batching in a trainer: pad_frac_unbucketed - pad_frac is compute
    recovered per bucket. Bucket ids come from floor(log2(n/16)) — a
    fixed-shape double log on exact integer token counts, identical in
    both engines because log2 of the same IEEE double is the same
    double and floor() collapses any sub-ulp worry except exactly at
    powers of two, where log2 is EXACT in IEEE (2^k representable), so
    the boundary is deterministic too. One grouped aggregate plus a
    broadcast 1-row total; everything after the log is exact int64."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))
    b = t.select(
        (
            F.greatest(
                F.floor(
                    F.log2(
                        F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
                        / BATCH_BUCKET_BASE
                    )
                ).cast("bigint"),
                F.lit(-1).cast("bigint"),
            )
            + 1
        ).alias("bucket"),
        "n_tokens",
    )

    b = b.transform(pin_cache)
    g = b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
    tot = b.agg(F.max("n_tokens").cast("bigint").alias("gmax"))
    pad = F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens")
    padu = F.col("n_docs") * F.col("gmax") - F.col("sum_tokens")
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_docs",
        "sum_tokens",
        "max_tokens",
        pad.alias("pad_tokens"),
        (
            F.floor(
                pad.cast("double")
                / (F.col("n_docs") * F.col("max_tokens")).cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("pad_frac"),
        (
            F.floor(
                padu.cast("double")
                / (F.col("n_docs") * F.col("gmax")).cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("pad_frac_unbucketed"),
    )


@register(
    "text_lexical_diversity",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_sort(string_split(text, ' ')) AS st,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(len(list_distinct(st)) AS BIGINT) AS n_types,
           CAST(len(list_filter(range(1, n_tokens + 1),
                  i -> (i = 1 OR st[i] != st[i-1])
                   AND (i = n_tokens OR st[i] != st[i+1])))
             AS BIGINT) AS n_hapax,
           floor(len(list_distinct(st)) * 1000000.0 / n_tokens + 0.5)
             / 1000000 AS ttr
    FROM t WHERE n_tokens > 0
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signals: per-document type-token ratio
    (distinct/total tokens — low TTR flags keyword-stuffed or template
    text) and hapax-legomena count (tokens occurring exactly once —
    high hapax mass marks gibberish/OCR noise, near-zero marks
    boilerplate). Both are standard corpus-quality features alongside
    text_quality_score's length/punct ratios and feed the same
    downstream percentile filter.

    Everything is per-row array arithmetic inside whole-stage codegen —
    sort the token array once, then hapax = elements differing from
    BOTH neighbors in sorted order (O(n log n) per doc, never the
    O(n²) count-each-token form) — so the operator is shuffle-free and
    embarrassingly parallel at any corpus size. TTR floor-quantizes at
    1e6 from an exact integer pair."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select(
        "doc_id",
        F.array_sort(toks).alias("st"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    neighbors_differ = (
        "size(filter(sequence(1, int(n_tokens)), i -> "
        "(i = 1 OR element_at(st, i) != element_at(st, i - 1)) "
        "AND (i = int(n_tokens) OR element_at(st, i) != element_at(st, i + 1))))"
    )
    return t.select(
        "doc_id",
        "n_tokens",
        F.size(F.array_distinct("st")).cast("bigint").alias("n_types"),
        F.expr(neighbors_differ).cast("bigint").alias("n_hapax"),
        (
            F.floor(
                F.size(F.array_distinct("st")) * 1000000.0 / F.col("n_tokens")
                + F.lit(0.5)
            )
            / 1000000
        ).alias("ttr"),
    )


# UniMax (Chung et al. 2023): allocate a token budget across languages
# by ascending-size waterfilling with a per-language epoch cap — small
# languages get capped at C epochs, the remainder splits uniformly.
# C = 1 (the paper's headline UniMax-1); the budget is 7/8 of the
# corpus so the fixture produces BOTH populations (four capped
# languages + uncapped en) at every SF.
UNIMAX_EPOCH_CAP = 1
UNIMAX_BUDGET_NUM = 7  # budget = total_tokens * 7 div 8
UNIMAX_BUDGET_DEN = 8


@register(
    "sample_unimax_budget",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) * {UNIMAX_BUDGET_NUM} // {UNIMAX_BUDGET_DEN}
                  AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS l
      FROM per
    ),
    ranked AS (
      SELECT lang, n_tokens,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY n_tokens, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prefix
      FROM per
      WINDOW w AS (ORDER BY n_tokens, lang)
    ),
    feas AS (
      SELECT r.*, t.b, t.l,
             {UNIMAX_EPOCH_CAP} * n_tokens * (t.l - i + 1)
               + {UNIMAX_EPOCH_CAP} * prefix AS f
      FROM ranked r, tot t
    ),
    flagged AS (
      SELECT *,
             max(f) OVER (ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               <= b AS capped
      FROM feas
    ),
    caps AS (
      SELECT CAST(coalesce(sum(CASE WHEN capped THEN n_tokens END), 0)
                  AS BIGINT) AS s_capped,
             CAST(sum(CASE WHEN NOT capped THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_uncapped
      FROM flagged
    )
    SELECT lang, n_tokens, capped,
           CAST(CASE WHEN capped THEN {UNIMAX_EPOCH_CAP} * n_tokens
                ELSE (b - {UNIMAX_EPOCH_CAP} * s_capped) // n_uncapped END
                AS BIGINT) AS alloc_tokens,
           floor(CAST(CASE WHEN capped THEN {UNIMAX_EPOCH_CAP} * n_tokens
                      ELSE (b - {UNIMAX_EPOCH_CAP} * s_capped) // n_uncapped END
                      AS DOUBLE) / n_tokens * 1000000 + 0.5) / 1000000
             AS epochs
    FROM flagged, caps
    """,
)
def sample_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023) — the epoch-capped
    alternative to temperature mixing (sample_temperature_mix): given a
    token budget, process languages by ASCENDING corpus size; a
    language whose full C-epoch allocation fits under the running fair
    share is CAPPED at C epochs (low-resource languages never over-
    repeat), and the remaining budget splits uniformly over the
    uncapped rest. The published closed form after sorting: language i
    is capped iff C*n_i*(L-i+1) + C*prefix_{{i-1}} <= B holds for it and
    every smaller language (a running max over the 5-row window), so
    the whole waterfill is one |languages|-row window pass — at 100 TB
    the only corpus-sized cost is the per-language token count
    aggregate, identical to sample_temperature_mix's. Every quantity is
    BIGINT (budget = total * 7 div 8, integer division for the uniform
    split), so the oracle is exact; the epochs ratio floor-quantizes at
    1e-6 for display only."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    tot = per.agg(
        (F.sum("n_tokens") * UNIMAX_BUDGET_NUM)
        .cast("bigint")
        .alias("bnum"),
        F.count("*").cast("bigint").alias("l"),
    ).select(F.expr(f"bnum div {UNIMAX_BUDGET_DEN}").alias("b"), "l")
    wo = Window.orderBy("n_tokens", "lang")
    ranked = per.select(
        "lang",
        "n_tokens",
        F.row_number().over(wo).cast("bigint").alias("i"),
        F.coalesce(
            F.sum("n_tokens").over(
                wo.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint").alias("prefix"),
    )
    feas = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "f",
        UNIMAX_EPOCH_CAP * F.col("n_tokens") * (F.col("l") - F.col("i") + 1)
        + UNIMAX_EPOCH_CAP * F.col("prefix"),
    )
    wmax = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = feas.withColumn("capped", F.max("f").over(wmax) <= F.col("b"))
    caps = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("n_tokens"))), F.lit(0)
        ).cast("bigint").alias("s_capped"),
        F.sum(F.when(~F.col("capped"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_uncapped"),
    )
    alloc = F.when(
        F.col("capped"), UNIMAX_EPOCH_CAP * F.col("n_tokens")
    ).otherwise(
        F.expr(f"(b - {UNIMAX_EPOCH_CAP} * s_capped) div n_uncapped")
    ).cast("bigint")
    return (
        flagged.crossJoin(F.broadcast(caps))
        .select(
            "lang",
            "n_tokens",
            "capped",
            alloc.alias("alloc_tokens"),
            (
                F.floor(
                    alloc.cast("double") / F.col("n_tokens") * 1000000 + F.lit(0.5)
                )
                / 1000000
            ).alias("epochs"),
        )
    )


# --- Count-Min sketch -----------------------------------------------
# The deterministic, EXACTLY-replayable sketch: unlike the engine HLL
# pair (rows-only by nature — Spark's sketch bytes are opaque), a
# Count-Min sketch built from literal-coefficient integer hashes is
# plain relational arithmetic both engines replay byte-for-byte, so
# the sketch build AND its estimates carry a full oracle. Token hash =
# the char-rolling hash text_fingerprint proved; row hashes = the same
# universal-hash family as the streaming MinHash permutations.
CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 16  # counters per row — fixture-calibrated (the synthetic
# vocabulary is ~31 tokens, so 16 cells/row forces real collisions:
# 'merge' and 'vector' overestimate while the rest stay exact, giving
# the error contract both regimes; production widths are 2^16+)
CMS_P = 1000000007
# estimate probes: the BM25 query terms (corpus-frequent) plus two
# rarer tokens so the error contract sees both regimes
CMS_PROBE_TERMS = ("hash", "join", "merge", "scan", "vector", "customer")


def _cms_rows() -> list[tuple[int, int]]:
    return [
        (((2654435761 * (r + 101)) % CMS_P) or 1, (40503 * (r + 31)) % CMS_P)
        for r in range(CMS_DEPTH)
    ]


def _tok_rolling_hash_sql(expr: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(7 AS BIGINT), "
        f"list_transform(string_split_regex({expr}, ''), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        f"(h, c) -> (h * 31 + c) % {CMS_P})"
    )


def _cms_probe_hashes() -> list[tuple[str, int]]:
    """(term, rolling-hash) pairs precomputed in Python and inlined as
    literals in BOTH engines (registry ladder: never hash at query
    time what can be a literal)."""
    out = []
    for t in CMS_PROBE_TERMS:
        h = 7
        for ch in t:
            h = (h * 31 + ord(ch)) % CMS_P
        out.append((t, h))
    return out


def _cms_oracle() -> str:
    rows = _cms_rows()
    probes = _cms_probe_hashes()
    probe_vals = ", ".join(f"('{t}', CAST({h} AS BIGINT))" for t, h in probes)
    cell = "((th * {a} + {b}) % {p}) % {w}"
    cells_union = " UNION ALL ".join(
        f"SELECT {r} AS r, {cell.format(a=a, b=b, p=CMS_P, w=CMS_WIDTH)} AS cell,"
        " n FROM tok_counts"
        for r, (a, b) in enumerate(rows)
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT term, {r} AS r,"
        f" {cell.format(a=a, b=b, p=CMS_P, w=CMS_WIDTH)} AS cell FROM probes"
        for r, (a, b) in enumerate(rows)
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), tok_counts AS (
      SELECT {_tok_rolling_hash_sql("tok")} AS th,
             tok, count(*) AS n
      FROM toks GROUP BY 1, 2
    ), sketch AS (
      SELECT r, cell, CAST(sum(n) AS BIGINT) AS c
      FROM ({cells_union}) GROUP BY r, cell
    ), probes AS (
      SELECT term, th FROM (VALUES {probe_vals}) v(term, th)
    ), pc AS ({probe_cells}),
    est AS (
      SELECT pc.term, CAST(min(coalesce(s.c, 0)) AS BIGINT) AS cms_count
      FROM pc LEFT JOIN sketch s ON s.r = pc.r AND s.cell = pc.cell
      GROUP BY pc.term
    ), truth AS (
      SELECT tok AS term, CAST(sum(n) AS BIGINT) AS true_count
      FROM tok_counts GROUP BY tok
    )
    SELECT e.term, e.cms_count,
           CAST(coalesce(t.true_count, 0) AS BIGINT) AS true_count,
           e.cms_count >= coalesce(t.true_count, 0) AS never_underestimates
    FROM est e LEFT JOIN truth t ON t.term = e.term
    ORDER BY e.term
    """


@register("text_count_min_sketch", oracle=_cms_oracle())
def text_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream: DEPTH x WIDTH bounded
    counters (DEPTH x WIDTH cells regardless of corpus size — the fixed-memory
    frequency summary every streaming heavy-hitter / rate-limiting
    layer keeps), probed for a fixed term list with the min-over-rows
    estimate, alongside exact counts and the CMS one-sided-error
    guarantee (estimates never undercount — a deterministic property
    of the structure, asserted per probe as a column the oracle
    replays). Unlike the engine-HLL sketches (rows-only, opaque
    bytes), every hash here is literal-coefficient integer arithmetic,
    so the build and estimates are byte-exact in both engines. Plan:
    one explode → (token) map-side combined count → DEPTH projected
    cell keys → a DEPTH x WIDTH-row sketch aggregate; probes join the sketch as
    a broadcast-sized relation. At 100 TB the only corpus-sized work
    is the token count the heavy-hitter family already shares."""
    d = load_table(spark, sf_dir, "documents")
    tok_counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "th",
            F.aggregate(
                F.transform(F.split("tok", ""), lambda c: F.ascii(c).cast("long")),
                F.lit(7).cast("long"),
                lambda h, c: (h * 31 + c) % CMS_P,
            ),
        )
        .transform(pin_cache)  # sketch build + truth lookup both consume it
    )
    rows = _cms_rows()
    cells = None
    for r, (a, b) in enumerate(rows):
        part = tok_counts.select(
            F.lit(r).alias("r"),
            (((F.col("th") * a + b) % CMS_P) % CMS_WIDTH).alias("cell"),
            "n",
        )
        cells = part if cells is None else cells.unionByName(part)
    sketch = cells.groupBy("r", "cell").agg(F.sum("n").cast("bigint").alias("c"))
    probes = spark.createDataFrame(
        [(t, h) for t, h in _cms_probe_hashes()], "term string, th long"
    )
    pc = None
    for r, (a, b) in enumerate(rows):
        part = probes.select(
            "term",
            F.lit(r).alias("r"),
            (((F.col("th") * a + b) % CMS_P) % CMS_WIDTH).alias("cell"),
        )
        pc = part if pc is None else pc.unionByName(part)
    est = (
        pc.join(F.broadcast(sketch), ["r", "cell"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("cms_count"))
    )
    # truth is vocabulary-sized (census class 4) — no forced hint; AQE
    # broadcasts the |probes|-row est side from measured sizes anyway
    truth = tok_counts.select(F.col("tok").alias("term"), F.col("n").alias("tn"))
    return (
        est.join(truth, "term", "left")
        .select(
            "term",
            "cms_count",
            F.coalesce(F.col("tn"), F.lit(0)).cast("bigint").alias("true_count"),
            (
                F.col("cms_count") >= F.coalesce(F.col("tn"), F.lit(0))
            ).alias("never_underestimates"),
        )
        .orderBy("term")
    )


# --- Bloom filter ----------------------------------------------------
# The membership sibling of the Count-Min sketch above, same
# determinism recipe: the bit array is plain relational arithmetic
# over literal-coefficient integer hashes, so build, probes, and the
# structural guarantee (NO false negatives — a member's bits are set
# by construction) replay byte-exactly in the oracle. Bloom filters
# are the join-pruning/membership structure every lake engine ships;
# here the STRUCTURE ITSELF is the oracle-checked operator, not just
# the engine's runtime filter (which tests/test_lakeops.py plan-locks).
BLOOM_BITS = 128  # fixture-calibrated: ~half the bits set by the
# ~31-token vocabulary, so of the 8 non-member probes two false-
# positive and six reject — both probe regimes exercised
BLOOM_HASHES = 3
BLOOM_MEMBER_PROBES = ("hash", "join", "merge", "scan")
BLOOM_NONMEMBER_PROBES = (
    "zorp", "flux", "quasar", "nebula", "prism", "glyph", "raster", "tuple",
)


def _bloom_rows() -> list[tuple[int, int]]:
    return [
        (((2654435761 * (r + 211)) % CMS_P) or 1, (40503 * (r + 57)) % CMS_P)
        for r in range(BLOOM_HASHES)
    ]


def _bloom_probe_hashes() -> list[tuple[str, int]]:
    out = []
    for t in BLOOM_MEMBER_PROBES + BLOOM_NONMEMBER_PROBES:
        h = 7
        for ch in t:
            h = (h * 31 + ord(ch)) % CMS_P
        out.append((t, h))
    return out


def _bloom_oracle() -> str:
    rows = _bloom_rows()
    probes = _bloom_probe_hashes()
    probe_vals = ", ".join(f"('{t}', CAST({h} AS BIGINT))" for t, h in probes)
    pos = "((th * {a} + {b}) % {p}) % {m}"
    bit_union = " UNION ALL ".join(
        f"SELECT {pos.format(a=a, b=b, p=CMS_P, m=BLOOM_BITS)} AS bit FROM vocab"
        for a, b in rows
    )
    probe_bits = " UNION ALL ".join(
        f"SELECT term, {pos.format(a=a, b=b, p=CMS_P, m=BLOOM_BITS)} AS bit"
        " FROM probes"
        for a, b in rows
    )
    return f"""
    WITH vocab AS (
      SELECT tok, {_tok_rolling_hash_sql("tok")} AS th
      FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ), bloom AS (
      SELECT DISTINCT bit FROM ({bit_union})
    ), probes AS (
      SELECT term, th FROM (VALUES {probe_vals}) v(term, th)
    ), pb AS ({probe_bits}),
    claimed AS (
      SELECT pb.term,
             CAST(count(*) FILTER (WHERE b.bit IS NOT NULL) AS BIGINT)
               = {BLOOM_HASHES} AS claimed_present
      FROM pb LEFT JOIN bloom b ON b.bit = pb.bit
      GROUP BY pb.term
    ), actual AS (
      SELECT p.term, count(v.tok) > 0 AS actually_present
      FROM probes p LEFT JOIN vocab v ON v.tok = p.term
      GROUP BY p.term
    )
    SELECT c.term, c.claimed_present, a.actually_present,
           c.claimed_present AND NOT a.actually_present AS is_false_positive,
           c.claimed_present OR NOT a.actually_present AS sound
    FROM claimed c JOIN actual a ON a.term = c.term
    ORDER BY c.term
    """


@register("text_bloom_filter", oracle=_bloom_oracle())
def text_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership over the corpus vocabulary: a BLOOM_BITS
    bit array built from BLOOM_HASHES literal-coefficient integer
    hashes, probed with members AND non-members. Emits per probe the
    filter's claim, ground truth, the false-positive flag (the
    tunable error), and the soundness column (claimed OR NOT actual —
    false NEGATIVES are structurally impossible, and the oracle
    replays that guarantee byte-exactly rather than trusting it).
    Plan: one explode → distinct-token aggregate → K projected bit
    positions → a ≤BLOOM_BITS-row distinct (the filter itself —
    constant-size at any corpus); probes join it broadcast. The
    deterministic, oracle-checkable counterpart of the engine's opaque
    runtime Bloom pruning (which tests/test_lakeops.py plan-locks)."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .withColumn(
            "th",
            F.aggregate(
                F.transform(F.split("tok", ""), lambda c: F.ascii(c).cast("long")),
                F.lit(7).cast("long"),
                lambda h, c: (h * 31 + c) % CMS_P,
            ),
        )
        .transform(pin_cache)  # bit build + ground-truth probe both read it
    )
    rows = _bloom_rows()
    bits = None
    for a, b in rows:
        part = vocab.select((((F.col("th") * a + b) % CMS_P) % BLOOM_BITS).alias("bit"))
        bits = part if bits is None else bits.unionByName(part)
    bloom = bits.distinct()
    probes = spark.createDataFrame(
        _bloom_probe_hashes(), "term string, th long"
    )
    pb = None
    for a, b in rows:
        part = probes.select(
            "term", (((F.col("th") * a + b) % CMS_P) % BLOOM_BITS).alias("bit")
        )
        pb = part if pb is None else pb.unionByName(part)
    claimed = (
        pb.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("term")
        .agg(
            (F.count("hit").cast("bigint") == BLOOM_HASHES).alias("claimed_present")
        )
    )
    actual = (
        probes.join(
            vocab.select(F.col("tok").alias("term")).withColumn("seen", F.lit(1)),
            "term",
            "left",
        )
        .groupBy("term")
        .agg((F.count("seen") > 0).alias("actually_present"))
    )
    return (
        claimed.join(actual, "term")
        .select(
            "term",
            "claimed_present",
            "actually_present",
            (F.col("claimed_present") & ~F.col("actually_present")).alias(
                "is_false_positive"
            ),
            (F.col("claimed_present") | ~F.col("actually_present")).alias("sound"),
        )
        .orderBy("term")
    )


# Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
# 1999) — the principled-smoothing rung above text_perplexity_bigram's
# Laplace model. Trained on the doc_id-even HALF of the corpus and
# scored on ALL documents, so held-out docs genuinely exercise every
# path: discounted ML for seen bigrams, continuation-probability mass
# for unseen bigrams under seen contexts, and full continuation
# backoff for unseen contexts. The continuation distribution is
# add-one smoothed over the training vocabulary so no probability is
# ever 0 (ln stays finite):
#   Pcont(b) = (N1+(.,b) + 1) / (N1+(..) + V)
#   P(b|a)   = (max(n_ab - D, 0) + D * N1+(a,.) * Pcont(b)) / n_a
#              (n_a > 0; else Pcont(b))
# All counts are exact integers; D is a shared literal; per-bigram NLL
# terms floor-quantize to scaled BIGINTs before the per-doc sum (the
# gram-matrix rule), so within-doc summation order is exact.
KN_DISCOUNT = 0.75


def _kn_oracle() -> str:
    d = f"CAST({KN_DISCOUNT} AS DOUBLE)"
    return f"""
    WITH toksa AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pairsa AS (
      SELECT doc_id, t[i] AS a, t[i + 1] AS b
      FROM toksa, LATERAL (SELECT unnest(range(1, len(t))) AS i) u
      WHERE len(t) >= 2
    ),
    pairst AS (SELECT * FROM pairsa WHERE doc_id % 2 = 0),
    cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
            FROM pairst GROUP BY a, b),
    ctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a,
                   CAST(count(*) AS BIGINT) AS n1pa
            FROM cab GROUP BY a),
    cont AS (SELECT b, CAST(count(*) AS BIGINT) AS n1pb FROM cab GROUP BY b),
    totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n1pt,
             (SELECT CAST(count(DISTINCT term) AS BIGINT)
              FROM pairst, LATERAL (SELECT unnest([a, b]) AS term) w) AS v
      FROM cab
    ),
    scored AS (
      SELECT p.doc_id,
             CAST(floor(-ln(
               CASE WHEN ctx.n_a IS NULL
                    THEN (coalesce(cont.n1pb, 0) + 1.0) / (t.n1pt + t.v)
                    ELSE (greatest(cab.n_ab - {d}, CAST(0.0 AS DOUBLE))
                          + {d} * ctx.n1pa
                            * ((coalesce(cont.n1pb, 0) + 1.0) / (t.n1pt + t.v)))
                         / ctx.n_a
               END) * 1000000000000 + 0.5) AS BIGINT) AS c
      FROM pairsa p
      LEFT JOIN ctx ON ctx.a = p.a
      LEFT JOIN cab ON cab.a = p.a AND cab.b = p.b
      LEFT JOIN cont ON cont.b = p.b
      CROSS JOIN totals t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(CAST(sum(c) AS DOUBLE) / 1000000000000 / count(*)
                 * 1000000 + 0.5) / 1000000 AS nll
    FROM scored GROUP BY doc_id
    """


@register("text_perplexity_kneser_ney", oracle=_kn_oracle())
def text_perplexity_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring with a train/score split
    (see block comment for the model and why every smoothing path is
    exercised). Plan shape mirrors text_perplexity_bigram: one explode
    builds the per-doc bigram stream; the model relations (bigram
    counts, context totals + continuation-type counts, continuation
    counts) derive from the training half and join back by equi-key
    with NO forced broadcast hints — bigram types grow near-linearly
    with corpus size (Heaps' law on pairs), so AQE must keep the
    size-based fallback; only the ONE-ROW totals relation keeps a
    hint. Eager pins on the multi-consumer pair/count relations (the
    connected_components rule)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # Pinned: A/B-measured at sf0.1 (r13 opt round) — dropping this pin
    # and recomputing the explode in the scored pass was 0.3-0.4 s
    # SLOWER (2.93 vs 2.63 s best-of-4), because the scored pass's
    # three joins re-pay the split+explode on their probe side. The
    # pin's two consumers are separate actions (cab's pin, then the
    # scored pass), so there is no population race.
    #
    # Bigrams are (doc_id, xxhash64(token), xxhash64(token)) LONGS, not
    # strings: token identity only ever feeds equality (model-count
    # groupBys, the three scored-pass joins, the vocab countDistinct),
    # so hashed ids cache fewer bytes and shuffle/join on 8-byte keys —
    # the shingle-ladder trick (llm_dedup._shingle_hash_arr). Exact up
    # to 64-bit collisions, which the string-side oracle would surface
    # as a hash mismatch.
    pairs_all = (
        d.where(F.size(toks) >= 2)
        .select("doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("th"))
        .select(
            "doc_id",
            F.posexplode(F.expr("slice(th, 1, size(th) - 1)")).alias("i", "a"),
            F.col("th"),
        )
        .select("doc_id", "a", F.expr("th[i + 1]").alias("b"))
        .transform(pin_cache)
    )
    pairs_train = pairs_all.where(F.col("doc_id") % 2 == 0)
    cab = (
        pairs_train.groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .transform(pin_cache)
    )
    ctx = cab.groupBy("a").agg(
        F.sum("n_ab").cast("bigint").alias("n_a"),
        F.count("*").cast("bigint").alias("n1pa"),
    )
    cont = cab.groupBy("b").agg(F.count("*").cast("bigint").alias("n1pb"))
    # vocab from the PINNED bigram-type relation, not the raw training
    # stream: every training term appears as a key of cab, so the
    # distinct-term count is identical, over a far smaller cached input
    # (bigram TYPES, not occurrences).
    vocab = (
        cab.select(F.col("a").alias("term"))
        .unionByName(cab.select(F.col("b").alias("term")))
        .agg(F.countDistinct("term").cast("bigint").alias("v"))
    )
    totals = cab.agg(F.count("*").cast("bigint").alias("n1pt")).crossJoin(
        F.broadcast(vocab)
    )

    dd = F.lit(KN_DISCOUNT)
    pc = (F.coalesce(F.col("n1pb"), F.lit(0)) + 1.0) / (
        F.col("n1pt") + F.col("v")
    )
    pk = F.when(F.col("n_a").isNull(), pc).otherwise(
        (
            F.greatest(F.col("n_ab") - dd, F.lit(0.0))
            + dd * F.col("n1pa") * pc
        )
        / F.col("n_a")
    )
    scored = (
        pairs_all.join(ctx, "a", "left")
        .join(cab, ["a", "b"], "left")
        .join(cont, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.floor(-F.log(pk) * 1000000000000 + F.lit(0.5))
            .cast("bigint")
            .alias("c"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (
            F.floor(
                F.sum("c").cast("double") / 1000000000000 / F.count("*") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("nll"),
    )


# Cross-source quantile normalization — the batch-effect remover for
# mixed-source corpora (Bolstad et al. 2003, standard in any pipeline
# that mixes sources whose raw signal scales differ): map each
# document's n_chars to the GLOBAL value at the same within-source
# quantile position, so every source shares one length distribution.
# Entirely INTEGER arithmetic: within-source group midrank position
# p = (2*less + c) / (2*m) maps to quantile level
# L = ceil(p * Q) = ((2*less + c)*Q + 2m - 1) // (2m)  (in [1, Q]
# with no clamp needed: 2*less + c <= 2m), and the global Q-level
# equi-depth grid value at L is the group covering global rank
# ceil(L*N/Q). No floating point anywhere, so the mapping is
# byte-exact by construction.
QN_LEVELS = 256
_QN_BUCKET = 256  # value-range bucket for the two-level prefix ranks


def _qn_prefix(h, keys):
    """Value-preserving prefix counts over a (keys, v, c) histogram —
    a thin wrapper around ml_eval's shared two-level machinery
    (keep_value retains the value column for the rank->value lookup;
    the narrower bucket suits char-length-ranged values where AUC's
    2^28 score bucket would collapse to one)."""
    from kinesis2sse_spark.queries.ml_eval import _with_prefix_counts

    out = _with_prefix_counts(
        h.select(*keys, F.col("v").alias("s"), "c", F.lit(0).alias("cp")),
        keys=keys,
        keep_value=True,
        bucket=_QN_BUCKET,
    )
    return out.select(*keys, F.col("s").alias("v"), "c", "less")


@register(
    "pipeline_quantile_normalize",
    oracle=f"""
    WITH docsn AS (
      SELECT doc_id, source, n_chars FROM documents
      WHERE n_chars IS NOT NULL
    ),
    sh AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM docsn GROUP BY source, n_chars
    ),
    m AS (SELECT source, CAST(sum(c) AS BIGINT) AS m FROM sh GROUP BY source),
    sr AS (
      SELECT source, v, c,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY v) - c AS BIGINT)
               AS less
      FROM sh
    ),
    gh AS (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM docsn GROUP BY n_chars
    ),
    gr AS (
      SELECT v, c, CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS less
      FROM gh
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gh),
    tr AS (
      SELECT lvl, (lvl * nn.n + {QN_LEVELS - 1}) // {QN_LEVELS} AS t
      FROM (SELECT unnest(range(1, {QN_LEVELS + 1})) AS lvl), nn
    ),
    grid AS (
      SELECT t.lvl, g.v AS qval
      FROM tr t JOIN gr g ON g.less < t.t AND t.t <= g.less + g.c
    ),
    lv AS (
      SELECT s.source, s.v,
             ((2 * s.less + s.c) * {QN_LEVELS} + 2 * m.m - 1) // (2 * m.m)
               AS lvl
      FROM sr s JOIN m ON m.source = s.source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CAST(grid.qval AS BIGINT) AS norm_chars
    FROM docsn d
    JOIN lv ON lv.source = d.source AND lv.v = d.n_chars
    JOIN grid ON grid.lvl = lv.lvl
    """,
)
def pipeline_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document length (see
    block comment for the all-integer mapping). Plan shape: two
    histogram shuffles (per-source and global value groups), prefix
    ranks via the two-level bucket scheme (offsets broadcast from the
    bucket relation, within-bucket windows — never a global sort),
    the {QN_LEVELS}-row grid built by a broadcast range-join against
    the global rank relation, and documents rejoin their
    (source, value) group by equi-key. Every corpus-sized relation
    shuffles only on value/group keys. Broadcast-growth citation
    (census class sublinear): the forced hints carry the per-source
    totals `m` (|sources| rows — sources grow with ingest pipelines,
    not documents: a 100 TB corpus has thousands of sources, ~tens of
    KB broadcast) and the {QN_LEVELS}+1-row `tr`/`nn` threshold
    relations (constant); the value-bucket rank relations are bounded
    by distinct n_chars values — capped by max document length, so
    ~10^5 rows at ANY corpus size, orders of magnitude under the
    broadcast ceiling."""
    # NULL n_chars filtered SYMMETRICALLY with the oracle: Spark
    # windows sort nulls first, DuckDB last — excluding them on both
    # sides is the only ordering-free parity (fixtures are null-free;
    # this pins the semantics if that ever changes)
    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    )
    sh = (
        d.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("bigint").alias("c"))
        .transform(pin_cache)
    )
    m = sh.groupBy("source").agg(F.sum("c").cast("bigint").alias("m"))
    sr = _qn_prefix(sh, ("source",))
    gh = (
        d.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("bigint").alias("c"))
        .transform(pin_cache)
    )
    gr = _qn_prefix(gh, ())
    # total from the already-pinned histogram — not a second corpus scan
    nn = gh.agg(F.sum("c").cast("bigint").alias("n"))
    tr = (
        spark.range(1, QN_LEVELS + 1)
        .select(F.col("id").cast("long").alias("lvl"))
        .crossJoin(F.broadcast(nn))
        # integer ceil division without FP: (lvl*n + Q-1) div Q
        .select(
            "lvl",
            F.expr(f"(lvl * n + {QN_LEVELS - 1}) div {QN_LEVELS}").alias("t"),
        )
    )
    grid = gr.join(
        F.broadcast(tr),
        (F.col("less") < F.col("t")) & (F.col("t") <= F.col("less") + F.col("c")),
    ).select("lvl", F.col("v").alias("qval"))
    lv = sr.join(F.broadcast(m), "source").select(
        F.col("source").alias("lv_source"),
        F.col("v").alias("lv_v"),
        F.expr(f"((2 * less + c) * {QN_LEVELS} + 2 * m - 1) div (2 * m)").alias("lvl"),
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .join(
            lv,
            (F.col("source") == F.col("lv_source"))
            & (F.col("n_chars") == F.col("lv_v")),
        )
        .join(F.broadcast(grid), "lvl")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("qval").cast("bigint").alias("norm_chars"),
        )
    )


# Pseudo-relevance feedback (Rocchio 1971, the PRF/"blind feedback"
# form): run the BM25 query, treat its top PRF_FB docs as relevant,
# mine the PRF_EXP strongest non-query terms from them (weight =
# feedback-tf x corpus idf), and re-run BM25 with the expanded term set
# — original terms at weight 1, expansion terms at PRF_BETA. The
# classic recall lever for lexical search, and the operator class the
# plain bm25/rrf rungs stop short of: a DATA-DEPENDENT second query,
# kept fully relational (the expanded term set joins the corpus as a
# broadcast relation — never a driver collect, never an isin literal).
# Determinism: the one libm call (ln in idf) rides the bm25 idiom the
# sweep has held at three SFs — per-term contributions cast to
# DECIMAL(27,15) before any summation, ranks over floor-1e6 scores
# with doc/term tiebreaks.
PRF_FB = 5  # feedback depth: top-5 round-1 docs presumed relevant
PRF_EXP = 5  # expansion width: 5 mined terms
PRF_BETA = 0.5  # Rocchio expansion weight


def _prf_oracle() -> str:
    qvals = ", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)
    k1, b = BM25_K1, BM25_B
    return f"""
    WITH q(term) AS (VALUES {qvals}),
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    tok AS (
      SELECT d.doc_id, t.term
      FROM documents d, LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
    ),
    tf1 AS (
      SELECT tok.doc_id, tok.term, count(*) AS tf, max(dl.dl) AS dl
      FROM tok JOIN dl ON dl.doc_id = tok.doc_id
      WHERE tok.term IN (SELECT term FROM q)
      GROUP BY tok.doc_id, tok.term
    ),
    df1 AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf1 GROUP BY term),
    c1 AS (
      SELECT tf1.doc_id,
             CAST(
               ln((n_docs - df1.df + 0.5) / (df1.df + 0.5) + 1.0)
                 * (tf1.tf * ({k1} + 1.0))
                 / (tf1.tf + {k1} * (1.0 - {b} + {b} * (tf1.dl / avgdl)))
               AS DECIMAL(27,15)) AS c
      FROM tf1 JOIN df1 USING (term) CROSS JOIN stats
    ),
    s1 AS (
      SELECT doc_id, floor(CAST(sum(c) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS score
      FROM c1 GROUP BY doc_id
    ),
    fb AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM s1
      ) WHERE rnk <= {PRF_FB}
    ),
    cand_tf AS (
      SELECT tok.term, CAST(count(*) AS BIGINT) AS fbtf
      FROM tok JOIN fb USING (doc_id)
      WHERE tok.term NOT IN (SELECT term FROM q)
      GROUP BY tok.term
    ),
    cand_df AS (
      SELECT tok.term, CAST(count(DISTINCT tok.doc_id) AS DOUBLE) AS df
      FROM tok JOIN cand_tf USING (term)
      GROUP BY tok.term
    ),
    exp_terms AS (
      SELECT term FROM (
        SELECT ct.term,
               row_number() OVER (
                 ORDER BY floor(CAST(CAST(ct.fbtf
                          * ln((n_docs - cd.df + 0.5) / (cd.df + 0.5) + 1.0)
                        AS DECIMAL(27,15)) AS DOUBLE) * 1000000 + 0.5) DESC,
                        ct.term
               ) AS trnk
        FROM cand_tf ct JOIN cand_df cd USING (term) CROSS JOIN stats
      ) WHERE trnk <= {PRF_EXP}
    ),
    terms2 AS (
      SELECT term, CAST(1.0 AS DOUBLE) AS w FROM q
      UNION ALL
      SELECT term, CAST({PRF_BETA} AS DOUBLE) AS w FROM exp_terms
    ),
    tf2 AS (
      SELECT tok.doc_id, tok.term, count(*) AS tf, max(dl.dl) AS dl,
             max(t2.w) AS w
      FROM tok JOIN dl ON dl.doc_id = tok.doc_id
      JOIN terms2 t2 ON t2.term = tok.term
      GROUP BY tok.doc_id, tok.term
    ),
    df2 AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf2 GROUP BY term),
    c2 AS (
      SELECT tf2.doc_id,
             CAST(tf2.w
               * ln((n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1.0)
               * (tf2.tf * ({k1} + 1.0))
               / (tf2.tf + {k1} * (1.0 - {b} + {b} * (tf2.dl / avgdl)))
               AS DECIMAL(27,15)) AS c
      FROM tf2 JOIN df2 USING (term) CROSS JOIN stats
    ),
    s2 AS (
      SELECT doc_id, floor(CAST(sum(c) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS score
      FROM c2 GROUP BY doc_id
    )
    SELECT doc_id, score, rnk FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM s2
    ) WHERE rnk <= 10
    """


@register("search_prf_rocchio", oracle=_prf_oracle())
def search_prf_rocchio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback — see the block comment for
    the model. Scale shape, pass by pass: round 1 is text_bm25_search's
    posting-slice plan (explode filtered to |Q| literal terms BEFORE
    the shuffle); the PRF_FB-row feedback relation broadcasts onto a
    second filtered explode to mine candidate terms (the (term, fbtf)
    relation is bounded by the feedback docs' vocabulary, hundreds of
    rows); candidate df comes from a corpus explode joined against the
    BROADCAST candidate set — filtered at the map side by the join, so
    the exchange again carries a posting slice, not the corpus; round 2
    re-joins the corpus explode against the broadcast |Q|+{PRF_EXP}-row
    weighted term relation. Four corpus scans, zero corpus-wide
    shuffles, no driver collect anywhere — the expanded query stays a
    RELATION end to end. Every broadcast here is bounded by |Q|,
    PRF_FB, or the feedback vocabulary — none grows with the corpus."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    k1, b = BM25_K1, BM25_B
    dl = d.select("doc_id", F.size(toks).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    terms = list(BM25_QUERY_TERMS)
    ex = d.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term")
    )

    def bm25_scores(tf):
        """(doc_id, term, tf, dl[, w]) -> (doc_id, score): the shared
        scoring tail — df aggregate, idf, decimal-quantized weighted
        contributions, floor-1e6 per-doc sum. The posting-slice tf
        relation is consumed by BOTH the df aggregate and the scoring
        join -> eager pin (the connected_components rule), sized at
        |terms| x docs-containing-them, never the corpus."""
        tf = tf.transform(pin_cache)
        dfrel = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        norm = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
        w = F.col("w") if "w" in tf.columns else F.lit(1.0)
        contrib = (
            tf.join(F.broadcast(dfrel), "term")
            .crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                (w * idf * (F.col("tf") * (k1 + 1.0)) / norm)
                .cast("decimal(27,15)")
                .alias("c"),
            )
        )
        return contrib.groupBy("doc_id").agg(
            (F.floor(F.sum("c").cast("double") * 1000000 + F.lit(0.5)) / 1000000)
            .alias("score")
        )

    tf1 = (
        ex.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    w10 = Window.partitionBy().orderBy(F.col("score").desc(), "doc_id")
    fb = (
        bm25_scores(tf1)
        .withColumn("rnk", F.row_number().over(w10))
        .where(F.col("rnk") <= PRF_FB)
        .select("doc_id")
    )
    # candidate mining: feedback docs' terms (broadcast PRF_FB rows
    # prunes the explode map-side), original query terms excluded
    cand_tf = (
        ex.join(F.broadcast(fb), "doc_id")
        .where(~F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("fbtf"))
        .transform(pin_cache)
    )
    cand_df = (
        ex.join(F.broadcast(cand_tf.select("term")), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("double").alias("df"))
    )
    tw = F.floor(
        (
            F.col("fbtf")
            * F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        )
        .cast("decimal(27,15)")
        .cast("double")
        * 1000000
        + F.lit(0.5)
    )
    wexp = Window.partitionBy().orderBy(tw.desc(), "term")
    exp_terms = (
        cand_tf.join(F.broadcast(cand_df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("trnk", F.row_number().over(wexp))
        .where(F.col("trnk") <= PRF_EXP)
        .select("term")
    )
    terms2 = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", F.lit(1.0).alias("w"))
        .unionAll(exp_terms.select("term", F.lit(PRF_BETA).alias("w")))
    )
    tf2 = (
        ex.join(F.broadcast(terms2), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"), F.max("w").alias("w"))
    )
    return (
        bm25_scores(tf2)
        .withColumn("rnk", F.row_number().over(w10))
        .where(F.col("rnk") <= 10)
        .select("doc_id", "score", "rnk")
    )


# Neyman optimal allocation (Neyman 1934) — the variance-minimizing
# stratified-sampling design the proportional sample_stratified rung
# stops short of: a fixed budget B splits across strata proportional
# to N_h * S_h (stratum size x stratum standard deviation), so
# high-variance strata get oversampled and the stratified estimator's
# variance hits its minimum. Integer seats come from the largest-
# remainder method (floor(B*w_h/W) each, leftovers to the largest
# fractional remainders, source-name tiebreak) so allocations always
# sum EXACTLY to B. Determinism: S_h = sqrt of an exact-int64-moments
# variance (sqrt is correctly rounded in IEEE, so both engines produce
# the identical double), every remainder comparison is over identical
# doubles with a total-order tiebreak. Allocations may exceed a
# stratum's population for extreme size/variance mixes; production
# caps at N_h and redistributes — at this fixture every a_h << N_h,
# and the uncapped report keeps the algebra pure.
NEYMAN_BUDGET = 1000


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH m AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs,
             n_docs * sqrt((CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * sx / n_docs) / n_docs) AS wh
      FROM m
    ),
    t AS (SELECT sum(wh) AS tw FROM w),
    seats AS (
      SELECT source, n_docs, wh,
             CAST(floor({NEYMAN_BUDGET} * wh / tw) AS BIGINT) AS base,
             {NEYMAN_BUDGET} * wh / tw - floor({NEYMAN_BUDGET} * wh / tw) AS rem
      FROM w CROSS JOIN t
    ),
    short AS (
      SELECT CAST({NEYMAN_BUDGET} - sum(base) AS BIGINT) AS k FROM seats
    )
    SELECT s.source, s.n_docs,
           floor(s.wh / s.n_docs * 1000000 + 0.5) / 1000000 AS stddev,
           s.base + CASE WHEN row_number() OVER (ORDER BY s.rem DESC, s.source)
                         <= sh.k THEN 1 ELSE 0 END AS alloc
    FROM seats s CROSS JOIN short sh
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation of a {NEYMAN_BUDGET}-doc budget across source
    strata — see the block comment for the model and the determinism
    argument. ONE corpus shuffle (per-source int64 moments); weights,
    seats, remainders, and the largest-remainder top-up all run on the
    |sources|-row relation (window over a handful of rows). The
    allocation column is what a downstream sampler feeds its per-
    stratum rate — composing with sample_stratified's hash-systematic
    selection gives the full design."""
    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    wh = F.col("n_docs") * F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n_docs")
        )
        / F.col("n_docs")
    )
    w = m.select("source", "n_docs", wh.alias("wh"))
    t = w.agg(F.sum("wh").alias("tw"))
    frac = NEYMAN_BUDGET * F.col("wh") / F.col("tw")
    seats = (
        w.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "wh",
            F.floor(frac).cast("bigint").alias("base"),
            (frac - F.floor(frac)).alias("rem"),
        )
        .transform(pin_cache)
    )
    short = seats.agg(
        (NEYMAN_BUDGET - F.sum("base")).cast("bigint").alias("k")
    )
    rn = F.row_number().over(
        Window.partitionBy().orderBy(F.col("rem").desc(), "source")
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        seats.crossJoin(F.broadcast(short))
        .withColumn("rn", rn)
        .select(
            "source",
            "n_docs",
            q6(F.col("wh") / F.col("n_docs")).alias("stddev"),
            (
                F.col("base")
                + F.when(F.col("rn") <= F.col("k"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )


# Vocabulary coverage under min-frequency pruning — the sizing curve
# behind every min_count cutoff (word2vec, BPE merge floors, fastText
# buckets): for each threshold T, how many types survive cnt >= T and
# what fraction of token OCCURRENCES they cover. Deliberately framed
# by FREQUENCY THRESHOLD rather than top-k rank: the answer needs zero
# global ordering — one token shuffle to type counts, then ONE
# map-side-combined conditional aggregate over the vocabulary relation
# (a top-k frame would need a rank over the Heaps-law vocab, the
# single-partition window this repo bans at corpus scale). All counts
# exact int64; coverage is one division per threshold, floor-1e6.
VOCAB_COVERAGE_THRESHOLDS = (10, 100, 1000)


def _vocab_coverage_oracle() -> str:
    rows = " UNION ALL ".join(
        f"""
        SELECT CAST({t} AS BIGINT) AS min_count,
               CAST(count(*) FILTER (WHERE cnt >= {t}) AS BIGINT) AS n_types,
               coalesce(floor(CAST(sum(cnt) FILTER (WHERE cnt >= {t}) AS DOUBLE)
                     / sum(cnt) * 1000000 + 0.5) / 1000000, 0.0) AS coverage
        FROM tc
        """
        for t in VOCAB_COVERAGE_THRESHOLDS
    )
    return f"""
    WITH tc AS (
      SELECT t.term, CAST(count(*) AS BIGINT) AS cnt
      FROM documents d,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
      GROUP BY t.term
    )
    {rows}
    """


@register("text_min_count_vocab_coverage", oracle=_vocab_coverage_oracle())
def text_min_count_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-count vocabulary coverage curve — see the block comment.
    The type-count relation pins (all thresholds read it); each
    threshold is a conditional-sum branch of one aggregate, so the
    curve's length adds zero passes."""
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .transform(pin_cache)
    )
    out = None
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    for t in VOCAB_COVERAGE_THRESHOLDS:
        row = tc.agg(
            F.lit(t).cast("bigint").alias("min_count"),
            F.count(F.when(F.col("cnt") >= t, 1)).cast("bigint").alias("n_types"),
            # a threshold nothing survives covers 0.0, not NULL —
            # coalesced identically in the oracle
            F.coalesce(
                q6(
                    F.sum(F.when(F.col("cnt") >= t, F.col("cnt"))).cast("double")
                    / F.sum("cnt")
                ),
                F.lit(0.0),
            ).alias("coverage"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# Fuzzy decontamination — the third rung of the contamination family:
# decontaminate_ngram catches exact 8-gram overlap,
# decontaminate_embedding catches semantic similarity; this catches
# NEAR-duplicate contamination (a benchmark doc lightly paraphrased or
# truncated into the training corpus) via MinHash banding: a corpus
# doc is flagged when it shares a FULL band signature with any
# benchmark doc (the estimated-Jaccard drop rule; P(flag) = j^ROWS per
# band — the same recall dial as the streaming near-dedup twin, whose
# integer signature pipeline this reuses VERBATIM:
# streaming/dedup.py::with_minhash_bands Spark-side and the shared
# minhash_sig_cte_sql generator oracle-side, so the hash arithmetic
# cannot drift between consumers). Benchmark set = doc_id % 50 == 0,
# decontaminate_ngram's split. Scale shape: benchmark signatures are
# |bench| x BANDS rows (benchmark suites are KBs, not corpora) and
# BROADCAST onto the corpus band relation; the corpus side is one
# map-side-filtered explode — no all-pairs stage, no corpus-wide
# shuffle beyond the band equi-join.
def _decon_minhash_oracle() -> str:
    from kinesis2sse_spark.streaming.dedup import minhash_sig_cte_sql

    return f"""
    WITH {minhash_sig_cte_sql("documents")},
    bench AS (
      SELECT band, bsig FROM banded WHERE doc_id % 50 = 0
    ),
    hits AS (
      SELECT c.doc_id, CAST(1 AS BOOLEAN) AS hit
      FROM banded c
      JOIN (SELECT DISTINCT band, bsig FROM bench) b
        ON b.band = c.band AND b.bsig = c.bsig
      WHERE c.doc_id % 50 <> 0
      GROUP BY c.doc_id
    )
    SELECT d.doc_id, coalesce(h.hit, FALSE) AS is_contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 50 <> 0
    """


@register("decontaminate_minhash", oracle=_decon_minhash_oracle())
def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash fuzzy decontamination — see the block comment for the
    model, the split, and the shared-signature-pipeline determinism
    argument. Docs too short to shingle carry no signature and are
    clean by construction (mirrored by the oracle's sigs filter)."""
    from kinesis2sse_spark.streaming.dedup import with_minhash_bands

    from kinesis2sse_spark.streaming.dedup import MINHASH_SHINGLE

    d = load_table(spark, sf_dir, "documents")
    # docs too short to shingle are excluded BEFORE banding (the
    # oracle's len(hs) > 0 filter): un-filtered they would carry a
    # degenerate empty signature that could spuriously band-match
    # another short doc
    banded = with_minhash_bands(
        d.where(F.size(F.split("text", " ")) >= MINHASH_SHINGLE)
        .select("doc_id", "text", F.timestamp_seconds(F.lit(0)).alias("ts"))
    ).select("doc_id", "band", "sig")
    bench = (
        banded.where(F.col("doc_id") % 50 == 0)
        .select(F.col("band").alias("b_band"), F.col("sig").alias("b_sig"))
        .distinct()
    )
    hits = (
        banded.where(F.col("doc_id") % 50 != 0)
        .join(
            F.broadcast(bench),
            (F.col("band") == F.col("b_band")) & (F.col("sig") == F.col("b_sig")),
        )
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        d.where(F.col("doc_id") % 50 != 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("hit"), F.lit(False)).alias("is_contaminated")
        )
    )


# RAKE keyword extraction (Rose et al. 2010): candidate phrases are
# maximal runs of non-stopword tokens (stopwords and empty tokens act
# as phrase delimiters); each word scores deg/freq where freq = its
# occurrence count across all phrase members and deg = the summed
# length of every phrase containing it (within-phrase co-occurrence,
# self included); a phrase scores the sum of its members' word scores
# (per OCCURRENCE — repeated words count twice, the deterministic
# reading of the paper's sum). Scores stay EXACT: per-word score is
# the 1e6-scaled integer quotient (deg * 1e6) div freq, phrase score
# the int64 sum of those — no float summation order anywhere.
RAKE_TOPK = 5


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
    ),
    marked AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN ({_sql_list(EN_STOP)}) OR tok = ''
                  THEN 1 ELSE 0 END AS is_stop
      FROM pos
    ),
    ph AS (
      SELECT doc_id, pos, tok, is_stop,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
      FROM marked
    ),
    members AS (
      SELECT doc_id, pid, pos, tok FROM ph WHERE is_stop = 0
    ),
    plen AS (
      SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS n_words
      FROM members GROUP BY doc_id, pid
    ),
    wstat AS (
      SELECT m.tok, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(p.n_words) AS BIGINT) AS deg
      FROM members m
      JOIN plen p ON p.doc_id = m.doc_id AND p.pid = m.pid
      GROUP BY m.tok
    ),
    wscore AS (SELECT tok, (deg * 1000000) // freq AS s FROM wstat),
    pscore AS (
      SELECT m.doc_id, m.pid,
             string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(w.s) AS BIGINT) AS score_s
      FROM members m JOIN wscore w ON w.tok = m.tok
      GROUP BY m.doc_id, m.pid
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rank, phrase, n_words, score_s
    FROM (
      SELECT doc_id, phrase, n_words, score_s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_s DESC, phrase) AS rnk
      FROM pscore
    ) WHERE rnk <= {RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RAKE_TOPK} RAKE keyphrases per document — see the block
    comment for the phrase/score definitions and the integer-exact
    scoring. Scale shape: token explode → per-doc prefix-sum window
    (partitioned by doc, never global) → the word-stat relation is
    VOCABULARY-bounded and joins back by token (shuffle on a
    vocab-sized key, map-side combined on both inputs); the per-doc
    top-k rank is WindowGroupLimit-pruned below the exchange."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    is_stop = (
        F.col("tok").isin(*EN_STOP) | (F.col("tok") == "")
    ).cast("int")
    ph = pos.withColumn(
        "pid",
        F.sum(is_stop).over(
            W.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    # pinned: three consumers (phrase lengths, word stats, phrase agg)
    members = (
        ph.filter(is_stop == 0)
        .select("doc_id", "pid", "pos", "tok")
        .transform(pin_cache)
    )
    plen = members.groupBy("doc_id", "pid").agg(
        F.count("*").cast("bigint").alias("n_words")
    )
    wstat = (
        members.join(plen, ["doc_id", "pid"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum("n_words").cast("bigint").alias("deg"),
        )
    )
    wscore = wstat.select("tok", F.expr("(deg * 1000000) div freq").alias("s"))
    pscore = (
        members.join(wscore, "tok")
        .groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x.tok,
                ),
                " ",
            ).alias("phrase"),
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("score_s"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score_s").desc(), "phrase")
    return (
        pscore.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= RAKE_TOPK)
        .select("doc_id", "rank", "phrase", "n_words", "score_s")
    )


# Stratified k-fold assignment — the cross-validation counterpart of
# pipeline_dataset_split: folds must (a) be deterministic and
# seed-free, (b) balance WITHIN each stratum to +-1 row (plain
# hash-mod balances only in expectation — a small stratum can land
# 7/3/0/0/0), and (c) scatter pseudo-randomly so fold membership
# doesn't correlate with ingestion order. Rule: within each stratum
# (lang), rank docs by the multiplicative hash (doc_id reduced mod the
# prime, Fibonacci-hashed), fold = (rank - 1) mod K — exact balance by
# construction, hash-order scatter, one window per stratum.
KFOLD_K = 5
_KFOLD_HASH = "((doc_id % 1000000007) * 2654435761) % 1000000007"


@register(
    "pipeline_stratified_kfold",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_KFOLD_HASH}, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST((rn - 1) % {KFOLD_K} AS BIGINT) AS fold
    FROM r
    """,
)
def pipeline_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified {KFOLD_K}-fold assignment — see the
    block comment for the balance/scatter argument. Scale shape: ONE
    row_number window partitioned by the stratum (never a global
    sort); at 1000-executor scale each stratum's rank runs where its
    partition lives, and the output is a projection."""
    from pyspark.sql import Window as W

    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (
            (
                F.row_number().over(
                    W.partitionBy("lang").orderBy(
                        F.expr(_KFOLD_HASH), "doc_id"
                    )
                )
                - 1
            )
            % KFOLD_K
        )
        .cast("bigint")
        .alias("fold"),
    )


# Feature hashing ("the hashing trick", Weinberger et al. 2009): hash
# every token into FH_DIM signed buckets and emit the per-SOURCE
# hashed bag-of-words vector — the fixed-width featurizer that feeds
# linear classifiers when the vocabulary is unbounded (the same
# portable rolling hash as text_fingerprint / classify_quality_linear,
# so the oracle replays it bit-for-bit; sign bit taken from the hash
# bits ABOVE the bucket index keeps E[collision noise] = 0, the
# unbiasedness trick from the paper). Scale shape: tokens collapse to
# the (source, term) relation with one map-side-combined count (the
# term-hash arithmetic runs on that VOCABULARY-bounded relation, not
# per token occurrence); the final vector is a |sources| x FH_DIM
# map-side aggregate. All int64, all JVM-side, zero FP anywhere.
FH_DIM = 64


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH tf AS (
      SELECT source, t.term, CAST(count(*) AS BIGINT) AS cnt
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
      WHERE t.term <> ''
      GROUP BY source, t.term
    ),
    hashed AS (
      SELECT source, cnt,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                            list_transform(string_split_regex(term, ''),
                                           c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 31 + c) % 1000000007
             ) AS h
      FROM tf
    )
    SELECT source,
           CAST(h % {FH_DIM} AS BIGINT) AS bucket,
           CAST(sum(CASE WHEN (h // {FH_DIM}) % 2 = 0 THEN cnt ELSE -cnt END)
                AS BIGINT) AS feat,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM hashed
    GROUP BY source, h % {FH_DIM}
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashed bag-of-words per source (FH_DIM buckets) — see
    the block comment for the vocabulary-bounded hash stage and the
    unbiased sign trick."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "source", F.explode(F.split("text", " ")).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    h = F.aggregate(
        F.transform(F.split("term", ""), lambda c: F.ascii(c).cast("long")),
        F.lit(7).cast("long"),
        lambda acc, c: (acc * 31 + c) % 1000000007,
    )
    hashed = tf.select("source", "cnt", h.alias("h"))
    sign_cnt = F.when(
        F.expr(f"(h div {FH_DIM}) % 2") == 0, F.col("cnt")
    ).otherwise(-F.col("cnt"))
    return (
        hashed.groupBy("source", (F.col("h") % FH_DIM).cast("bigint").alias("bucket"))
        .agg(
            F.sum(sign_cnt).cast("bigint").alias("feat"),
            F.count("*").cast("bigint").alias("n_terms"),
        )
    )


# Class-balanced downsampling: cap every label class at the MINORITY
# class's size, keeping each class's members in a deterministic
# multiplicative-hash order — the class-imbalance fix applied before
# training a probe/classifier (random undersampling made reproducible,
# the sample_stratified convention extended with a data-dependent
# cap). Scale shape: class sizes are one map-side aggregate; the
# 1-row minimum broadcasts; per-class ranks ride a label-partitioned
# window (each class ranks independently in parallel); the hash order
# decorrelates the kept set from ingestion order at zero extra cost.
# The hash is int64-exact ((vec_id+1) * 2654435761 % 2^31 — the
# SPLIT_HASH overflow-safe convention) so both engines rank
# identically, tie-broken by vec_id (hash collisions are possible;
# the ORDER BY is therefore total).
@register(
    "sample_class_balance",
    oracle="""
    WITH sized AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
    ),
    cap AS (SELECT min(n) AS n_min FROM sized),
    ranked AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY ((vec_id + 1) * 2654435761) % 2147483648, vec_id
             ) AS rn
      FROM embeddings
    )
    SELECT vec_id, label FROM ranked, cap WHERE rn <= n_min
    """,
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every embedding label class to the minority-class
    size in deterministic hash order — see the block comment."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    cap = (
        e.groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n"))
        .agg(F.min("n").alias("n_min"))
    )
    w = W.partitionBy("label").orderBy(
        F.expr("((vec_id + 1) * 2654435761) % 2147483648"), "vec_id"
    )
    return (
        e.select("vec_id", "label", F.row_number().over(w).alias("rn"))
        .crossJoin(F.broadcast(cap))
        .where(F.col("rn") <= F.col("n_min"))
        .select("vec_id", "label")
    )


# --- multinomial naive Bayes ------------------------------------------------
# The classic counts-only text classifier, entirely expressible as
# relational algebra: train = smoothed per-(lang, term) log-likelihoods
# from token counts; predict = per-(doc, lang) integer sums of those
# log-likelihoods. Exactness: every log quantizes to the 1e12 lattice
# as int64 (the text_perplexity convention), so per-doc scores are
# exact integer sums — order-independent, argmax deterministic with
# lang as tie-break. Headroom: |llp| <= ~20 * 1e12, times <= ~1e4
# tokens/doc -> |score| <= 2e17 < int64.
_NB_TOKS_CTE = """toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
nlt AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS n_term
  FROM toks GROUP BY lang, term
),
tl AS (
  SELECT lang, CAST(sum(n_term) AS BIGINT) AS t_l FROM nlt GROUP BY lang
),
vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM nlt),
model AS (
  SELECT n.lang, n.term, n.n_term,
         CAST(floor(ln((n.n_term + 1.0) / (t.t_l + vv.v))
                    * 1000000000000 + 0.5) AS BIGINT) AS llp
  FROM nlt n JOIN tl t USING (lang) CROSS JOIN vv
)"""


def _nb_spark_model(spark: SparkSession, sf_dir: str):
    """(tok, model) for the naive-Bayes pair: tok = exploded non-empty
    whitespace tokens of lang-labeled docs; model = (lang, term,
    n_term, llp) with llp the 1e12-lattice quantized smoothed
    log-likelihood ln((n+1)/(T_l+V))."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
    )
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("term"),
    )
    nlt = (
        tok.groupBy("lang", "term")
        .agg(F.count("*").cast("bigint").alias("n_term"))
        .transform(pin_cache)
    )
    tl = nlt.groupBy("lang").agg(F.sum("n_term").cast("bigint").alias("t_l"))
    vv = nlt.agg(F.countDistinct("term").cast("bigint").alias("v"))
    model = (
        nlt.join(F.broadcast(tl), "lang")
        .crossJoin(F.broadcast(vv))
        .select(
            "lang",
            "term",
            "n_term",
            F.floor(
                F.log((F.col("n_term") + 1.0) / (F.col("t_l") + F.col("v")))
                * 1000000000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("llp"),
        )
    )
    return tok, model, tl, vv


@register(
    "ml_naive_bayes_train",
    oracle=f"""
    WITH {_NB_TOKS_CTE},
    rk AS (
      SELECT lang, term, n_term, llp,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_term DESC, term) AS rn
      FROM model
    )
    SELECT lang, term, n_term, llp FROM rk WHERE rn <= 50
    """,
)
def ml_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes training over lang-labeled documents:
    Laplace-smoothed log-likelihood ln((n_lt+1)/(T_l+V)) per (lang,
    term) on the exact 1e12 integer lattice; released as the top-50
    terms per language (count desc, term tie-break) so the output stays
    k-bounded while the full model remains a vocabulary-bounded
    relation. Plan: token explode -> (lang, term) hash aggregate
    (map-side combined, the corpus's only shuffle keyed on the natural
    key), k-row broadcast of per-lang totals, and a lang-partitioned
    top-k window that prunes below the exchange (WindowGroupLimit)."""
    _, model, _, _ = _nb_spark_model(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.col("n_term").desc(), "term")
    return (
        model.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("lang", "term", "n_term", "llp")
    )


@register(
    "ml_naive_bayes_confusion",
    oracle=f"""
    WITH {_NB_TOKS_CTE},
    dl AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS d_l
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
      GROUP BY lang
    ),
    dd AS (SELECT CAST(sum(d_l) AS BIGINT) AS d FROM dl),
    cls AS (
      SELECT dl.lang,
             CAST(floor(ln(CAST(dl.d_l AS DOUBLE) / dd.d)
                        * 1000000000000 + 0.5) AS BIGINT) AS prior,
             CAST(floor(ln(1.0 / (tl.t_l + vv.v))
                        * 1000000000000 + 0.5) AS BIGINT) AS dflt
      FROM dl, dd, tl, vv WHERE tl.lang = dl.lang
    ),
    dt AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, term
    ),
    base AS (
      SELECT d.doc_id, d.lang AS actual,
             CAST(COALESCE(nt.n_tok, 0) AS BIGINT) AS n_tok
      FROM documents d
      LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
                 FROM toks GROUP BY doc_id) nt USING (doc_id)
      WHERE d.text IS NOT NULL AND d.lang IS NOT NULL
    ),
    matched AS (
      SELECT dt.doc_id, m.lang,
             CAST(sum(dt.c * m.llp) AS BIGINT) AS sm,
             CAST(sum(dt.c) AS BIGINT) AS mc
      FROM dt JOIN model m USING (term)
      GROUP BY dt.doc_id, m.lang
    ),
    scores AS (
      SELECT b.doc_id, b.actual, c.lang,
             c.prior + COALESCE(ma.sm, 0)
               + (b.n_tok - COALESCE(ma.mc, 0)) * c.dflt AS score
      FROM base b CROSS JOIN cls c
      LEFT JOIN matched ma ON ma.doc_id = b.doc_id AND ma.lang = c.lang
    ),
    pred AS (
      SELECT doc_id, actual, lang AS predicted,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM scores
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY actual, predicted
    """,
)
def ml_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes self-classification confusion matrix: every doc
    scores against every language (log-prior + matched-token
    likelihoods + unseen-token smoothing mass, all exact int64 on the
    1e12 log lattice), argmax with lang tie-break, then a k x k
    confusion aggregate.

    Plan (r14 opt, guide §2.3/§2.4): doc-term counts join the
    vocabulary-bounded model on xxhash64(term) — 8-byte shuffle keys,
    term strings never cross an exchange (hash-value-invariant: ids
    only feed join equality, the oracle verifies the lattice scores
    over strings, so a vocab collision would surface as a value
    mismatch); n_tok derives from dt (sum of c) instead of a third
    token-explode scan; and the per-doc argmax runs IN-ROW — the
    per-(doc, lang) sums fold into a map, the k-row class relation
    collapses to a single broadcast array, and predicted =
    array_min(transform(classes, struct(-score, lang))).lang, exactly
    row_number's (score DESC, lang ASC) pick on exact int64 scores
    (negation exact, string tie-break binary in both forms). This
    removes the docs x langs fan through the (doc, lang) exchange and
    the doc-partitioned window sort that dominated the old tail.
    No Python, no collect; scores stay integers end to end."""
    tok, model, tl, vv = _nb_spark_model(spark, sf_dir)
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
    )
    dl = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("d_l"))
    dd = dl.agg(F.sum("d_l").cast("bigint").alias("d"))
    cls = (
        dl.crossJoin(F.broadcast(dd))
        .join(tl, "lang")
        .crossJoin(F.broadcast(vv))
        .select(
            "lang",
            F.floor(
                F.log(F.col("d_l").cast("double") / F.col("d")) * 1000000000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("prior"),
            F.floor(
                F.log(1.0 / (F.col("t_l") + F.col("v"))) * 1000000000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("dflt"),
        )
    )
    # 1-row broadcast of the whole class relation (k rows, k small by
    # construction — languages), sorted so the in-row argmin's input
    # order is deterministic
    cls_arr = cls.agg(
        F.array_sort(
            F.collect_list(F.struct("lang", "prior", "dflt"))
        ).alias("cs")
    )
    dt = tok.groupBy(
        "doc_id", F.xxhash64("term").alias("th")
    ).agg(F.count("*").cast("bigint").alias("c"))
    nt = dt.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n_tok"))
    base = (
        d.select("doc_id", F.col("lang").alias("actual"))
        .join(nt, "doc_id", "left")
        .select(
            "doc_id", "actual", F.coalesce("n_tok", F.lit(0)).cast("bigint").alias("n_tok")
        )
    )
    matched = (
        dt.join(
            model.select(F.xxhash64("term").alias("th"), "lang", "llp"), "th"
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("c") * F.col("llp")).cast("bigint").alias("sm"),
            F.sum("c").cast("bigint").alias("mc"),
        )
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("lang", F.struct("sm", "mc")))
            ).alias("m")
        )
    )
    scored = (
        base.join(matched, "doc_id", "left")
        .crossJoin(F.broadcast(cls_arr))
        .select(
            "actual",
            F.array_min(
                F.transform(
                    "cs",
                    lambda c: F.struct(
                        (
                            -(
                                c["prior"]
                                + F.coalesce(
                                    F.element_at("m", c["lang"])["sm"], F.lit(0)
                                )
                                + (
                                    F.col("n_tok")
                                    - F.coalesce(
                                        F.element_at("m", c["lang"])["mc"],
                                        F.lit(0),
                                    )
                                )
                                * c["dflt"]
                            ).alias("ns")
                        ),
                        c["lang"].alias("lang"),
                    ),
                )
            )["lang"].alias("predicted"),
        )
    )
    return scored.groupBy("actual", "predicted").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


# --- Heaps' law --------------------------------------------------------------
# Vocabulary-growth fit V(N) ~ k N^beta: natural corpora land beta in
# ~[0.4, 0.6]; a deduplicate-starved crawl (vocab grows too slowly) or
# a synthetic/garbage corpus (too fast) bends away — the companion
# corpus-health diagnostic to text_zipf_slope, fitted the same way
# (per-point 1e12-lattice OLS moments, exact integer sums, closed-form
# slope from identical doubles). Growth checkpoints are the ten
# doc_id-RANGE deciles — an id-range cut, not a rank cut, so the
# checkpoint assignment is a pure map-side expression from a broadcast
# 1-row bounds aggregate (no corpus-sized rank window at any scale).
# Cumulative token mass and cumulative first-occurrence vocabulary
# ride 10-row windows over the decile relation.
@register(
    "text_heaps_law",
    oracle="""
    WITH b AS (
      SELECT min(doc_id) AS lo, max(doc_id) AS hi
      FROM documents WHERE text IS NOT NULL
    ),
    toks AS (
      SELECT least(9, CAST((10 * (d.doc_id - b.lo)) // (b.hi - b.lo + 1)
                           AS BIGINT)) AS dec,
             u.tok
      FROM documents d, b,
           LATERAL (SELECT unnest(list_filter(string_split(d.text, ' '),
                                              t -> t <> '')) AS tok) u
      WHERE d.text IS NOT NULL
    ),
    tc AS (SELECT dec, CAST(count(*) AS BIGINT) AS toks FROM toks GROUP BY dec),
    vc AS (
      SELECT dec, CAST(count(*) AS BIGINT) AS vnew
      FROM (SELECT tok, min(dec) AS dec FROM toks GROUP BY tok)
      GROUP BY dec
    ),
    cum AS (
      SELECT tc.dec,
             CAST(sum(tc.toks) OVER (ORDER BY tc.dec) AS BIGINT) AS n_cum,
             CAST(sum(COALESCE(vc.vnew, 0)) OVER (ORDER BY tc.dec) AS BIGINT)
               AS v_cum
      FROM tc LEFT JOIN vc USING (dec)
    ),
    pts AS (
      SELECT CAST(floor(ln(n_cum) * 1000000000000 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(v_cum) * 1000000000000 + 0.5) AS BIGINT) AS y,
             CAST(floor(ln(n_cum) * ln(v_cum) * 1000000000000 + 0.5) AS BIGINT)
               AS xy,
             CAST(floor(ln(n_cum) * ln(n_cum) * 1000000000000 + 0.5) AS BIGINT)
               AS xx
      FROM cum WHERE n_cum > 0 AND v_cum > 0
    ),
    sums AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS DOUBLE) / 1000000000000 AS sx,
             CAST(sum(y) AS DOUBLE) / 1000000000000 AS sy,
             CAST(sum(xy) AS DOUBLE) / 1000000000000 AS sxy,
             CAST(sum(xx) AS DOUBLE) / 1000000000000 AS sxx
      FROM pts
    )
    SELECT n AS n_checkpoints,
           (SELECT max(n_cum) FROM cum) AS total_tokens,
           (SELECT max(v_cum) FROM cum) AS vocab_size,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0 THEN
             floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                   * 1000000 + 0.5) / 1000000 END AS heaps_beta,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0 THEN
             floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   * 1000000 + 0.5) / 1000000 END AS heaps_lnk
    FROM sums
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit over doc_id-range decile
    checkpoints — see the block comment. Plan: ONE token-explode
    shuffle into (decile, token) space collapses to (a) per-decile
    token mass and (b) per-term first decile (both map-side combined,
    term being the natural key of the second); everything after lives
    on a <= 10-row relation."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    b = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    toks = (
        d.crossJoin(F.broadcast(b))
        .select(
            F.least(
                F.lit(9),
                F.expr("(10 * (doc_id - lo)) div (hi - lo + 1)"),
            )
            .cast("bigint")
            .alias("dec"),
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "tok"
            ),
        )
        .transform(pin_cache)
    )
    tc = toks.groupBy("dec").agg(F.count("*").cast("bigint").alias("toks"))
    vc = (
        toks.groupBy("tok")
        .agg(F.min("dec").alias("dec"))
        .groupBy("dec")
        .agg(F.count("*").cast("bigint").alias("vnew"))
    )
    wc = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        tc.join(vc, "dec", "left")
        .select(
            "dec",
            F.sum("toks").over(wc).cast("bigint").alias("n_cum"),
            F.sum(F.coalesce("vnew", F.lit(0))).over(wc).cast("bigint").alias("v_cum"),
        )
        .transform(pin_cache)
    )
    q = F.lit(1000000000000)
    lnn, lnv = F.log(F.col("n_cum")), F.log(F.col("v_cum"))
    pts = cum.where((F.col("n_cum") > 0) & (F.col("v_cum") > 0)).select(
        F.floor(lnn * q + F.lit(0.5)).alias("x"),
        F.floor(lnv * q + F.lit(0.5)).alias("y"),
        F.floor(lnn * lnv * q + F.lit(0.5)).alias("xy"),
        F.floor(lnn * lnn * q + F.lit(0.5)).alias("xx"),
    )
    sums = pts.agg(
        F.count("*").alias("n"),
        (F.sum("x").cast("double") / q).alias("sx"),
        (F.sum("y").cast("double") / q).alias("sy"),
        (F.sum("xy").cast("double") / q).alias("sxy"),
        (F.sum("xx").cast("double") / q).alias("sxx"),
    )
    tots = cum.agg(
        F.max("n_cum").alias("total_tokens"), F.max("v_cum").alias("vocab_size")
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    ok = (F.col("n") > 1) & (den > 0)
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return sums.crossJoin(F.broadcast(tots)).select(
        F.col("n").alias("n_checkpoints"),
        "total_tokens",
        "vocab_size",
        F.when(ok, q6(beta)).alias("heaps_beta"),
        F.when(ok, q6((F.col("sy") - beta * F.col("sx")) / F.col("n"))).alias(
            "heaps_lnk"
        ),
    )


# --- preference-pair construction -------------------------------------------
# The RLHF/DPO data-prep primitive: within each source (the "prompt
# group" stand-in), pair the i-th highest-quality document with the
# i-th lowest as (chosen, rejected), keeping at most PREF_PAIRS_PER
# pairs per group and only pairs whose quality margin clears
# PREF_MIN_MARGIN — the standard "build preference pairs from a scalar
# reward" recipe, expressed as two rank windows and a rank equi-join.
# Scores are text_quality_score's q6-quantized composite (shared
# implementation, so the ranking can't drift from the released
# score). Deterministic tie-breaks: best ranks (quality DESC, doc_id),
# worst ranks (quality ASC, doc_id DESC) — a doc can appear in both
# rankings but never pairs with itself (explicit guard). Plan: the
# quality relation joins source (doc-keyed), two source-partitioned
# rank windows (WindowGroupLimit prunes beyond PREF_PAIRS_PER), one
# rank equi-join on the tiny per-group heads.
PREF_PAIRS_PER = 5
PREF_MIN_MARGIN = 0.05


@register(
    "pipeline_preference_pairs",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             floor((least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
                    + (len(list_filter(string_split(text, ' '),
                                       t -> t IN ({{stops}}))) * 1.0
                       / len(string_split(text, ' '))) * 0.3
                    + (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                       / length(text)) * 0.3) * 1000000 + 0.5) / 1000000
               AS quality,
             source
      FROM documents
    ),
    best AS (
      SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rn
      FROM q
    ),
    worst AS (
      SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality ASC, doc_id DESC) AS rn
      FROM q
    )
    SELECT b.source, b.rn AS pair_rank,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           floor((b.quality - w.quality) * 1000000 + 0.5) / 1000000 AS margin
    FROM best b JOIN worst w ON b.source = w.source AND b.rn = w.rn
    WHERE b.rn <= {PREF_PAIRS_PER}
      AND b.doc_id <> w.doc_id
      AND b.quality - w.quality >= {PREF_MIN_MARGIN}
    """.replace("{stops}", _sql_list(EN_STOP)),
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chosen, rejected) preference pairs per source from the shared
    quality score — rank-i-best vs rank-i-worst with a minimum margin;
    see the block comment for determinism and plan shape."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "quality")
        .join(d, "doc_id")
        .transform(pin_cache)
    )
    wb = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    ww = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").desc()
    )
    best = q.select(
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("quality").alias("qb"),
        F.row_number().over(wb).alias("rn"),
    ).where(F.col("rn") <= PREF_PAIRS_PER)
    worst = q.select(
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("quality").alias("qw"),
        F.row_number().over(ww).alias("rn"),
    ).where(F.col("rn") <= PREF_PAIRS_PER)  # WindowGroupLimit prunes map-side
    j = best.join(worst, ["source", "rn"])
    return (
        j.where(
            (F.col("chosen_doc") != F.col("rejected_doc"))
            & (F.col("qb") - F.col("qw") >= PREF_MIN_MARGIN)
        )
        .select(
            "source",
            F.col("rn").alias("pair_rank"),
            "chosen_doc",
            "rejected_doc",
            (
                F.floor((F.col("qb") - F.col("qw")) * 1000000 + F.lit(0.5)) / 1000000
            ).alias("margin"),
        )
    )
