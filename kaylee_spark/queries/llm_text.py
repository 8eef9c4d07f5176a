"""Text-analysis queries over the documents fixture (north-star ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaylee_spark.operators import text as T
from kaylee_spark.queries import query
from kaylee_spark.sources import load_table

# shared SQL fragments kept in lockstep with operators/text.py
_SQL_TOKS = "string_split(text, ' ')"
_SQL_NTOK = f"len(list_filter({_SQL_TOKS}, t -> t <> ''))"


@query(
    "t01_lang_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_chars,
           CAST(SUM({_SQL_NTOK}) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang
    """,
    extra=True,
)
def t01_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (counts are ints -> exact arithmetic)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).cast("double").alias("avg_chars"),
        F.sum(T.token_count("text")).alias("total_tokens"),
    )


@query(
    "t02_token_stats",
    oracle=f"""
    SELECT doc_id,
           {_SQL_NTOK} AS n_tokens,
           CAST(CAST(list_sum(list_transform(list_filter({_SQL_TOKS}, t -> t <> ''), t -> len(t))) AS DOUBLE)
                / greatest({_SQL_NTOK}, 1) AS DOUBLE) AS mean_token_len
    FROM documents
    """,
    extra=True,
)
def t02_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.mean_token_len("text").alias("mean_token_len"),
    )


@query(
    "t03_quality_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter({_SQL_TOKS}, t -> t IN ('the','and','of','to','a','in','is'))) AS DOUBLE)
                   / greatest({_SQL_NTOK}, 1) AS sw_ratio,
               CASE WHEN len(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> '')) <= 1 THEN 0.0
                    ELSE CAST(len(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> ''))
                              - len(list_distinct(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> ''))) AS DOUBLE)
                         / len(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> ''))
               END AS rep_ratio
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN sw_ratio >= 0.05 THEN 1 END) AS n_quality,
           CAST(SUM(CAST(ROUND(sw_ratio, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_sw_ratio,
           CAST(SUM(CAST(ROUND(rep_ratio, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_rep_ratio
    FROM scored
    GROUP BY lang
    """, extra=True)
def t03_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate per language: stopword ratio plus the
    repeated-line-ratio boilerplate filter (operators/text.py), both
    driver-verified.

    The ratios are int/int double division (deterministic); SUMs over
    docs go through decimal-of-rounded so partial-agg order can't
    perturb bits.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        T.stopword_ratio("text").alias("sw_ratio"),
        T.repeated_line_ratio("text").alias("rep_ratio"),
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("sw_ratio") >= 0.05, F.lit(1))).alias("n_quality"),
        F.sum(F.round("sw_ratio", 6).cast("decimal(18,6)")).cast("double").alias("total_sw_ratio"),
        F.sum(F.round("rep_ratio", 6).cast("decimal(18,6)")).cast("double").alias("total_rep_ratio"),
    )


@query(
    "t04_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                       t -> (ascii(substring(t, 1, 1)) * 96031
                             + ascii(substring(t, len(t), 1)) * 1299709
                             + len(t) * 2654435761) % 2147483647)),
               (acc, x) -> (acc * 257 + x) % 2147483647
           ) AS fingerprint,
           (SELECT CASE WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                        WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
                        WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
                        WHEN n_es > 0 THEN 'es'
                        ELSE 'und' END
            FROM (SELECT
               len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','to','a','in','is'))) AS n_en,
               len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist','von'))) AS n_de,
               len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','et','de','est'))) AS n_fr,
               len(list_filter(string_split(text,' '), t -> t IN ('el','la','los','y','de','es'))) AS n_es)
           ) AS lang_pred
    FROM documents
    """,
    extra=True,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document profile: order-sensitive rolling-hash fingerprint
    (portable token hash so the SQL oracle reproduces it exactly) plus
    stopword-profile language ID — one driver-verified query; the
    grouped confusion-matrix view lives on as extra-registry
    t05_lang_id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint_portable("text").alias("fingerprint"),
        T.lang_id("text").alias("lang_pred"),
    )


@query(
    "t05_lang_id",
    oracle="""
    WITH hits AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','to','a','in','is'))) AS n_en,
               len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist','von'))) AS n_de,
               len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','et','de','est'))) AS n_fr,
               len(list_filter(string_split(text,' '), t -> t IN ('el','la','los','y','de','es'))) AS n_es
        FROM documents
    )
    SELECT lang,
           CASE WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
                WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
                WHEN n_es > 0 THEN 'es'
                ELSE 'und' END AS lang_pred,
           COUNT(*) AS n_docs
    FROM hits
    GROUP BY lang, CASE WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
                WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
                WHEN n_es > 0 THEN 'es'
                ELSE 'und' END
    """,
    extra=True,
)
def t05_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID vs. the labeled lang column
    (confusion-matrix style counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "t06_pandas_udf_tokens",
    oracle="""
    SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens
    FROM documents
    """, extra=True)
def t06_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf surface: Arrow-batched regex token count.

    The same count is SQL-expressible (that's the oracle) — the query
    exists to keep the vectorized-Python path under the hash gate, so
    a regression in Arrow transfer or pandas semantics fails loudly.
    """
    from kaylee_spark.functions.pandas_udfs import pd_token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", pd_token_count("text").alias("n_tokens"))


@query(
    "t07_grouped_pandas_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
           CAST(MEDIAN(n_chars) AS DOUBLE) AS median_chars
    FROM documents GROUP BY lang
    """,
    extra=True,
)
def t07_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas surface: holistic per-language stats
    (median needs the whole group — the pandas shape earns its keep)."""
    from kaylee_spark.functions.pandas_udfs import lang_stats_pandas

    return lang_stats_pandas(load_table(spark, sf_dir, "documents"))


@query(
    "t08_top_ngram_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk FROM documents
    ),
    grams AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(tk) - 1 + 1), i -> array_to_string(tk[i:i+1], ' '))) AS g
        FROM toks WHERE len(tk) >= 2
    ),
    counts AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
    SELECT doc_id AS doc, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_ngram_frac
    FROM counts GROUP BY doc_id
    """,
    extra=True,
)
def t08_top_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-bigram occupancy (degenerate-repetition
    filter). Spark counts hashed grams (xxhash64 — the 8-byte key is
    what rides the shuffle at scale); the oracle counts the raw
    strings: identical fractions unless two distinct grams in one doc
    collide in 64 bits (fixture-checked via the hash gate)."""
    from kaylee_spark.operators.text import top_ngram_fraction

    return top_ngram_fraction(load_table(spark, sf_dir, "documents"), "doc_id", "text", n=2)


@query(
    "t09_normalized_dedup",
    oracle="""
    SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS content_sha,
           MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    extra=True,
)
def t09_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-exact dedup: exact dedup keyed on the NORMALIZED text
    (lowercase, punctuation stripped, whitespace collapsed — the
    C4/RefinedWeb canonicalization), catching near-misses raw content
    hashing is blind to at a fraction of MinHash's cost. Same one-
    shuffle shape as d01: normalization + sha256 are codegen'd scan-
    side, only the 32-byte key rides the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2(T.normalize_text("text"), 256).alias("content_sha"), "doc_id")
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_count"))
    )


@query(
    "t10_pii_redaction",
    oracle=r"""
    WITH red AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                   '\+?[0-9][0-9()\-\s.]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
               text
        FROM documents
    )
    SELECT doc_id, sha256(redacted) AS redacted_sha, (redacted <> text) AS changed
    FROM red
    """,
    extra=True,
)
def t10_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails/IPs/phone-runs -> typed placeholders) hashed
    per doc — the hash gate proves Spark's Java-regex redaction and
    DuckDB's RE2 redaction are byte-identical, which is what makes the
    restricted PII_PATTERNS dialect (operators/text.py) trustworthy.
    Literal redaction behavior is unit-tested on planted PII."""
    docs = load_table(spark, sf_dir, "documents")
    red = T.redact_pii("text")
    return docs.select(
        "doc_id",
        F.sha2(red, 256).alias("redacted_sha"),
        (red != F.col("text")).alias("changed"),
    )


@query(
    "t11_doc_chunking",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST((s - 1) // 48 AS INT) AS chunk_idx,
               array_to_string(tk[s:s + 63], ' ') AS chunk_text
        FROM toks, UNNEST(generate_series(1, greatest(len(tk) - 16, 1), 48)) AS u(s)
    )
    SELECT doc_id AS doc, chunk_idx, chunk_text,
           CAST(len(list_filter(string_split(chunk_text, ' '), t -> t <> '')) AS INT) AS n_tokens
    FROM chunks
    """,
    extra=True,
)
def t11_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows, 16-token overlap
    (48-token stride). Row-local array ops + one explode — chunking
    itself is shuffle-free; the oracle mirrors the window algebra with
    DuckDB list slicing (end-inclusive [s : s+63])."""
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=16)


@query(
    "t12_token_budget_mix",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM toks
    )
    SELECT doc_id, lang, n_tokens FROM cum
    WHERE c - n_tokens < CASE lang WHEN 'en' THEN 5000.0 WHEN 'de' THEN 1500.0
                                   WHEN 'zh' THEN 2000.0 ELSE 0.0 END
    """,
    extra=True,
)
def t12_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing under per-language token budgets: keep each
    language's doc_id-ordered prefix until its budget is spent
    (languages without a budget drop out) — the data-mixing primitive
    of pretraining recipes, as one per-stratum running-sum window
    (operators/sampling.py take_until_budget)."""
    from kaylee_spark.operators.sampling import take_until_budget

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return take_until_budget(
        docs, "lang", "doc_id", "n_tokens", {"en": 5000, "de": 1500, "zh": 2000}
    )


_BM25_TERMS = ["spark", "join", "stream", "vector"]


@query(
    "t13_bm25_topk",
    oracle=None,  # replaced below: built by the operator's SQL-twin generator
    extra=True,
)
def t13_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed query-term bag over the corpus: tf and
    doc length are row-local array expressions (no explode), corpus
    stats one broadcast 1-row agg, score in codegen, top-k via
    TakeOrderedAndProject — the corpus never shuffles
    (operators/ranking.py bm25_topk; oracle via bm25_oracle_sql in
    lockstep)."""
    from kaylee_spark.operators.ranking import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


# the oracle is generated by the same module that defines the scoring
# formula, so the two sides cannot drift independently
def _install_bm25_oracle() -> None:
    from dataclasses import replace

    from kaylee_spark.operators.ranking import bm25_oracle_sql
    from kaylee_spark.queries import EXTRA_REGISTRY

    spec = EXTRA_REGISTRY["t13_bm25_topk"]
    EXTRA_REGISTRY["t13_bm25_topk"] = replace(spec, oracle=bm25_oracle_sql(_BM25_TERMS, k=20))


_install_bm25_oracle()


@query(
    "t14_vocabulary",
    oracle=f"""
    WITH v AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (
            SELECT doc_id, UNNEST(list_filter({_SQL_TOKS}, t -> t <> '')) AS term
            FROM documents
        )
        GROUP BY term
        HAVING COUNT(*) >= 2
    )
    SELECT term,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term) - 1 AS INT) AS term_id,
           n_docs, n_occurrences
    FROM v
    """,
    extra=True,
)
def t14_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-sorted corpus vocabulary with dense 0-based term ids
    (min_count=2): explode + one term-keyed agg over the corpus, then
    a global window over only the surviving vocabulary
    (operators/text.py build_vocabulary)."""
    docs = load_table(spark, sf_dir, "documents")
    out = T.build_vocabulary(docs, min_count=2)
    return out.withColumn("term_id", F.col("term_id").cast("int"))


@query(
    "t15_encode_corpus",
    oracle=f"""
    WITH v AS (
        SELECT term,
               CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term) - 1 AS INT) AS term_id
        FROM (
            SELECT term, COUNT(*) AS n_occurrences
            FROM (
                SELECT UNNEST(list_filter({_SQL_TOKS}, t -> t <> '')) AS term
                FROM documents
            )
            GROUP BY term
            HAVING COUNT(*) >= 2
        )
    ),
    m AS (
        SELECT MAP(list(term ORDER BY term_id), list(term_id ORDER BY term_id)) AS vm
        FROM v
    )
    SELECT doc_id,
           array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), ',') AS token_ids_csv,
           CAST(len(ids) AS INT) AS n_tokens,
           CAST(len(list_filter(ids, x -> x = -1)) AS INT) AS n_oov
    FROM (
        SELECT doc_id,
               list_transform(list_filter({_SQL_TOKS}, t -> t <> ''),
                              t -> COALESCE(map_extract(vm, t)[1], -1)) AS ids
        FROM documents CROSS JOIN m
    )
    """,
    extra=True,
)
def t15_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document as an ordered array of vocabulary term
    ids (OOV -> -1): positional explode + broadcast vocab join + one
    doc-keyed reassembly (operators/text.py encode_with_vocabulary
    over build_vocabulary's t14 ids) — the corpus-to-id-sequences
    step of a pretraining pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = T.build_vocabulary(docs, min_count=2)
    enc = T.encode_with_vocabulary(docs, vocab)
    # the operator's real output is the id ARRAY; the gate (like the
    # driver) cannot hash array cells, so the query row serializes it
    # losslessly (csv + length + oov count)
    ids = F.col("token_ids")
    return enc.select(
        "doc_id",
        F.array_join(F.transform(ids, lambda x: x.cast("string")), ",").alias("token_ids_csv"),
        F.size(ids).cast("int").alias("n_tokens"),
        F.size(F.filter(ids, lambda x: x == F.lit(-1))).cast("int").alias("n_oov"),
    )


@query(
    "t16_stratified_sample",
    oracle="""
    WITH tagged AS (
        SELECT lang, doc_id,
               ((doc_id % 2147483647) * 2654435761 % 1000000) AS bucket,
               CASE lang WHEN 'en' THEN 200000 ELSE 500000 END AS rate_ppm
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN bucket < rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN bucket < rate_ppm THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM tagged
    GROUP BY lang
    """,
    extra=True,
)
def t16_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing by portable-hash stratified sampling
    (operators/sampling.portable_stratified_sample): downsample the
    dominant language to 20%, keep 50% of the rest — and prove the
    exact membership to an external SQL engine (kept_id_sum pins WHICH
    rows were kept, not just how many). Scan-speed: the membership
    predicate is three integer ops in codegen, no shuffle before the
    summary aggregate."""
    from kaylee_spark.operators.sampling import portable_stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = portable_stratified_sample(
        docs, key="doc_id", strata_col="lang", ppm={"en": 200_000}, default_ppm=500_000
    ).select("lang", "doc_id")
    kept_agg = kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"), F.sum("doc_id").alias("kept_id_sum")
    )
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return totals.join(kept_agg, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("kept_id_sum", F.lit(0)).alias("kept_id_sum"),
    )


@query(
    "t17_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
    ),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab),
    lp AS (
        SELECT t.doc_id,
               CAST(ROUND(ln(CAST(v.cnt AS DOUBLE) / n.n), 6) AS DECIMAL(18,6)) AS lp
        FROM toks t JOIN vocab v USING (tok) CROSS JOIN n
    )
    SELECT doc_id AS doc,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
    FROM lp GROUP BY doc_id
    """,
    extra=True,
)
def t17_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram LM (operators/text.unigram_logprob) — the cheap perplexity
    proxy for fluency filtering; 6dp-rounded decimal token scores make
    the holistic sum engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob(docs, "doc_id", "text")


@query(
    "t18_tfidf_keywords",
    oracle="""
    WITH tf AS (
        SELECT doc_id AS doc, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
            SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS term
            FROM documents
        ) GROUP BY doc_id, term
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
    idf AS (
        SELECT term, ROUND(ln((n.n + 1.0) / (COUNT(*) + 1)), 6) AS idf
        FROM tf CROSS JOIN n GROUP BY term, n.n
    )
    SELECT doc, term, rank, score FROM (
        SELECT tf.doc, tf.term,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY tf.doc
                   ORDER BY ROUND(tf.tf * idf.idf, 6) DESC, tf.term ASC
               ) AS INT) AS rank,
               ROUND(tf.tf * idf.idf, 6) AS score
        FROM tf JOIN idf USING (term)
    ) WHERE rank <= 3
    """,
    extra=True,
)
def t18_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (operators/text.tfidf_keywords):
    one corpus explode feeds both tf and df counts, idf joins back on
    the term key, per-doc top-k via a doc-partitioned window."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_keywords(docs, "doc_id", "text", k=3)


@query(
    "t19_bpe_pair_counts",
    oracle=f"""
    WITH tok AS (
        SELECT list_filter({_SQL_TOKS}, t -> t <> '') AS t FROM documents
    ),
    p AS (
        SELECT t[i] AS pair_a, t[i + 1] AS pair_b
        FROM tok, UNNEST(range(1, len(t))) AS r(i)
    )
    SELECT pair_a, pair_b, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY pair_a, pair_b
    ORDER BY n DESC, pair_a, pair_b LIMIT 100
    """,
    extra=True,
)
def t19_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 adjacent token pairs — one BPE merge round's counting
    step (operators/text.bpe_pair_counts): row-local array pairing,
    one map-side-combined pair-keyed agg, TakeOrderedAndProject top-n
    with full deterministic tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_pair_counts(docs, "text", top_n=100)


@query(
    "t20_sequence_packing",
    oracle=f"""
    WITH d AS (
        SELECT lang, doc_id, {_SQL_NTOK} AS n_tok FROM documents
    ),
    c AS (
        SELECT lang, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM d
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tok) + 511) // 512 AS BIGINT) AS n_blocks,
           CAST((SUM(n_tok) + 511) // 512 * 512 - SUM(n_tok) AS BIGINT) AS waste_tokens,
           CAST(SUM(CASE WHEN n_tok > 0
                          AND (cum - 1) // 512 > (cum - n_tok) // 512
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
           CAST(CASE WHEN SUM(n_tok) = 0 THEN 1.0
                     ELSE ROUND(CAST(SUM(n_tok) AS DOUBLE)
                                / ((SUM(n_tok) + 511) // 512 * 512), 6)
                END AS DOUBLE) AS pack_efficiency
    FROM c GROUP BY lang
    """,
    extra=True,
)
def t20_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language concat-and-chunk packing accounting at a 512-token
    block size (operators/text.sequence_packing_stats): blocks
    yielded, final-block padding waste, boundary-straddling docs —
    exact integer arithmetic over a group-partitioned cumsum window.
    All operands non-negative, so Spark's truncating DIV equals the
    oracle's floor //."""
    docs = load_table(spark, sf_dir, "documents")
    return T.sequence_packing_stats(docs, "doc_id", "text", "lang", capacity=512)


@query(
    "t21_pmi_collocations",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT doc, tok FROM (
            SELECT doc_id AS doc,
                   UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents
        )
    ),
    vocab AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toks
        GROUP BY tok HAVING COUNT(*) BETWEEN 5 AND 1000
    ),
    elig AS (SELECT t.doc, t.tok, v.df FROM toks t JOIN vocab v USING (tok)),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
    pairs AS (
        SELECT a.tok AS tok_x, b.tok AS tok_y, a.df AS c_x, b.df AS c_y,
               CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM elig a JOIN elig b ON a.doc = b.doc AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 3
    )
    SELECT tok_x, tok_y, c_xy, c_x, c_y,
           ROUND(ln(CAST(c_xy AS DOUBLE) * CAST(n.n AS DOUBLE)
                 / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))), 6) AS pmi
    FROM pairs CROSS JOIN n
    """,
    extra=True,
)
def t21_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: document-level pointwise mutual information
    of token pairs (each counted once per doc, pairs seen >= 3 times).
    The df ∈ [5, 1000] vocabulary gate bounds the quadratic per-doc
    pair expansion BEFORE it happens (the d03 Σdf² lesson); N_docs
    folds into the ln as a codegen literal, and the single ln over
    exact bigint counts follows t17's cross-engine recipe
    (operators/text.py pmi_cooccurrence)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.pmi_cooccurrence(
        docs, "doc_id", "text", min_df=5, max_df=1000, min_pair=3
    )


@query(
    "t22_bigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        FROM documents
    ),
    bg AS (
        SELECT doc_id AS doc, t[i] AS a, t[i + 1] AS b
        FROM tok, UNNEST(range(1, len(t))) AS r(i)
    ),
    counts AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY a, b),
    ctx AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM counts GROUP BY a),
    v AS (
        SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v FROM (
            SELECT UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
            FROM documents
        )
    ),
    lp AS (
        SELECT bg.doc,
               CAST(ROUND(ln(CAST(c.c_ab + 1 AS DOUBLE)
                             / CAST(x.c_a + v.v AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM bg JOIN counts c USING (a, b) JOIN ctx x USING (a) CROSS JOIN v
    )
    SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM lp GROUP BY doc
    """,
    extra=True,
)
def t22_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-1-smoothed bigram conditional log-probability per
    document under the corpus's own bigram LM (operators/text.py
    bigram_logprob) — the perplexity-ladder rung above t17's unigram
    score: catches plausible-words-implausible-ORDER documents
    (shuffled text, keyword spam, OCR joins). Bigrams are built
    row-locally (t19's array slice), the model is one (a, b) count
    whose context totals derive from itself, V folds in as a codegen
    literal, and each token score rounds 6dp into exact decimal
    before the holistic per-doc sum (t17's ln recipe)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bigram_logprob(docs, "doc_id", "text")


@query(
    "t23_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id AS doc, CAST(length(text) AS BIGINT) AS n_chars,
               substr(text, CAST(i AS INTEGER), 1) AS ch
        FROM documents, UNNEST(generate_series(1, length(text))) AS u(i)
    ),
    counts AS (
        SELECT doc, n_chars, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars GROUP BY doc, n_chars, ch
    ),
    terms AS (
        SELECT doc, n_chars,
               CAST(ROUND(-((CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))
                            * ln(CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))), 6)
                    AS DECIMAL(18,6)) AS t
        FROM counts
    )
    SELECT doc, n_chars, CAST(COUNT(*) AS BIGINT) AS n_unique_chars,
           CAST(SUM(t) AS DOUBLE) AS entropy
    FROM terms GROUP BY doc, n_chars
    """,
    extra=True,
)
def t23_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — catches
    repeated-char padding (entropy ~0) AND binary/encoding damage
    (entropy far above natural language) in one pass. Per-char
    -p·ln(p) terms round into exact decimal before the per-doc sum
    (the t17 ln recipe); the exploded char stream collapses map-side
    to at most |alphabet| count rows per doc before the only shuffle
    (operators/text.py char_entropy)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.char_entropy(docs, "doc_id", "text")


@query(
    "t24_dsir_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS doc, (lang = 'en') AS tgt,
               UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
    ),
    lm AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cb,
               CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
        FROM toks GROUP BY tok
    ),
    tot AS (
        SELECT CAST(SUM(cb) AS BIGINT) AS nb, CAST(SUM(ct) AS BIGINT) AS nt,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM lm
    ),
    weights AS (
        SELECT tok,
               CAST(ROUND(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)), 6) AS DECIMAL(18,6))
             - CAST(ROUND(ln(CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
        FROM lm CROSS JOIN tot
    )
    SELECT t.doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w.w) AS DOUBLE) / COUNT(*) AS dsir_score
    FROM toks t JOIN weights w USING (tok)
    GROUP BY t.doc
    """,
    # driver-facing rounds 7-13; rotated to the extra tier in round 14
    # (t27/t33/t34 keep the text-selection family in the window).
    extra=True,
)
def t24_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance score (Xie et al. 2023): every document's mean
    per-token log-likelihood ratio between the English-slice unigram
    LM and the whole-corpus background LM — the data-selection recipe
    for pulling target-like documents out of a web crawl. Both LMs
    come from ONE map-side-combined token count (target counts as a
    conditional sum of the same agg); weights are a vocabulary-sized
    frame that broadcasts at scale (operators/text.py dsir_logratio)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("lang") == F.lit("en")
    )
    return T.dsir_logratio(docs, "doc_id", "text", "is_target")


@query(
    "t25_repeated_ngrams",
    oracle="""
    WITH g AS (
        SELECT doc_id AS doc,
               list_transform(
                   range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> array_to_string(toks[i:i+2], ' ')) AS grams
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents)
    )
    SELECT doc, CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                     / len(grams)
           END AS dup_frac,
           COALESCE((CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                     / len(grams)) > 0.2, FALSE) AS is_repetitive
    FROM g
    """,
    extra=True,
)
def t25_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-trigram fraction per document (Rae et
    al. 2021 A1.1) — the standard repetition filter a pretraining
    pipeline runs BEFORE any cross-document dedup, because a
    boilerplate loop inflates every shingle-based similarity. Fully
    row-local (operators/text.py repetition_profile): array ops in a
    single scan stage, ZERO shuffles (plan-asserted) — at 100 TB this is a
    scan-speed predicate, not a job."""
    docs = load_table(spark, sf_dir, "documents")
    return T.with_repetition_profile(docs, "text", n=3).select(
        F.col("doc_id").alias("doc"),
        "n_grams",
        "n_distinct",
        "dup_frac",
        F.coalesce(F.col("dup_frac") > 0.2, F.lit(False)).alias("is_repetitive"),
    )


def _shard_manifest_oracle() -> str:
    from kaylee_spark.operators.sampling import portable_bucket_sql

    return f"""
    SELECT ({portable_bucket_sql("doc_id")}) % 16 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_SQL_NTOK}) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """


@query("t26_shard_manifest", oracle=_shard_manifest_oracle(), extra=True)
def t26_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus shard manifest: every document deterministically
    assigned to one of 16 shards by the portable integer hash (t16's
    externally auditable membership recipe), with per-shard doc/token/
    char totals and id ranges (operators/text.py shard_manifest) —
    the writer-side accounting that lets a 100 TB corpus build verify
    shard balance and completeness without re-reading text. Scan-speed
    assignment + ONE map-side-combined aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return T.shard_manifest(docs, "doc_id", "text", n_shards=16)


@query(
    "t27_heavy_phrases",
    oracle="""
    WITH toks AS (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    uni AS (SELECT UNNEST(t) AS phrase FROM toks),
    bi AS (
        SELECT t[i] || ' ' || t[i+1] AS phrase
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ),
    all_p AS (SELECT phrase FROM uni UNION ALL SELECT phrase FROM bi),
    tot AS (SELECT COUNT(*) AS n FROM all_p)
    SELECT phrase, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM all_p
    GROUP BY phrase
    HAVING COUNT(*) * 1000000 >= 10000 * (SELECT n FROM tot)
    """,
)
def t27_heavy_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters over the phrase domain (unigrams +
    bigrams): every phrase holding >= 1% of all phrase occurrences,
    via the two-pass bounded-memory sketch
    (operators/analytics.heavy_hitters) — per-partition Misra-Gries
    summaries (k=200 counters, genuinely trimming here: the fixture
    realizes ~950 distinct phrases) build a guaranteed candidate
    superset, then one broadcast-semi-joined exact count applies the
    integer threshold. The output is EXACT (pass-2 filters every
    false candidate), which is why a plain GROUP BY / HAVING oracle
    hash-verifies the sketch path — same gate idea as a02's
    sketch-within-bound booleans, but here the sketch's answer IS the
    exact answer. At 100 TB this is how "which tokens/URLs/domains
    exceed 0.01% of the corpus" runs without shuffling a
    trillion-item domain: the one full-width exchange carries only
    candidates (<= k x partitions rows)."""
    from kaylee_spark.operators.analytics import heavy_hitters
    from kaylee_spark.operators.text import positional_grams, tokens

    # NO fan_out here (measured 2.2 -> 6.1 s): widening the input
    # multiplies the per-partition Misra-Gries summaries (k x
    # partitions candidate rows), so the exact second pass pays more
    # than the parallel explode saves at fixture scale; at 100 TB the
    # input is already wide and the trade does not arise
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    uni = docs.select(F.explode(toks).alias("phrase"))
    bi = docs.select(F.explode(positional_grams(toks, 2)).alias("phrase"))
    items = uni.unionByName(bi)
    out = heavy_hitters(items, "phrase", min_share_ppm=10_000, k=200)
    return out.select(F.col("item").alias("phrase"), "cnt")


#: process-level trained-tokenizer store, keyed by (fixture identity,
#: training params). The merge table is MODEL STATE — a few dozen
#: driver literals, a pure function of (corpus, params) — so the
#: lifecycle splits exactly like the q34/q35 staged layouts: the TRAIN
#: rungs (t28/t30) always retrain for real and refresh the store (they
#: exist to measure training), while the INFERENCE/EVAL rungs
#: (t31/t34) consume the stored model, paying training only when no
#: train rung has run in this process — precisely how a deployed
#: tokenizer is evaluated (nobody retrains per eval). Keyed on the
#: documents fixture's realpath+mtime so a regenerated fixture
#: invalidates (the _stage_tag staleness convention).
_BPE_MODELS: dict[tuple, list[tuple]] = {}

# bench.py resets this store at the start of every timed pass (via
# kaylee_spark.queries.clear_process_stores), so an eval rung measured
# in a pass where no train rung with MATCHING params preceded it pays
# its own training — cross-PASS model reuse must never subsidize a
# timed measurement (the deployed train-refresh/eval-consume semantics
# within one pass are unchanged).
from kaylee_spark.queries import register_process_store  # noqa: E402

register_process_store(_BPE_MODELS)

_BPE_MERGE_SCHEMA = (
    "round int, rank int, pair_a string, pair_b string, merged string, n bigint"
)


def _bpe_trained_merges(
    spark: SparkSession,
    sf_dir: str,
    rounds: int,
    batch_m: int = 1,
    refresh: bool = False,
) -> DataFrame:
    import os

    from kaylee_spark.operators.text import bpe_train
    from kaylee_spark.sources import table_path

    p = table_path(sf_dir, "documents")
    key = (os.path.realpath(p), int(os.path.getmtime(p)), rounds, batch_m)
    rows = None if refresh else _BPE_MODELS.get(key)
    if rows is None:
        df = bpe_train(
            load_table(spark, sf_dir, "documents"),
            "text",
            rounds=rounds,
            batch_m=batch_m,
        )
        rows = [tuple(r) for r in df.collect()]
        _BPE_MODELS[key] = rows
    from kaylee_spark.functions import literal_frame

    # literal_frame, not createDataFrame: reloading the shared model
    # must not plan a Python-worker scan on every consumer query
    return literal_frame(spark, rows, _BPE_MERGE_SCHEMA)


def _bpe_oracle(rounds: int = 5, batch_m: int = 1) -> str:
    """Unrolled-CTE replay of bpe_train (the g07 pattern): per round,
    pair counts from the current two-space-joined corpus, then
    ``batch_m`` greedy (n DESC, a, b) argmaxes — each excluding the
    tokens already used by this round's earlier picks (the
    token-disjointness filter) — then the round's REPLACE chain.
    String replace is left-to-right non-overlapping in DuckDB exactly
    as in Spark; matches are anchored to token boundaries by wrapping
    the corpus string in single-space sentinels and replacing
    ' a<2sp>b ' with ' ab ' (one boundary space survives on each side
    of a match, so back-to-back occurrences keep merging), mirroring
    the engine.  A missing rule (rank k found no disjoint pair) is
    COALESCEd to a three-space pattern, which can never occur in the
    wire format (separators are exactly two spaces).

    Every CTE is AS MATERIALIZED: DuckDB inlines plain CTEs, and the
    round-r frames reference round r-1 several times (pair count +
    each rule's two scalar subqueries + each NOT IN), so inlining
    re-expands the whole history per reference — exponential in
    rounds x batch_m (measured: 176 s for rounds=2, batch_m=3 at
    sf0.001 inlined vs sub-second materialized)."""
    parts = [
        """r0 AS MATERIALIZED (
        SELECT array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), '  ') AS s
        FROM documents
        WHERE array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), '  ') <> ''
    )"""
    ]
    all_m: list[str] = []
    for r in range(1, rounds + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
        SELECT p.pair_a AS a, p.pair_b AS b, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT UNNEST(list_transform(
                range(1, greatest(len(t), 1)),
                i -> struct_pack(pair_a := t[i], pair_b := t[i+1]))) AS p
            FROM (SELECT string_split(s, '  ') AS t FROM r{r-1})
        )
        GROUP BY 1, 2
    )""")
        for k in range(1, batch_m + 1):
            if k == 1:
                excl = ""
            else:
                toks = " UNION ALL ".join(
                    f"SELECT a FROM m{r}_{j} UNION ALL SELECT b FROM m{r}_{j}"
                    for j in range(1, k)
                )
                excl = f"WHERE a NOT IN ({toks}) AND b NOT IN ({toks})\n        "
            parts.append(f"""m{r}_{k} AS MATERIALIZED (
        SELECT {r} AS round, {k} AS rank, a, b, a || b AS merged, n
        FROM p{r} {excl}ORDER BY n DESC, a ASC, b ASC LIMIT 1
    )""")
            all_m.append(f"m{r}_{k}")
        chain = "' ' || s || ' '"
        for k in range(1, batch_m + 1):
            chain = (
                f"REPLACE({chain},\n"
                f"            COALESCE((SELECT ' ' || a || '  ' || b || ' ' FROM m{r}_{k}), '   '),\n"
                f"            COALESCE((SELECT ' ' || merged || ' ' FROM m{r}_{k}), ' '))"
            )
        parts.append(f"""r{r} AS MATERIALIZED (
        SELECT trim({chain}) AS s
        FROM r{r-1}
    )""")
    union = "\n    UNION ALL\n    ".join(
        f"SELECT CAST(round AS INT) AS round, CAST(rank AS INT) AS rank,"
        f" a AS pair_a, b AS pair_b, merged, n FROM {m}"
        for m in all_m
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + union


@query("t28_bpe_train", oracle=_bpe_oracle(5), extra=True)
def t28_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five rounds of corpus-wide BPE tokenizer training
    (operators/text.bpe_train): the iterative completion of t19's
    single counting round. Each round's merge rule is the exact
    most-frequent adjacent pair (lexicographic ties) and the merge is
    applied across the whole corpus before the next count — the
    learned table is reference-BPE's greedy sequence, and the oracle
    replays all five rounds as unrolled CTEs sharing the one
    load-bearing equivalence: literal string REPLACE over a
    sentinel-padded two-space-joined token stream is token-anchored
    AND left-to-right non-overlapping in both engines (the padding is
    what keeps a rule like (of, the) from firing inside "thereof" —
    see bpe_train's wire-format contract).

    This is the TRAIN rung: it always retrains (the measured work IS
    the five corpus scans) and refreshes the process-level model
    store the inference/eval rungs (t31/t34) consume."""
    return _bpe_trained_merges(spark, sf_dir, rounds=5, refresh=True)


def _bpe_apply_oracle(rounds: int = 5) -> str:
    """t31's oracle: the t28 training chain (same MATERIALIZED CTEs)
    plus a parallel APPLY chain that carries doc_id — a0 keeps EVERY
    document (empty ones included; they contribute no pairs and no
    replace can match inside their padded '  '), and each a{r} applies
    round r's rule with the identical sentinel-anchored REPLACE. The
    final row is per-doc raw vs post-merge token counts."""
    train = _bpe_oracle(rounds)  # "WITH r0 AS ..., ...\n    SELECT..."
    ctes = train[len("WITH ") : train.index("SELECT CAST(round")].rstrip()
    ctes = ctes.rstrip().rstrip(",")
    # drop the trailing UNION ALL select block remnants if any
    parts = [ctes]
    parts.append("""a0 AS MATERIALIZED (
        SELECT doc_id,
               array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), '  ') AS s
        FROM documents
    )""")
    for r in range(1, rounds + 1):
        parts.append(f"""a{r} AS MATERIALIZED (
        SELECT doc_id, trim(REPLACE(' ' || s || ' ',
            COALESCE((SELECT ' ' || a || '  ' || b || ' ' FROM m{r}_1), '   '),
            COALESCE((SELECT ' ' || merged || ' ' FROM m{r}_1), ' '))) AS s
        FROM a{r-1}
    )""")
    final = f"""SELECT a0.doc_id,
           CAST(CASE WHEN a0.s = '' THEN 0 ELSE len(string_split(a0.s, '  ')) END AS BIGINT) AS n_raw_tokens,
           CAST(CASE WHEN af.s = '' THEN 0 ELSE len(string_split(af.s, '  ')) END AS BIGINT) AS n_bpe_tokens
    FROM a0 JOIN a{rounds} af USING (doc_id)"""
    return "WITH " + ",\n    ".join(parts) + "\n    " + final


@query("t31_bpe_apply", oracle=_bpe_apply_oracle(5), extra=True)
def t31_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INFERENCE half of the tokenizer lifecycle: train five merge
    rules (t28's exact loop), then apply the learned table to the full
    corpus with operators/text.bpe_apply — the merge table folds into
    driver literals, so tokenization is ONE narrow chained-replace
    projection: no shuffle, no join, no Python in the hot path. Output
    is per-document raw vs post-merge token counts; the oracle replays
    training (shared CTEs with t28) plus a doc_id-carrying apply chain
    using the identical sentinel-anchored REPLACEs. Consumes the
    process-level trained model when a train rung already built it
    (the deployment shape: tokenize with the shipped table)."""
    from kaylee_spark.operators.text import bpe_apply, tokens

    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_trained_merges(spark, sf_dir, rounds=5)
    out = bpe_apply(docs, merges, "text")
    return out.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_raw_tokens"),
        "n_bpe_tokens",
    )


@query("t30_bpe_train_batched", oracle=_bpe_oracle(2, batch_m=3))
def t30_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched production rung of t28: two rounds learning up to
    THREE token-disjoint merge rules per corpus scan
    (bpe_train(batch_m=3)) — training M rules costs one pair-count
    scan per M rules instead of one per rule, which is the difference
    between 1000 and 333 corpus scans for a real 1000-merge tokenizer.
    Per round the single cached pair count yields three greedy
    (n DESC, a, b) argmaxes, each excluding tokens used by the round's
    earlier picks, so the batch's replaces cannot interact; the oracle
    unrolls exactly that selection (chained NOT IN CTEs) and the same
    sentinel-padded REPLACE chain. A TRAIN rung like t28: always
    retrains, refreshing the model store for its (rounds, batch_m)
    key."""
    return _bpe_trained_merges(
        spark, sf_dir, rounds=2, batch_m=3, refresh=True
    )


@query(
    "t29_weighted_sample",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
               ((doc_id % 2147483647) * 2654435761 % 1000000) AS bucket
        FROM documents
    ),
    s AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               ROUND(ln((bucket + 0.5) / 1000000.0), 6) / n_tokens AS score
        FROM w WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens
    FROM s ORDER BY score DESC, doc_id LIMIT 100
    """,
    extra=True,
)
def t29_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted exact-k corpus subsample — the quality/size-
    proportional selection step of a pretraining mix ("sample 100 docs
    with probability proportional to token count, without
    replacement") via the ORACLE-VERIFIABLE Efraimidis–Spirakis
    variant (operators/sampling.weighted_sample_k_portable): integer
    portable-hash uniforms, 6dp-quantized ln scores, top-k by
    TakeOrderedAndProject — membership is a pure function of the data
    that DuckDB re-derives row for row, the audit property t16
    established for rate sampling, extended here to weighted
    without-replacement selection."""
    from kaylee_spark.operators.sampling import weighted_sample_k_portable
    from kaylee_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    return weighted_sample_k_portable(docs, "doc_id", "n_tokens", 100)


@query(
    "t32_curriculum_bins",
    oracle="""
    WITH chars AS (
        SELECT doc_id AS doc, CAST(length(text) AS BIGINT) AS n_chars,
               substr(text, CAST(i AS INTEGER), 1) AS ch
        FROM documents, UNNEST(generate_series(1, length(text))) AS u(i)
    ),
    counts AS (
        SELECT doc, n_chars, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars GROUP BY doc, n_chars, ch
    ),
    terms AS (
        SELECT doc, n_chars,
               CAST(ROUND(-((CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))
                            * ln(CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))), 6)
                    AS DECIMAL(18,6)) AS t
        FROM counts
    ),
    scored AS (
        SELECT d.lang, e.doc, e.entropy FROM (
            SELECT doc, CAST(SUM(t) AS DOUBLE) AS entropy
            FROM terms GROUP BY doc
        ) e JOIN documents d ON d.doc_id = e.doc
    ),
    binned AS (
        SELECT lang, entropy,
               CAST(NTILE(3) OVER (PARTITION BY lang
                                   ORDER BY entropy, doc) AS INT) AS tertile
        FROM scored
    )
    SELECT lang, tertile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(entropy) AS lo_entropy,
           MAX(entropy) AS hi_entropy
    FROM binned GROUP BY lang, tertile
    """,
    extra=True,
)
def t32_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning bins: every document assigned to a
    per-language entropy TERTILE (low = repetitive/templated, high =
    dense/noisy — the middle band is the classic clean-text sweet
    spot), reported as per-(lang, tertile) counts with the bin's
    entropy range. Composes t23's exact-decimal character entropy
    (identical doubles in both engines) with a lang-partitioned
    NTILE over the total order (entropy, doc_id) — ties cannot
    straddle bins differently across engines.

    Scale note: NTILE is the exact-rank DEFINITION and Spark sorts it
    distributed within each lang partition (range-partitioned sort,
    no single-partition collapse), but a web-scale dominant language
    makes that sort the cost center — there you precompute tertile
    BOUNDARIES with a22's equi-depth recipe (exact interpolated
    percentiles, broadcast back) and assign in codegen; this query is
    the audit-grade exact-rank form the oracle can replay."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ent = T.char_entropy(docs, "doc_id", "text").select("doc", "entropy")
    scored = ent.join(docs.select(F.col("doc_id").alias("doc"), "lang"), "doc")
    w = Window.partitionBy("lang").orderBy("entropy", "doc")
    return (
        scored.withColumn("tertile", F.ntile(3).over(w))
        .groupBy("lang", "tertile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("entropy").alias("lo_entropy"),
            F.max("entropy").alias("hi_entropy"),
        )
    )


def _t33_oracle(rounds: int = 2, seed_multi: int = 60, keep_multi: int = 40,
                max_piece_len: int = 4, max_word_len: int = 10) -> str:
    """Unigram-LM training replayed by ENUMERATION: where the engine
    runs a Viterbi DP per word, the oracle expands EVERY segmentation
    with a recursive CTE and argmaxes under the identical total order
    (score DESC, n_pieces ASC, reversed-length string DESC — the
    right-to-left-longest tie-break, prefix-decomposable so DP ==
    enumeration). Same contract, different algorithm: agreement here
    is evidence of intent, not of a shared formula (the t28 lesson).
    """
    from kaylee_spark.operators.text import UNIGRAM_SCORE_SQL

    parts = [
        f"""toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
        FROM documents
    ),
    words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM toks
        WHERE regexp_matches(w, '^[a-z]+$') AND length(w) <= {max_word_len}
        GROUP BY w
    ),
    sub AS (
        SELECT substr(w.w, CAST(s.i AS INT), CAST(l.j - s.i + 1 AS INT)) AS piece,
               SUM(w.wf) AS cnt
        FROM words w, range(1, {max_word_len + 1}) s(i),
             range(1, {max_word_len + max_piece_len}) l(j)
        WHERE s.i <= length(w.w)
          AND l.j >= s.i AND l.j <= least(s.i + {max_piece_len} - 1, length(w.w))
        GROUP BY 1
    ),
    chars0 AS (SELECT piece FROM sub WHERE length(piece) = 1),
    vocab0 AS (
        SELECT piece, cnt FROM sub WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM sub WHERE length(piece) > 1
            ORDER BY cnt DESC, piece ASC LIMIT {seed_multi})
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""score{r - 1} AS (
        SELECT piece, {UNIGRAM_SCORE_SQL} AS s
        FROM vocab{r - 1}, (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM vocab{r - 1})
    ),
    paths{r} AS (
        SELECT w AS w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS np,
               '' AS revlen, '' AS path
        FROM words
        UNION ALL
        SELECT p.w, p.pos + length(v.piece), p.score + v.s, p.np + 1,
               CAST(length(v.piece) AS VARCHAR) || p.revlen,
               p.path || '|' || v.piece
        FROM paths{r} p JOIN score{r - 1} v
          ON substr(p.w, p.pos + 1, length(v.piece)) = v.piece
    ),
    best{r} AS (
        SELECT w, path FROM (
            SELECT w, path, ROW_NUMBER() OVER (
                PARTITION BY w ORDER BY score DESC, np ASC, revlen DESC) AS rn
            FROM paths{r} WHERE pos = length(w)) t
        WHERE rn = 1
    ),
    cnt{r} AS (
        SELECT piece, CAST(SUM(wf) AS BIGINT) AS cnt FROM (
            SELECT b.w, unnest(list_filter(string_split(b.path, '|'), x -> x <> '')) AS piece
            FROM best{r} b) u
        JOIN words USING (w) GROUP BY piece
    ),
    vocab{r} AS (
        SELECT c.piece, COALESCE(n.cnt, CAST(0 AS BIGINT)) AS cnt
        FROM chars0 c LEFT JOIN cnt{r} n USING (piece)
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM cnt{r} WHERE length(piece) > 1
            ORDER BY cnt DESC, piece ASC LIMIT {keep_multi})
    )""")
    return (
        "WITH RECURSIVE " + ",\n    ".join(parts)
        + f"""
    SELECT piece, CAST(length(piece) AS INT) AS piece_len, cnt AS n_uses
    FROM vocab{rounds}
    """
    )


@query("t33_unigram_lm_train", oracle=_t33_oracle())
def t33_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training over the
    corpus — the second dominant LLM tokenizer family, completing the
    lifecycle next to BPE's t19/t28/t30/t31: substring seed vocab, two
    EM rounds (Viterbi E-step over the distinct-word compressed
    corpus, quantized-ln M-step, coverage-preserving prune), exact
    integer arithmetic end to end (operators/text.unigram_train). The
    oracle REPLAYS TRAINING BY ENUMERATION — recursive-CTE expansion
    of every segmentation per word, argmax under the same total order
    the engine's DP uses — so engine-oracle agreement checks the
    segmentation CONTRACT, not a shared formula. One word-table scan
    per EM round; the score table is bounded model state broadcast in
    the UDF closure."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_train(docs)


def _bpe_eval_oracle(rounds: int = 5) -> str:
    """t34's oracle: t31's full per-document apply chain as a derived
    table, closed with the per-language fertility aggregate."""
    per_doc = _bpe_apply_oracle(rounds)
    return f"""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_raw_tokens) AS BIGINT) AS raw_tokens,
           CAST(SUM(p.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM ({per_doc}) p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """


@query("t34_tokenizer_eval", oracle=_bpe_eval_oracle(5))
def t34_tokenizer_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer EVALUATION — the lifecycle's third rung after training
    (t28/t30/t33) and inference (t31): per-language fertility/
    compression accounting for a learned merge table. Emits, per
    language, document count, raw whitespace-token volume, post-merge
    BPE token volume, and character volume — the integer ingredients
    of the two standard tokenizer-quality metrics (fertility =
    bpe_tokens/raw_tokens per language, compression = chars/bpe_token;
    LLM teams watch these per language because a tokenizer trained on
    a skewed mix quietly taxes the minority languages with more tokens
    per word). All columns are exact integers, so the hash gate checks
    train -> apply -> corpus-level accounting end to end.

    Scale shape: apply is the zero-exchange chained-replace
    projection; the eval itself is ONE map-side-combined groupBy over
    |langs| keys — the whole rung adds a single tiny aggregate to
    what t31 already pays. The merge table comes from the
    process-level trained-model store (_bpe_trained_merges): an eval
    rung scores a SHIPPED tokenizer, so training cost lives in the
    train rungs (t28/t30) and is paid here only when no trainer has
    run in this process (VERDICT r13 item 7 — the q34/q35
    ingest-vs-query split applied to model state)."""
    from kaylee_spark.operators.text import bpe_apply, tokens

    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_trained_merges(spark, sf_dir, rounds=5)
    out = bpe_apply(docs, merges, "text")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("raw_tokens"),
        F.sum("n_bpe_tokens").cast("bigint").alias("bpe_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
