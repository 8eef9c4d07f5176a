"""BM25 keyword ranking over a document corpus.

The reference's word-count is the degenerate form of this (term
frequency with no weighting, `/root/reference/example.py:23-45`);
BM25 is the standard lexical relevance score a training-data pipeline
uses for targeted corpus slicing ("pull the docs about X") and for
building retrieval eval sets.

Scale shape: for a FIXED small term list the per-document term
frequencies and document length are pure row-local array expressions
(split + filter + size — whole-stage codegen, no explode, no
shuffle). Corpus statistics (N, avg doc length, per-term document
frequency) are ONE tiny aggregate broadcast back over the scan, so
the whole query is: scan → 1-row agg → broadcast cross join →
codegen score → TakeOrderedAndProject. Nothing shuffles the corpus.

Determinism: idf and each per-term score round to 6dp — ``ln`` is
faithfully- but not correctly-rounded in both engines' libm, so the
raw doubles may differ in the last ulp; everything else is exact
integer arithmetic or identically-associated double expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokenizer shared by the Spark path and the SQL oracle twin
TOKEN_SPLIT = "[^a-z0-9]+"


def _check_terms(terms: list[str]) -> None:
    if not terms:
        raise ValueError("terms must not be empty")
    for t in terms:
        if not re.fullmatch("[a-z0-9]+", t):
            raise ValueError(f"terms must be lowercase alphanumeric tokens: {t!r}")


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a fixed bag of query terms.

    Returns (id_col, score) ordered by score desc with the id as a
    unique tie-break; documents matching no term are dropped.
    """
    _check_terms(terms)
    toks = F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != F.lit(""))

    # NB: closure factory, not a default-arg lambda — pyspark treats a
    # 2-parameter HOF lambda as (element, index), so `lambda x, t=t`
    # would silently compare tokens against the array index.
    def eq(term: str):
        return lambda x: x == F.lit(term)

    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[F.size(F.filter(toks, eq(t))).alias(f"tf_{t}") for t in terms],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}")
        df_t = F.col(f"df_{t}")
        idf = F.round(F.log(F.lit(1.0) + (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))), 6)
        part = F.round(
            idf
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)),
            6,
        )
        score = part if score is None else score + part
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — kept in lockstep (identical
    association order and 6dp rounding points)."""
    _check_terms(terms)
    tf_cols = ",\n               ".join(
        f"len(list_filter(tokens, x -> x = '{t}')) AS tf_{t}" for t in terms
    )
    df_cols = ",\n               ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in terms
    )
    parts = "\n             + ".join(
        f"ROUND(ROUND(ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5)), 6)"
        f" * (tf_{t} * {k1 + 1.0}) / (tf_{t} + {k1} * ({1.0 - b} + {b} * dl / (CAST(sum_dl AS DOUBLE) / n_docs))), 6)"
        for t in terms
    )
    return f"""
    WITH d AS (
        SELECT {id_col}, len(tokens) AS dl,
               {tf_cols}
        FROM (
            SELECT {id_col},
                   list_filter(string_split_regex(lower({text_col}), '{TOKEN_SPLIT}'), x -> x <> '') AS tokens
            FROM {table}
        )
    ),
    s AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
               {df_cols}
        FROM d
    )
    SELECT {id_col}, score FROM (
        SELECT d.{id_col},
               {parts} AS score
        FROM d CROSS JOIN s
    )
    WHERE score > 0
    ORDER BY score DESC, {id_col}
    LIMIT {k}
    """
