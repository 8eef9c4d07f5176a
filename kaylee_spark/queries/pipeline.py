"""End-to-end curation pipeline query (extra tier): the full
quality -> exact-dedup -> near-dup-clustering ladder summarized per
language, verified against a single DuckDB SQL program (the train/eval
split is excluded — its seeded xxhash64 has no SQL twin; kept =
train ∪ eval is split-independent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaylee_spark.pipelines import curate
from kaylee_spark.queries import query
from kaylee_spark.sources import load_table

_ORACLE = """
    WITH RECURSIVE scored AS (
        SELECT doc_id, lang, text,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the','and','of','to','a','in','is'))) AS DOUBLE)
                   / greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1) AS sw_ratio,
               CASE WHEN len(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> '')) <= 1 THEN 0.0
                    ELSE CAST(len(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> ''))
                              - len(list_distinct(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> ''))) AS DOUBLE)
                         / len(list_filter(string_split(text, chr(10)), ln -> trim(ln) <> ''))
               END AS rep_ratio
        FROM documents
    ),
    passed AS (SELECT * FROM scored WHERE sw_ratio >= 0.05 AND rep_ratio <= 0.3),
    winners AS (SELECT sha256(text) AS h, MIN(doc_id) AS winner FROM passed GROUP BY sha256(text)),
    tagged AS (SELECT p.*, w.winner FROM passed p JOIN winners w ON sha256(p.text) = w.h),
    exact_unique AS (SELECT * FROM tagged WHERE doc_id = winner),
    sh AS (
        SELECT DISTINCT doc_id AS doc, gram AS shingle FROM (
            SELECT doc_id,
                   UNNEST(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                       i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS gram
            FROM exact_unique
        )
    ),
    sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY doc),
    common AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, label) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node AS doc, MIN(label) AS cluster FROM reach GROUP BY node),
    labeled AS (
        SELECT eu.doc_id, eu.lang,
               (eu.doc_id = COALESCE(c.cluster, eu.doc_id)) AS is_canonical
        FROM exact_unique eu LEFT JOIN comp c ON c.doc = eu.doc_id
    )
    SELECT 'kept' AS status, lang, COUNT(*) AS n FROM labeled WHERE is_canonical GROUP BY lang
    UNION ALL
    SELECT 'near_dup' AS status, lang, COUNT(*) AS n FROM labeled WHERE NOT is_canonical GROUP BY lang
    UNION ALL
    SELECT 'exact_dup' AS status, lang, COUNT(*) AS n FROM tagged WHERE doc_id <> winner GROUP BY lang
    UNION ALL
    SELECT 'quality' AS status, lang, COUNT(*) AS n FROM scored WHERE NOT (sw_ratio >= 0.05 AND rep_ratio <= 0.3) GROUP BY lang
    """


@query("p01_curation_summary", oracle=_ORACLE, extra=True)
def p01_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-ladder accounting per language: kept canonical docs
    plus rejects by reason, cross-validated against a single SQL
    program reproducing the whole ladder (quality predicates, sha256
    min-id exact dedup, Jaccard>=0.5 recursive-CTE clustering)."""
    res = curate(load_table(spark, sf_dir, "documents"))
    kept = (
        res.train.unionByName(res.eval)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .select(F.lit("kept").alias("status"), "lang", "n")
    )
    rejected = (
        res.rejected.groupBy(F.col("reason").alias("status"), "lang")
        .agg(F.count("*").alias("n"))
        .select("status", "lang", "n")
    )
    return kept.unionByName(rejected)


#: per-language token budgets for the p02 mix — all five bind at every
#: fixture scale (sf0.001 pools are ~4-10k tokens per lang).
P02_BUDGETS = {"en": 5000, "de": 2000, "fr": 2000, "es": 2000, "zh": 1000}

_P02_BUDGET_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}.0" for k, v in P02_BUDGETS.items())
    + " ELSE 0.0 END"
)

_P02_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id AS doc, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents
    ),
    prof AS (
        SELECT doc, lang, CAST(len(tk) AS BIGINT) AS n_tokens,
               list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                              i -> array_to_string(tk[i:i+2], ' ')) AS grams
        FROM toks
    ),
    pool AS (
        SELECT doc, lang, n_tokens FROM prof
        WHERE len(grams) = 0
           OR CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
              / len(grams) <= 0.2
    ),
    walked AS (
        SELECT doc, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM pool
    ),
    kept AS (
        SELECT * FROM walked WHERE cum - n_tokens < {_P02_BUDGET_CASE}
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           CAST({_P02_BUDGET_CASE} AS BIGINT) AS budget,
           CAST(GREATEST(SUM(n_tokens) - {_P02_BUDGET_CASE}, 0) AS BIGINT)
               AS overshoot
    FROM kept GROUP BY lang
    """


@query("p02_pretraining_mix", oracle=_P02_ORACLE, extra=True)
def p02_pretraining_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mix accounting: documents gated by the t25
    repetition filter (language-neutral, measured repetition only),
    then per-language token budgets filled in deterministic id order
    (t12's budgeted-prefix window) — per lang the kept doc/token
    totals, the budget, and the bounded overshoot (at most one
    straddling doc). The whole ladder is one scan-speed gate plus ONE
    lang-keyed window (kaylee_spark/pipelines.py pretraining_mix)."""
    from kaylee_spark.pipelines import pretraining_mix

    docs = load_table(spark, sf_dir, "documents")
    kept = pretraining_mix(docs, P02_BUDGETS)
    budget_col = F.lit(0)
    for k, v in P02_BUDGETS.items():
        budget_col = F.when(F.col("lang") == k, F.lit(v)).otherwise(budget_col)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    ).select(
        "lang",
        "n_kept",
        "tokens_kept",
        budget_col.cast("bigint").alias("budget"),
        F.greatest(
            F.col("tokens_kept") - budget_col.cast("bigint"), F.lit(0).cast("bigint")
        ).alias("overshoot"),
    )


_P03_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
           CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN n_chars >= 200 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
           CAST(COUNT(DISTINCT CASE WHEN n_chars >= 200 THEN sha256(text) END) AS BIGINT) AS n_unique
    FROM documents
    """


@query("p03_observed_funnel", oracle=_P03_ORACLE)
def p03_observed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass pipeline observability: the curation funnel's
    per-stage counters collected with ``DataFrame.observe`` — metrics
    piggyback on the ONE job that computes the pipeline's real result
    instead of re-scanning per stage (at 100 TB a three-stage funnel
    audited by separate counts costs three extra full scans; observe
    costs zero). Stage counters (input size; quality survivors + their
    character mass) ride as Observation rows through the SAME action
    that computes the final exact-dedup cardinality; the returned
    one-row frame is assembled from the observed values — bounded
    driver state, like every model/planner scalar in the registry.

    All four measures are integer-exact (counts and an int character
    sum), so the hash gate verifies the observe() path bit-for-bit
    against DuckDB's filtered aggregates — proving the piggybacked
    counters equal the recompute-from-scratch semantics.
    """
    from pyspark.sql import Observation

    from kaylee_spark.operators.dedup import content_hash

    docs = load_table(spark, sf_dir, "documents")
    obs_in = Observation()
    obs_q = Observation()
    staged = docs.observe(obs_in, F.count(F.lit(1)).alias("n_input")).filter(
        F.col("n_chars") >= 200
    ).observe(
        obs_q,
        F.count(F.lit(1)).alias("n_quality"),
        F.sum("n_chars").alias("chars_kept"),
    )
    n_unique = staged.agg(
        F.count_distinct(content_hash("text")).alias("n_unique")
    ).first()["n_unique"]
    from kaylee_spark.functions import literal_frame

    # literal_frame, not createDataFrame: one literal result row must
    # not plan a Python-worker scan
    return literal_frame(
        spark,
        [
            (
                obs_in.get["n_input"],
                obs_q.get["n_quality"],
                int(obs_q.get["chars_kept"]),
                n_unique,
            )
        ],
        "n_input long, n_quality long, chars_kept long, n_unique long",
    )
