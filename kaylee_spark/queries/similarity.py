"""Similarity-search queries over the embeddings fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaylee_spark.operators import similarity as S
from kaylee_spark.queries import query
from kaylee_spark.sources import load_table


@query(
    "s01_cosine_topk",
    oracle="""
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cosine_sim,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                            c.vec_id ASC) AS INT) AS rank
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
    ) WHERE rank <= 10
    """,
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors.

    Scale: the query set broadcasts; corpus scanned once; per-query
    rank (row_number window) keeps only k rows per query. Scores are
    rounded to 6dp on BOTH sides so last-ulp association differences
    between engines can't flip the hash.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.cosine_topk(emb, queries, k=10, id_col="vec_id", vec_col="embedding", query_id_col="query_id")
    return out.select("query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")


@query("s02_lsh_ann_topk", oracle=None)
def s02_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH with 1-bit multi-probe.

    Approximate by construction -> no SQL oracle; tests measure recall
    against s01's exact result instead (rows-only check here).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    return S.lsh_bucketed_topk(emb, queries, k=10, n_planes=4, n_tables=4, dim=64)


@query("s04_ivf_ann_topk", oracle=None)
def s04_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via IVF: k-means coarse quantizer (pyspark.ml) +
    probe-4-of-16 inverted lists + exact re-rank.

    k-means training is not SQL-expressible -> rows-only check; recall
    vs s01's exact result is asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    return S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4, dim=64)


@query("s03_embedding_neardup", oracle=None)
def s03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table LSH self-join.

    Threshold 0.4 with 5 tables x 5 planes: the fixture corpus is
    near-isotropic (max pairwise cosine ~0.5-0.6), so 0.4 is the
    "near-duplicate" band that actually exists in the data; 5-bit
    buckets keep candidate volume ~40% below the 4-bit config at the
    same ~0.4 recall (more, smaller buckets beats fewer, bigger ones).
    Approximate recall -> rows-only check; recall vs the exact pair set
    is asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_neardup_pairs(emb, threshold=0.4, n_planes=5, n_tables=5, dim=64)
