"""Similarity search over embedding columns (array<float>).

Two paths, matching the scale ladder:

- brute-force cosine top-k: exact baseline. The k-NN join is a
  broadcast of the (small) query set against the (huge) corpus —
  one corpus scan, per-partition top-k via window rank, no corpus
  shuffle until the final tiny k*|queries| rows.
- random-hyperplane LSH (signed projections -> bit signature ->
  bucket join): the at-scale ANN path. Candidates only within
  matching buckets; exact cosine re-ranks candidates.

Vector math uses built-in higher-order functions (zip_with +
aggregate, sequential fold -> deterministic) so everything stays in
the JVM; embeddings cast to double once at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kaylee_spark.functions import cosine, dot, l2_norm


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    corpus: (id_col, vec_col);  queries: (query_id_col, vec_col).
    Output: (query_id, neighbor_id, cosine_sim) — excludes self-match
    when ids coincide. Scale: broadcast queries, scan corpus once,
    rank within query partition.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine_sim").cast("double"), "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (numpy RNG,
    fixed seed — reproducible across runs and engines)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via multi-table random-hyperplane LSH + exact re-rank.

    Standard L-tables construction: n_tables independent sign-bit
    signatures of n_planes projections each. A corpus vector is a
    candidate for a query if they share a bucket in ANY table (plus
    1-bit-flip multi-probe buckets on the query side). Candidates are
    deduped then exactly re-ranked by cosine. Per-table bucket fan-out
    partitions the corpus 2^p ways, so cost/recall tunes smoothly via
    (p, L) — the knob that matters at 10^9 vectors.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))

    def signature(vec, planes):
        out = F.lit(0)
        for i, plane in enumerate(planes):
            out = out + F.when(dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return out

    tables = [random_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    c_buckets = F.array(
        *[F.struct(F.lit(t).alias("table"), signature(F.col("cv"), planes).alias("bucket")) for t, planes in enumerate(tables)]
    )
    c_exploded = c.withColumn("tb", F.explode(c_buckets)).select("neighbor_id", "cv", "tb.table", "tb.bucket")

    # query side: own bucket + all 1-bit-flip probes, per table
    q_probe_structs = []
    for t, planes in enumerate(tables):
        sig = signature(F.col("qv"), planes)
        q_probe_structs.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
        for i in range(n_planes):
            q_probe_structs.append(F.struct(F.lit(t).alias("table"), sig.bitwiseXOR(F.lit(1 << i)).alias("bucket")))
    q_exploded = q.withColumn("tb", F.explode(F.array(*q_probe_structs))).select("query_id", "qv", "tb.table", "tb.bucket")

    cands = (
        c_exploded.join(F.broadcast(q_exploded), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cands.withColumn("cosine_sim", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine_sim").cast("double"), "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join.

    Pairs land in the same bucket (sign signature agreement) then get
    exact-cosine verified; at threshold>=0.95 near-dups almost surely
    agree on all sign bits, so recall stays high while the bucket join
    keeps cost ~ sum of squared bucket sizes, not n^2.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    sig = F.lit(0)
    for i, plane in enumerate(planes):
        sig = sig + F.when(dot(F.col("v"), F.array(*[F.lit(w) for w in plane])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    c = c.withColumn("bucket", sig)
    a = c.select(F.col("vid").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = c.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine(F.col("va"), F.col("vb")).cast("double"))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
