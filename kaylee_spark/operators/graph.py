"""Iterative graph analytics over relational edge lists.

The reference engine has no graph surface (its MapReduce loop could
express one iteration per job submission — SURVEY.md §2.1 #2/#3 — but
nothing iterates); this module supplies the iterative-algorithm family
a 100 TB curation pipeline needs beyond connected components
(operators/dedup.py): link-analysis ranking of entities derived from
fact tables, e.g. ranking suppliers by the mass of customer demand
flowing to them.

Why FIXED-POINT INTEGER arithmetic instead of doubles: PageRank is a
repeated sum, and double summation is not associative — Spark's
partial-aggregate merge order differs run to run (and from any other
engine's scan order), so a floating-point implementation cannot be
bit-reproducible, which breaks both the DuckDB oracle hash-match and
the restartability story (a resumed 100 TB job must reproduce the
ranks it had committed). Ranks here are BIGINT "pico-ranks" (units of
1e-12): every operation is integer multiply / integer floor-division /
integer sum — exact, associative, and identical in every engine and
under every partitioning. The floor divisions leak ≤1 pico-rank of
mass per node per step (strictly bounded, tested), which is far below
any ranking-relevant signal.

Scale shape (3-iteration loop at 100 TB):
- the edge list is the only large input; it is scanned once into a
  (src, dst) projection and reused each iteration,
- each iteration = one shuffle join (ranks ⋈ edges on src, AQE-planned;
  out-degrees ride along pre-joined on the same key) + one partial
  aggregation on dst (map-side combine of bigint sums),
- node/degree frames are one row per vertex — orders of magnitude
  smaller than edges,
- the vertex count is pulled to the driver once (a single scalar,
  the normal shape for iterative algorithms) and folded into the
  teleport literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaylee_spark.sources import load_table

#: rank mass is distributed in units of 1e-12 (bigint "pico-ranks"):
#: total mass RANK_SCALE splits exactly under integer division while
#: leaving ~6 significant digits of headroom above any per-node rank.
RANK_SCALE = 1_000_000_000_000

#: damping 0.85 as the exact rational 17/20 — integer multiply then
#: floor-divide, so both Spark and any SQL oracle compute identically.
DAMPING_NUM, DAMPING_DEN = 17, 20

#: supplier node ids are offset so they can't collide with customer
#: keys in the bipartite demand graph.
SUPPLIER_OFFSET = 10_000_000


def customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed demand edges customer -> supplier: one edge per distinct
    (customer, supplier) trading relationship in orders ⋈ lineitem.

    The join is key-on-key (o_orderkey = l_orderkey) so AQE plans one
    shuffle; the distinct collapses the ~4 lineitems/order fan-out
    before any downstream work sees the edges.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPPLIER_OFFSET)).alias("dst"),
        )
        .distinct()
    )


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over a (src, dst) bigint edge list.

    Returns (id, rank_e12): rank in pico-ranks (multiply by 1e-12 for
    the conventional [0, 1] rank). Deterministic to the bit — see the
    module docstring. Dangling nodes (no out-edges) keep only the
    teleport share; their lost mass is NOT redistributed (the simple
    "leaky" PageRank variant), which every engine reproduces exactly.

    r_0(v)   = RANK_SCALE div N
    r_{k+1}(v) = (0.15 * RANK_SCALE) div N
               + (17 * Σ_{u→v} (r_k(u) div outdeg(u))) div 20
    """
    edges = edges.select("src", "dst")
    # Spark does not dedupe common subplans: without the caches below,
    # one action over the 3-iteration plan re-derives the edge list
    # (scan + join + distinct) once per iteration and the node set more
    # often still. Both frames are iteration-invariant, so cache them —
    # on a cluster this is the standard iterative-algorithm shape
    # (persist the loop invariants, rebuild only the ranks).
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # pre-join out-degree onto the edge list ONCE: each iteration then
    # needs only the ranks ⋈ edges join, not a second degree join.
    edges_deg = edges.join(deg, "src").cache()

    # the vertex count is the one driver-visible scalar (standard for
    # iterative algorithms — it sizes the teleport term); pulled once
    # off the cached node set, then folded into codegen as a literal,
    # which keeps every per-row expression join-free.
    n = nodes.count()
    base = F.lit((RANK_SCALE * 3 // 20) // n)
    ranks = nodes.select("id", F.lit(RANK_SCALE // n).alias("r"))
    for _ in range(iterations):
        contrib = (
            edges_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.expr("r DIV deg")).alias("contrib"))
        )
        ranks = nodes.join(contrib, "id", "left").select(
            "id",
            (
                base
                + F.expr(
                    f"({DAMPING_NUM} * coalesce(contrib, CAST(0 AS BIGINT))) DIV {DAMPING_DEN}"
                )
            ).alias("r"),
        )
    return ranks.select("id", F.col("r").alias("rank_e12"))
