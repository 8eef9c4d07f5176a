"""Window function queries (SURVEY.md §2.3 — absent in the reference;
first-class here via ``pyspark.sql.Window``).

Determinism: every window ORDER BY includes a unique tie-break key so
ranking and running aggregates are reproducible; running sums go
through decimal so the (deterministic, ordered) accumulation is exact
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kaylee_spark.queries import query
from kaylee_spark.sources import load_table


@query(
    "w01_rank_orders",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
               DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS dense_price_rank,
               NTILE(4)     OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_quartile,
               CAST(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS DOUBLE) AS price_pct_rank
        FROM orders
    ) WHERE price_rank <= 3
    """,
)
def w01_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking surface per partition: RANK / ROW_NUMBER / DENSE_RANK /
    NTILE / PERCENT_RANK in one driver-verified query (top-3 orders per
    customer; quartile+pct computed over the full partition before the
    filter). The standalone NTILE query lives on as extra-registry
    w04_ntile_share.

    Scale: one shuffle on o_custkey serves all five functions (same
    window spec); the rank<=3 filter is applied streaming per group.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("price_rank"),
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("dense_price_rank"),
            F.ntile(4).over(w).alias("price_quartile"),
            F.percent_rank().over(w).cast("double").alias("price_pct_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


@query(
    "w02_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_orders_so_far,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
                o_orderdate) AS BIGINT) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_orderkey
    FROM orders
    """,
)
def w02_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an explicit ROWS frame plus LAG/LEAD
    offset analytics — one driver-verified query, one shuffle (all four
    functions share the partition + ordering; Spark plans a single
    Window node). The standalone LAG/LEAD query lives on as
    extra-registry w03_lag_lead."""
    order_cols = (F.asc("o_orderdate"), F.asc("o_orderkey"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy(*order_cols)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("n_orders_so_far"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(wo)).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(wo).alias("next_orderkey"),
    )


@query(
    "w03_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
                o_orderdate) AS BIGINT) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_orderkey
    FROM orders
    """,
    extra=True,
)
def w03_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytics: inter-order gap per customer."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "w04_ntile_share",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_quartile,
           CAST(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS DOUBLE) AS bal_pct_rank
    FROM customer
    """,
    extra=True,
)
def w04_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE + PERCENT_RANK distribution analytics."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).cast("double").alias("bal_pct_rank"),
    )


@query(
    "w05_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS max_neighbor_price
    FROM lineitem
    """,
)
def w05_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering column."""
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rangeBetween(-1, 1)
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.max(F.col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double").alias("max_neighbor_price"),
    )
