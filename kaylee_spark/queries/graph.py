"""Graph-analytics queries (iterative link analysis over fact tables).

The oracle twin unrolls the exact fixed-point iteration (see
operators/graph.py for why integer pico-ranks make this bit-exact
across engines): each CTE pair (c_k, r_k) is one power-iteration step,
all arithmetic integer multiply / floor-divide / sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kaylee_spark.operators.graph import (
    DAMPING_DEN,
    DAMPING_NUM,
    RANK_SCALE,
    SUPPLIER_OFFSET,
    customer_supplier_edges,
    pagerank,
)
from kaylee_spark.queries import query

_BASE = RANK_SCALE * 3 // 20  # (1 - 0.85) * RANK_SCALE, exactly


def _pagerank_oracle(iterations: int = 3) -> str:
    steps = []
    prev = "r0"
    for k in range(1, iterations + 1):
        steps.append(
            f"""c{k} AS (
        SELECT e.dst AS id, CAST(SUM({prev}.r // d.deg) AS BIGINT) AS contrib
        FROM edges e
        JOIN {prev} ON e.src = {prev}.id
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    ), r{k} AS (
        SELECT nodes.id,
               CAST({_BASE} // n.n
                    + ({DAMPING_NUM} * COALESCE(c{k}.contrib, 0)) // {DAMPING_DEN}
                    AS BIGINT) AS r
        FROM nodes CROSS JOIN n LEFT JOIN c{k} ON nodes.id = c{k}.id
    )"""
        )
        prev = f"r{k}"
    return f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS src,
               l_suppkey + {SUPPLIER_OFFSET} AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS (
        SELECT src AS id FROM edges UNION SELECT dst FROM edges
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    r0 AS (
        SELECT id, CAST({RANK_SCALE} // n.n AS BIGINT) AS r
        FROM nodes CROSS JOIN n
    ),
    {",".join(steps)}
    SELECT id, r AS rank_e12 FROM {prev}
    """


@query("g01_pagerank", oracle=_pagerank_oracle(3), extra=True)
def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the bipartite customer->supplier
    demand graph (orders ⋈ lineitem, distinct trading pairs), in exact
    bigint pico-rank arithmetic; returns every node's rank."""
    return pagerank(customer_supplier_edges(spark, sf_dir), iterations=3)
