"""Query registry: each headline query = (Spark callable, DuckDB oracle SQL).

The registry is the single source of truth consumed by:
- ``__spark_entry__.py``  (driver correctness gate),
- ``tests/test_oracle.py`` (local replica of that gate),
- ``bench.py``            (per-query timing at sf0.1).

Contract per entry (see repo driver docs):
- the Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle is ANSI SQL DuckDB runs on the same parquet (views named
  region nation customer supplier part orders lineitem events
  documents embeddings);
- column names must match exactly (both sides alias every computed
  column) because the compare sorts columns by name before hashing;
- oracle=None marks a genuinely non-SQL-expressible op (the driver
  then records a rows-only check).

Determinism rules used throughout (so value-hashes match bit-for-bit):
- SUM/AVG over double columns go through DECIMAL(18,2) accumulation
  then cast back to double: decimal addition is exact and
  order-independent, so Spark's nondeterministic partial-agg merge
  order and DuckDB's scan order produce identical bits. A raw double
  SUM would differ in the last ulp from run to run.
- every LIMIT/top-k query adds a unique tie-break column to its sort.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str | None


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so their @query decorators run."""
    from kaylee_spark.queries import (  # noqa: F401
        advanced,
        dedup,
        llm_text,
        mapreduce,
        relational,
        similarity,
        streaming,
        window,
    )

    return REGISTRY
