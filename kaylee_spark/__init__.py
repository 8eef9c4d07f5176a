"""kaylee_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capability surface of the reference
MapReduce framework (sdiehl/kaylee, surveyed in SURVEY.md) as an
idiomatic Spark engine:

- ``kaylee_spark.core``      — the reference-faithful MapReduce API
  (datafn/mapfn/reducefn -> results dict), RDD-backed.
- ``kaylee_spark.sources``   — table loading / registration helpers.
- ``kaylee_spark.operators`` — relational + LLM-pipeline operator
  library (dedup, similarity search, text analysis, multimodal,
  as-of/range joins).
- ``kaylee_spark.queries``   — the registry of headline queries, each
  paired with a DuckDB-oracle SQL string for correctness checking.
- ``kaylee_spark.streaming`` — Structured Streaming operators over the
  events table (watermarks, windows, stateful dedup).

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.
"""

from kaylee_spark.session import get_spark
from kaylee_spark.core.mapreduce import MapReduceJob

__all__ = ["get_spark", "MapReduceJob"]
__version__ = "0.1.0"
