"""MapReduce-algebra queries — the reference's native capability
surface (word count is its single end-to-end workload,
`/root/reference/example.py:15-45`), expressed both DataFrame-native
and through the reference-faithful ``MapReduceJob`` API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaylee_spark.core.mapreduce import MapReduceJob
from kaylee_spark.queries import query
from kaylee_spark.sources import load_table

_WORDS_ORACLE = """
    SELECT word, COUNT(*) AS count
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
"""


@query("m01_wordcount", oracle=_WORDS_ORACLE, extra=True)
def m01_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count, DataFrame-native (scan -> explode -> hash agg).

    The reference's mapfn/reducefn pair (`example.py:23-29`) compiled
    to built-ins: fully JVM-side, map-side partial aggregation replaces
    the central shuffle dict (`server.py:212`).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("count"))


@query(
    "m02_wordcount_top25",
    oracle=_WORDS_ORACLE + " ORDER BY count DESC, word ASC LIMIT 25",
    extra=True,
)
def m02_wordcount_top25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact query incl. the driver-side top-25
    (`example.py:45`) — here a TakeOrderedAndProject, not a collect."""
    return (
        m01_wordcount(spark, sf_dir)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(25)
    )


@query("m03_mapreduce_api_wordcount", oracle=_WORDS_ORACLE)
def m03_mapreduce_api_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the kaylee-contract API (datafn/mapfn/
    reducefn -> results), proving the RDD path computes the same
    answer as the DataFrame path and the SQL oracle.

    Uses from_dataframe (distributed scan) rather than a driver-side
    datafn; combiner declared associative so reduceByKey does map-side
    partial aggregation (README.md:20-24's correctness condition).
    """

    def mapfn(doc_id, text):
        for tok in text.split(" "):
            if tok:
                yield tok, 1

    def reducefn(key, values):
        return sum(values)

    job = MapReduceJob(
        spark,
        mapfn=mapfn,
        reducefn=reducefn,
        combiner=lambda a, b: a + b,
    ).from_dataframe(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    return job.to_dataframe("word", "count").select(
        F.col("word"), F.col("count").cast("bigint").alias("count")
    )
