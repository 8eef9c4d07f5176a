"""Table sources.

The reference's only source is a lazily mmap-scanned local text file
(`/root/reference/example.py:8-20`); this module generalizes that to
partitioned columnar scans: every fixture table is a parquet file and
loads through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free. CSV/JSON/text loaders are exposed
for parity with generic sources.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: all driver-provided fixture tables (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to always broadcast in star joins —
#: at TPC-H scale region/nation are fixed-size and supplier/part/customer
#: stay orders of magnitude below the fact table.
BROADCAST_TABLES = ("region", "nation", "supplier")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (pushdown/pruning-capable).

    Some generations of the events fixture store ``ts`` as parquet
    TIMESTAMP(NANOS), which Spark rejects outright; for those, read it
    as nanos-since-epoch long and floor-convert to a microsecond
    timestamp — exactly what DuckDB's micro-precision TIMESTAMP does,
    so both engines see identical values. Current fixtures store
    ``ts`` as TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ with no
    conversion needed — so the legacy path is gated on the dtype
    actually read, never applied unconditionally.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # legacy nanos fixture. Integer DIV, not /: nanos-since-epoch
            # (~1.7e18) exceeds double precision, so a float divide would
            # be off by ~hundreds of ns. Produce TIMESTAMP_NTZ via pure
            # epoch arithmetic: every other fixture column reads as NTZ,
            # and an LTZ here would shift window boundaries under a
            # non-UTC driver session.
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source (the reference's mmap line scan,
    `/root/reference/example.py:15-20`, as a partitioned scan)."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true"}
    opts.update(options)
    return spark.read.options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC columnar source (bundled with Spark; same pushdown/pruning
    machinery as parquet — PushedFilters/ReadSchema reach the scan).
    The interchange format when upstream lives in a Hive/ORC world."""
    return spark.read.options(**options).orc(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row", **options) -> DataFrame:
    """XML source — NATIVE in Spark 4 (the former spark-xml package
    moved into core; probed working in this build, unlike avro whose
    external module is not deployed — docs/COVERAGE.md §5). ``rowTag``
    names the repeating element that becomes a row; schema inference
    or an explicit ``schema`` option work like the JSON reader. The
    interchange format when upstream is SOAP/feeds/config dumps."""
    return spark.read.option("rowTag", row_tag).options(**options).format("xml").load(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = False
) -> DataFrame:
    """Raw-file source: one row per file with (path, modificationTime,
    length, content binary) — the INGEST path for multimodal corpora
    (image/audio/video files on a store become a binary column + typed
    metadata, then flow through operators/multimodal.py's mapInPandas
    plumbing). ``glob`` filters by filename (e.g. "*.jpg") at LISTING
    time, before any read. At 100 TB pair with
    spark.sql.files.maxPartitionBytes so many small files coalesce
    into sane tasks rather than one task per file.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def read_json_tolerant(
    spark: SparkSession, path: str, schema: str, corrupt_col: str = "_corrupt_record", **options
) -> DataFrame:
    """JSON ingestion that survives malformed lines — the default for
    web-scraped / third-party feeds at 100 TB, where some fraction of
    records is ALWAYS broken and a single bad line must not kill a
    20-hour job.

    PERMISSIVE mode parses what it can; unparseable lines land intact
    in ``corrupt_col`` (all schema fields null) so the pipeline can
    count, quarantine, or reprocess them instead of crashing
    (FAILFAST) or silently losing them (DROPMALFORMED). An explicit
    schema is REQUIRED: schema inference reads the data twice and
    silently drops the corrupt column.
    """
    full_schema = f"{schema}, {corrupt_col} STRING"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .options(**options)
        .json(path)
    )
