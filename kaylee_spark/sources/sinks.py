"""File and table sinks.

The reference's only sink is the coordinator-side results dict exposed
by ``Server.results()`` (`/root/reference/kaylee/server.py:174-178`,
`300`) — a driver-memory collect. These sinks are its distributed
replacement: executors write partitioned columnar files directly, so
results never funnel through one process.

Scale guidance encoded here:
- parquet + partitionBy(low-cardinality cols) -> partition pruning on
  read; never partition by a high-cardinality key (file explosion).
- bucketBy(key) pre-shuffles ONCE at write; later joins/aggs on that
  key skip their Exchange entirely (asserted in tests/test_sinks.py).
- csv/json exist for interchange, not analytics — row-oriented, no
  pushdown, no stats.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Columnar sink; optional hive-style partition layout.

    ``max_records_per_file`` caps file size at scale (with AQE-coalesced
    writes a single task can otherwise emit a multi-GB file).
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-size files; returns the
    new file count.

    The operational complement of a streaming sink: every micro-batch
    commit leaves one file per (batch, partition), and at 100 TB a
    landing zone degrades into millions of KB-sized files whose
    open/footer overhead dominates scan time. Compaction reads the
    directory once, repartitions to ceil(bytes / target), and swaps
    directories.

    The swap here (write temp dir -> remove old -> rename) is the
    LOCAL-FILESYSTEM shape and is not atomic for concurrent readers;
    on object storage at scale, write to a NEW location and flip the
    catalog/manifest pointer instead — same dataflow, different commit.
    Readers mid-swap are the reason real deployments use table formats
    with snapshot isolation for this.
    """
    total_bytes = sum(
        e.stat().st_size for e in os.scandir(path) if e.name.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    opts = {"header": "true"}
    opts.update(options)
    df.write.mode(mode).options(**opts).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (pre-shuffled) managed table.

    Bucketing pays the shuffle once at write time: every later join or
    aggregation keyed on ``bucket_cols`` reads co-located buckets and
    plans WITHOUT an Exchange — at 100 TB this converts the nightly
    fact⋈fact join from a full-network shuffle into a local zip of
    bucket files. sortBy additionally enables merge-join without sort.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout for min/max data skipping.

    ``repartitionByRange(sort_cols)`` range-partitions the data (one
    sampled range boundary set, one shuffle), then
    ``sortWithinPartitions`` orders rows inside each file WITHOUT any
    global single-partition sort. The result: every file (and every
    row group inside it) covers a narrow, near-disjoint slice of the
    sort key's domain, so parquet footer min/max statistics let a
    point or range predicate skip whole row groups — at 100 TB a
    selective scan touches the few files whose range intersects the
    predicate instead of all of them. This is the single-column
    special case of Z-ordering; asserted real (disjoint file ranges +
    fewer row groups scanned) in tests/test_sinks.py.

    Cluster by what you FILTER by (event date, language, source
    domain), partitionBy what you prune coarsely; the two compose.
    """
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
