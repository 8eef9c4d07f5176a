"""Spark 4 Python DataSource implementing the reference's ``datafn``
contract natively.

sdiehl/kaylee's input side IS a Python generator: the user assigns
``s.datafn`` (example.py:15-20, a generator yielding (key, line)) and
the server pulls one record per scheduler tick on the DRIVER
(server.py:209, ``self.map_iter = self.datafn()``) — single-threaded,
single-split by construction. This module re-expresses that contract
as a registered Spark data source: the generator's domain is cut into
``splits`` real input partitions, each executor materializes only its
own slice, and everything downstream (wordcount, any relational op)
is ordinary DataFrame planning — filter pushdown, column pruning, and
parallel scan included.

The generated records are deterministic integer arithmetic (an LCG
over a fixed 8-word vocabulary), so an external SQL engine can replay
the ENTIRE source from `range()` — the source itself is
oracle-verifiable, not just the query over it.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, EqualTo, InputPartition

#: LCG parameters (minstd) and the fixed vocabulary — shared verbatim
#: with the SQL oracle twin (queries/mapreduce.py m04).
LCG_MULT = 48271
LCG_MOD = 2147483647
VOCAB = ("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel")
WORDS_PER_LINE = 6


def line_for(split: int, pos: int, rows_per_split: int) -> tuple:
    """The deterministic record for (split, pos): key = global row id,
    line = WORDS_PER_LINE vocabulary words walked by the LCG."""
    key = split * rows_per_split + pos
    x = key + 1
    words = []
    for _ in range(WORDS_PER_LINE):
        x = (x * LCG_MULT) % LCG_MOD
        words.append(VOCAB[x % len(VOCAB)])
    return key, " ".join(words)


class _Split(InputPartition):
    def __init__(self, split: int, rows_per_split: int):
        self.split = split
        self.rows_per_split = rows_per_split


class DatafnReader(DataSourceReader):
    def __init__(self, options):
        self.splits = int(options.get("splits", 4))
        self.rows_per_split = int(options.get("rows_per_split", 1000))
        self.split_eq = None

    def partitions(self):
        ids = range(self.splits)
        if self.split_eq is not None:
            ids = [s for s in ids if s == self.split_eq]
        return [_Split(s, self.rows_per_split) for s in ids]

    def read(self, partition):
        s, n = partition.split, partition.rows_per_split
        for pos in range(n):
            key, line = line_for(s, pos, n)
            yield (s, key, line)


class PushdownDatafnReader(DatafnReader):
    """Opt-in pushdown variant (``.option("pushdown", "true")``): a
    ``split = k`` equality prunes the partition list at the source —
    the custom-source analogue of parquet partition pruning. Kept as a
    SEPARATE reader because Spark 4.1 REFUSES any reader that defines
    pushFilters while ``spark.sql.python.filterPushdown.enabled`` is
    false (the default) — the base reader must stay vanilla-session
    safe (the config-independence rule: session configs are never
    load-bearing for the driver-facing path)."""

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("split",) and isinstance(f.value, int):
                self.split_eq = f.value
                # keep Spark evaluating it too (cheap, and the filter
                # remains correct if the pruning contract ever drifts)
                yield f
            else:
                yield f


class DatafnSource(DataSource):
    """``spark.read.format("kaylee_datafn")`` — the datafn generator as
    a first-class partitioned source."""

    @classmethod
    def name(cls):
        return "kaylee_datafn"

    def schema(self):
        return "split int, key bigint, line string"

    def reader(self, schema):
        if str(self.options.get("pushdown", "")).lower() == "true":
            return PushdownDatafnReader(self.options)
        return DatafnReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(DatafnSource)
