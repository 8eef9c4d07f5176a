"""Skew-mitigation operators.

The reference delegates work placement to ZMQ PUSH/PULL round-robin
(`/root/reference/kaylee/server.py:243-247`) — load balance across
WORKERS, but a hot reduce key still lands on one worker because the
shuffle is keyed (`server.py:212`). The same pathology exists in any
keyed shuffle: at 100 TB one hot join key (null ids, a default value,
a celebrity entity) serializes the whole stage onto one task.

First lines of defense are built-in and preferred: AQE skew-join
splitting (enabled in kaylee_spark.session) and broadcasting the small
side. Salting is for the remaining case — a shuffle join whose build
side is too big to broadcast AND whose skew AQE can't split (e.g. one
key is most of the data, or the join is a left join Spark won't
rewrite). It trades an n_salts-times replication of the *smaller* side
for an n_salts-way split of each hot key's probe rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__kaylee_salt"


#: explicit opt-in sentinel for position-based (retry-unstable) salting.
POSITIONAL = "__positional__"


def salt_expr(n_salts: int, salt_on: list[str] | str | None = None):
    """The salt-assignment column used by salted_join (see its
    docstring for the determinism trade-off between the forms).
    ``salt_on=None`` is invalid here — salted_join resolves the
    default to the probe side's full column list before calling."""
    if salt_on == POSITIONAL:
        return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    if salt_on is None:
        raise ValueError("salt_expr needs explicit columns or POSITIONAL")
    salt_cols = [salt_on] if isinstance(salt_on, str) else list(salt_on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    return salt.cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = 8,
    salt_on: list[str] | str | None = None,
) -> DataFrame:
    """Equi-join with the skewed probe side split n_salts ways.

    ``skewed`` rows get a salt in [0, n_salts); ``other`` is replicated
    once per salt value; the join key becomes (on..., salt), so a hot
    key's rows spread over n_salts reduce tasks instead of one.
    Supported join types: inner / left / left_semi / left_anti (the
    replicated side must be the non-preserved one — a right or full
    join would null-extend each of the n_salts copies).

    Salt assignment — DETERMINISTIC BY DEFAULT (a task retry or stage
    recompute must re-derive identical salts, or a shuffle-file
    regeneration mid-job can duplicate/lose probe rows in downstream
    nondeterminism-sensitive sinks):
    - ``salt_on=None`` (default): ``pmod(xxhash64(ALL probe-side
      columns), n_salts)`` — a pure function of full row content.
      Distinct rows sharing a hot join key spread across salts; only
      byte-identical duplicate rows co-locate (they join identically
      anyway, and their count per key is bounded by the duplicate
      rate, not the key's total fan-in).
    - ``salt_on=[cols]``: same hash over just those columns — pass
      columns that DISTINGUISH rows sharing a hot join key (e.g. the
      row's primary key); cheaper than hashing every column on wide
      rows. Hashing the join key alone would re-concentrate each hot
      key onto one salt — exactly the failure being fixed.
    - ``salt_on=POSITIONAL``: physical row position
      (monotonically_increasing_id) — uniform even over fully
      duplicate rows, but NOT stable under retry/recompute; explicit
      opt-in only.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports inner/left/left_semi/left_anti, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_on is None:
        salt_on = list(skewed.columns)
    salted = skewed.withColumn(_SALT, salt_expr(n_salts, salt_on))
    replicated = other.withColumn(_SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted.join(replicated, keys + [_SALT], how)
    return out.drop(_SALT)


def skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 10,
) -> DataFrame:
    """Join-key skew diagnostic: the top-N hottest key values with
    their share of the table — the "why is one task still running"
    tool, run BEFORE deciding between broadcast, AQE, and salting.

    Output: (key columns…, n_rows, pct_of_total, key_rank) for the
    top_n keys by count, rank 1 = hottest, ties broken by key value
    so the report is deterministic. pct_of_total rounds to 6dp.

    Scale shape: one key-grouped count (map-side partial — the
    combiner absorbs the very skew being measured, so the shuffle
    carries |distinct keys| rows, not the raw table), one 1-row total
    broadcast, then orderBy+limit — TakeOrderedAndProject, a per-
    partition heap merged on the driver, NEVER a global sort. Only
    the top_n surviving rows see the rank window (a single-partition
    sort over top_n rows, not over |distinct keys|). Null keys count
    as a key value (they are the most common hot key in the wild).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.desc("n_rows"), *[F.asc_nulls_first(k) for k in keys]]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    top = counts.orderBy(*order).limit(top_n)
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            "pct_of_total",
            F.round((F.col("n_rows") / F.col("__total")).cast("double"), 6),
        )
        .withColumn("key_rank", F.row_number().over(Window.orderBy(*order)))
        .drop("__total")
    )


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the available cores BEFORE a
    work-amplifying operator (explode/shingle/iterated model scans).

    The local fixtures are single-row-group parquet files, and a
    parquet row group is indivisible: whatever
    ``spark.sql.files.maxPartitionBytes`` says, one task reads ALL the
    rows, so everything up to the first exchange — including a 32-way
    explode or per-document shingling — runs on one core (measured:
    a28's 4.8M-row weight evaluation as a single ~2.5 s straggler in a
    3-task scan stage). Guide §2.5's input-skew remedy is to
    repartition right after the read; doing it before amplification is
    also the scale-correct order (the exchange moves the SMALL
    pre-amplification rows once, instead of letting the amplified work
    pile onto the skewed task).

    Scale-adaptive, not a local constant: if the input already has at
    least defaultParallelism partitions (any real multi-row-group
    table at cluster scale), this is the identity — no extra exchange.
    The explicit partition count (not a REBALANCE hint) matters for
    the tiny-but-CPU-heavy frames this guards: AQE's advisory-size
    coalescing would fold a few-MB input back into one partition and
    re-serialize the amplified work. Round-robin repartition is
    retry-safe (sortBeforeRepartition is on by default) and every
    consumer here is order-insensitive (aggregates/joins), so results
    are bit-identical.

    Input contract: meant for SCAN-LEVEL frames (the shipped call
    sites all pass ``df.select(narrow cols)`` of a source scan). A
    frame whose lineage already contains an exchange is returned
    unchanged WITHOUT probing its width: that exchange already
    distributed the rows (AQE sizes its output by bytes), and probing
    ``.rdd`` on such a frame would eagerly materialize its query
    stages at plan-build time under AQE — the work would then run
    again at action time (ADVICE r14). The exchange check reads the
    pre-AQE physical plan, which the planner computes without running
    any job.
    """
    if "Exchange" in df._jdf.queryExecution().sparkPlan().toString():
        return df
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def pin_width(spark, n_partitions: int | str) -> tuple[str, str]:
    """Enter a pinned-width scope for an iterative droplet loop:
    fix ``spark.sql.shuffle.partitions`` AND switch AQE off, returning
    the previous (partitions, aqe) pair for unpin_width.

    The iterative operators (graph loops, Lloyd trainers, top-k
    rungs) pin their shuffle width to the data's size because a
    batch-tuned width pays near-empty partition commits per step.
    Inside such a scope AQE has nothing left to decide — the width is
    explicit and the per-step frames are node/model-sized — but it
    still replans and resubmits query stages action by action, a pure
    per-action latency tax on loops made of many droplet actions
    (measured: s09_kmeans 3.22 -> 2.57 s with AQE off inside the
    pin). Unpinned (production) calls never reach this path and keep
    AQE's coalescing/skew handling.

    Thread-safety: conf set/restore is SESSION-GLOBAL, not scoped to
    the calling thread — a concurrent query on the same session (e.g.
    a streaming drain on another thread) would lose AQE and run at
    the pinned width mid-flight. Every caller in this engine runs its
    pinned loop single-threaded on the session (the registry executes
    queries sequentially); a multi-threaded deployment must scope the
    override per query (cloned session / SQL hints) instead.
    """
    prev = (
        spark.conf.get("spark.sql.shuffle.partitions"),
        spark.conf.get("spark.sql.adaptive.enabled"),
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return prev


def unpin_width(spark, prev: tuple[str, str]) -> None:
    """Restore the conf pair captured by pin_width."""
    spark.conf.set("spark.sql.shuffle.partitions", prev[0])
    spark.conf.set("spark.sql.adaptive.enabled", prev[1])
