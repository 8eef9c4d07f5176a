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


def salt_expr(n_salts: int, salt_on: list[str] | str | None = None):
    """The salt-assignment column used by salted_join (see its
    docstring for the determinism trade-off between the two forms)."""
    if salt_on is not None:
        salt_cols = [salt_on] if isinstance(salt_on, str) else list(salt_on)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
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

    Salt assignment:
    - ``salt_on=None`` (default): physical row position
      (monotonically_increasing_id) — cheap, uniform, independent of
      the key distribution, but NOT stable under task retry or
      recompute (the id depends on partition layout). Result SETS are
      identical either way; only which salt a row landed on differs.
    - ``salt_on=[cols]``: ``pmod(xxhash64(salt_on...), n_salts)`` — a
      pure function of row content, so retries and recomputes assign
      identical salts (required when the join feeds a nondeterminism-
      sensitive sink or a checkpointed incremental job). Pass columns
      that DISTINGUISH rows sharing a hot join key (e.g. the row's
      primary key): hashing the join key alone would re-concentrate
      each hot key onto one salt — exactly the failure being fixed.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports inner/left/left_semi/left_anti, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
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
    broadcast, TakeOrderedAndProject for the top-N. Null keys count
    as a key value (they are the most common hot key in the wild).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    w = Window.orderBy(F.desc("n_rows"), *[F.asc_nulls_first(k) for k in keys])
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "pct_of_total",
            F.round((F.col("n_rows") / F.col("__total")).cast("double"), 6),
        )
        .withColumn("key_rank", F.row_number().over(w))
        .filter(F.col("key_rank") <= top_n)
        .drop("__total")
    )
