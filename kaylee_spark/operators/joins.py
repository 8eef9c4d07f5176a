"""Join operators Spark lacks natively: as-of join and interval/range
join helpers (SURVEY.md §2.3 lists these as absent in both the
reference and stock Spark's high-level API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    latest right_time <= left_time (backward) / earliest >= (forward),
    per `on` key.

    Implementation is the union+window pattern — one shuffle on the
    key, one ordered scan, no range explosion:
      tag rows, union, sort by (key, time, tag), last() over the
      ordered window carries the most recent right row forward.
    Scales as sort-merge, the right strategy when both sides are huge
    (the alternative, key+bucketed range join, multiplies rows).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")

    rcols = [c for c in right.columns if c != on and c != right_time]
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(right.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema["s"].dataType).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("_rrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort before left rows at equal time -> <= semantics
        w = Window.partitionBy("_k").orderBy(F.asc("_t"), F.asc("_is_left")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = F.last(F.col("_rrow"), ignorenulls=True).over(w)
        carried_t = F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True).over(w)
    else:
        w = Window.partitionBy("_k").orderBy(F.desc("_t"), F.asc("_is_left")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = F.last(F.col("_rrow"), ignorenulls=True).over(w)
        carried_t = F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_matched", carried)
        .withColumn("_matched_t", carried_t)
        .filter(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        within = (
            F.abs(F.col("_t").cast("double") - F.col("_matched_t").cast("double")) <= F.lit(tolerance)
            if direction == "backward"
            else F.abs(F.col("_matched_t").cast("double") - F.col("_t").cast("double")) <= F.lit(tolerance)
        )
        out = out.withColumn("_matched", F.when(within, F.col("_matched")))
    flat_left = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    flat_right = [F.col(f"_matched.{c}").alias(c) for c in rcols]
    # expose the matched right-side time too (asof analyses almost
    # always need the gap); null when no match
    matched_time = F.when(F.col("_matched").isNotNull(), F.col("_matched_t")).alias(right_time)
    return out.select(*flat_left, *flat_right, matched_time)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    extra_on=None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Interval join: left rows whose point falls in [right_lo, right_hi].

    Without help Spark plans point-in-interval as BroadcastNestedLoop /
    cartesian. When ``bucket_width`` is given, both sides get bucketed
    so the join becomes an equi-join on bucket id (intervals exploded
    across the buckets they span) + residual filter — turning O(n*m)
    into a co-partitioned hash join. That's the 100 TB path.
    """
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    if extra_on is not None:
        cond = cond & extra_on
    if bucket_width is None:
        return left.join(right, cond)

    lb = left.withColumn("_bucket", F.floor(F.col(left_point).cast("double") / bucket_width).cast("long"))
    span = F.sequence(
        F.floor(F.col(right_lo).cast("double") / bucket_width).cast("long"),
        F.floor(F.col(right_hi).cast("double") / bucket_width).cast("long"),
    )
    rb = right.withColumn("_bucket", F.explode(span))
    return lb.join(rb, (lb["_bucket"] == rb["_bucket"]) & cond).drop("_bucket")
