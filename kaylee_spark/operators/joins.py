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


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """Edit-distance join: all (left, right) pairs with
    ``levenshtein(left_col, right_col) <= max_dist``, as an EXACT
    result without a cross join.

    Candidate generation is the classic q-gram count filter: a string
    of length L carries L-q+1 overlapping q-grams and one edit destroys
    at most q of them, so two strings within distance d share at least
    max(L_a, L_b) - q + 1 - q*d grams — at least one whenever the
    LONGER string has length >= q*(d+1). Pairs where both strings are
    shorter than that bound can share no gram, so they route through a
    broadcast length-banded cross join of the two SHORT subsets (a
    bounded, tiny set: strings under q*(d+1) chars). Everything else is
    caught by the gram bucket join, deduped as bare id-free pairs, and
    verified with the built-in threshold levenshtein (early-exit codegen,
    `levenshtein(l, r, d)` returns -1 past d).

    Scale shape: the dominant exchange is the gram-bucket self-join on
    8-byte xxhash64(gram) keys; the length band |len_a - len_b| <= d is
    applied INSIDE the bucket join before the distinct, and the
    distinct dedupes pairs before any levenshtein runs — verify cost is
    per candidate pair, index cost is sum of squared gram-bucket sizes
    (cap hot grams upstream if the domain has boilerplate, same
    argument as jaccard_pairs' max_df).

    Both inputs must share no column names; output = left columns +
    right columns + ``edit_distance`` (int, <= max_dist).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right share column names: {sorted(overlap)}")
    short_len = q * (max_dist + 1)

    def grams(df: DataFrame, col: str, out: str):
        g = F.expr(
            f"explode(array_distinct(transform("
            f"sequence(1, greatest(length({col}) - {q - 1}, 1)),"
            f" i -> xxhash64(substr({col}, i, {q})))))"
        )
        return df.filter(F.length(F.col(col)) >= q).select("*", g.alias(out))

    lg = grams(left, left_col, "_lg")
    rg = grams(right, right_col, "_rg")
    band = (
        F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col))) <= max_dist
    )
    # exclude both-short pairs here: they are the shorts path's job
    not_both_short = (F.length(F.col(left_col)) >= short_len) | (
        F.length(F.col(right_col)) >= short_len
    )
    gram_cands = (
        lg.join(rg, lg["_lg"] == rg["_rg"])
        .filter(band & not_both_short)
        .drop("_lg", "_rg")
        .distinct()
    )

    shorts = (
        left.filter(F.length(F.col(left_col)) < short_len)
        .crossJoin(F.broadcast(right.filter(F.length(F.col(right_col)) < short_len)))
        .filter(band)
    )

    dist = F.levenshtein(F.col(left_col), F.col(right_col), max_dist)
    return (
        gram_cands.unionByName(shorts)
        .withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select(*left.columns, *right.columns, "edit_distance")
    )
