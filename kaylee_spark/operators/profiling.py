"""One-pass dataset profiling: per-column completeness/cardinality/range.

The reference has no introspection surface at all (its only "schema"
is whatever tuples the user mapfn emits, `/root/reference/kaylee/
client.py:190-202`); at 100 TB a profile pass is how a pipeline
decides anything at all about an unfamiliar corpus drop — null-rate
gates, join-key cardinality sanity, range checks before bucketing.

Shape: ONE scan. All per-column aggregates land in a single ``agg``
call so Catalyst fuses them into one pass; the long-format output is a
row-local explode of the single aggregate row (cardinality = #columns,
i.e. nothing). Exact distinct counts compile to one Expand +
hash-aggregate plan — the scan is still read once, but the aggregate
input is multiplied by #profiled columns; ``exact_distinct=False``
swaps in approx_count_distinct (HLL, no Expand) which is the right
call for a wide 100 TB table where ±2% cardinality is plenty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtypes whose min/max are emitted (cast to double — exact for the
#: fixture's int64/double columns; strings/timestamps profile null/
#: distinct only, since their renderings are engine-specific).
_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per column.

    Output schema: (col_name string, n_rows long, n_nulls long,
    n_distinct long, min_value double, max_value double) —
    min/max null for non-numeric columns. (``col_name`` rather than
    ``column`` so SQL twins never need reserved-word quoting.)
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        if dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal"):
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__mx_{c}"))
    one = df.agg(*aggs)

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("p")).select("p.*")


def equidepth_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_buckets: int = 10,
) -> DataFrame:
    """Per-group equi-depth histogram: bucket boundaries are the exact
    interpolated 1/n..(n-1)/n percentiles, rows assigned by pure
    comparison arithmetic. Output: (group, bucket 1..n, n_rows,
    min_value, max_value).

    Unlike an NTILE window — which is a GLOBAL SORT per group, the
    single-partition funnel that dies first at scale — this computes
    one holistic boundary aggregate (|groups| rows, broadcast back)
    and assigns each row with ``1 + Σ (v > boundary_i)`` in codegen:
    one scan, one tiny agg, no sort, no shuffle of the data. Depth is
    equal up to boundary ties (rows equal to a boundary stay in the
    lower bucket), which is what a skew report needs; boundaries round
    to 6dp so the cut lines are engine-exact.
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    from pyspark.sql.functions import broadcast

    bounds = df.groupBy(group_col).agg(
        F.transform(
            F.expr(f"percentile({value_col}, array({', '.join(map(str, fracs))}))"),
            lambda x: F.round(x, 6),
        ).alias("__bounds")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (F.col(value_col) > F.col("__bounds")[i]).cast("int")
    return (
        df.join(broadcast(bounds), group_col)
        .withColumn("bucket", bucket)
        .groupBy(group_col, "bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
