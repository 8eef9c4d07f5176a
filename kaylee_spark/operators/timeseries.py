"""Time-series helpers: regular-grid resampling and forward fill.

Event tables are irregular; models and dashboards want regular grids
with explicit gaps. Spark has window() bucketing but nothing that
DENSIFIES — empty buckets simply don't exist in a groupBy result.
These operators close that gap declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    step: str,
    aggs: dict[str, Column],
    key_cols: list[str] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Aggregate onto a regular time grid, materializing EMPTY buckets.

    ``step`` is an INTERVAL literal body (e.g. ``'15 minutes'``);
    ``aggs`` maps output column -> aggregate expression; ``fill`` maps
    output column -> value for empty buckets (unfilled columns stay
    null). With ``key_cols``, every key gets the FULL global grid
    (dense cross of keys x buckets), which is what plotting/feature
    pipelines expect.

    Scale shape: the heavy input collapses to one bucket-grained
    aggregate FIRST (map-side partial, one shuffle); the grid is
    sequence()+explode of ONE min/max row cross-joined with the
    distinct keys — grid size is buckets x keys regardless of input
    rows, so the densify join is grid-sized, not data-sized. The grid
    side is broadcast when small (always, relative to the input).
    """
    key_cols = key_cols or []
    # epoch-aligned bucket via PURE timestamp arithmetic — never
    # unix_timestamp, which interprets TIMESTAMP_NTZ in the session
    # timezone and would shift bucket edges on non-UTC drivers
    step_sec = (
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" TIMESTAMP_NTZ '1970-01-01 00:00:00' + INTERVAL {step})"
    )
    bucket = F.expr(
        "timestampadd(SECOND, CAST(floor(timestampdiff(SECOND,"
        f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col}) / {step_sec})"
        f" * {step_sec} AS BIGINT), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias("bucket")
    agged = df.groupBy(*key_cols, bucket).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )

    bounds = df.select(F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi"))
    grid = bounds.select(
        F.explode(F.expr(f"sequence(_lo, _hi, INTERVAL {step})")).alias("bucket")
    )
    if key_cols:
        grid = df.select(*key_cols).distinct().crossJoin(grid)

    out = grid.join(agged, [*key_cols, "bucket"], "left")
    for name, value in (fill or {}).items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(value)))
    return out


def forward_fill(
    df: DataFrame,
    value_cols: list[str] | str,
    ts_col: str,
    key_cols: list[str] | str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key forward fill (last observation carried forward): nulls
    in ``value_cols`` take the most recent non-null value at or before
    the row's time within its key.

    One window per key ordered by (ts, tiebreaks) — a single shuffle
    keyed on ``key_cols``, rows stay ordered once per fill regardless
    of how many columns fill. Leading nulls (no prior observation)
    stay null.
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.asc(ts_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
