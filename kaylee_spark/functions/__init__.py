"""Scalar/aggregate function helpers shared by operators and queries.

The reference has no function library at all (SURVEY.md §2.3 — the only
scalar op in the whole repo is ``str.split`` inside the user mapfn,
`/root/reference/example.py:24`); this module is the engine's function
surface. Everything here compiles to built-in Catalyst expressions —
JVM-side, whole-stage-codegen'd, never row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic aggregates over doubles.
#
# Floating-point SUM is order-dependent; Spark's partial-aggregate merge
# order varies run to run, so a raw double SUM cannot hash-match any
# oracle bit-for-bit. Accumulating in DECIMAL is exact and associative,
# so the same trick on both engines yields identical doubles. The
# DECIMAL(24,6) narrowing is part of the query SEMANTICS (both sides do
# it). Scale 6 matters: the fixture money columns carry exactly 2
# decimals, so products of two/three of them carry <= 6 — at scale 6
# the cast is exact (tie-free), whereas at scale 2 products land
# exactly on .005 boundaries and Spark (rounds the shortest decimal
# repr, BigDecimal.valueOf) disagrees with DuckDB (rounds the exact
# binary value) by one cent.
# ---------------------------------------------------------------------------

_DEC = "decimal(24,6)"


def dec(col) -> Column:
    """Column cast to the engine's exact money type."""
    return F.col(col).cast(_DEC) if isinstance(col, str) else col.cast(_DEC)


def dec_sum(col) -> Column:
    """Order-independent SUM over a double column, returned as double.

    The sum is ROUNDED TO CENTS (scale 2) while still exact decimal,
    BEFORE the double cast: once a scale-6 sum exceeds ~2^33 its 1e-6
    quantum is finer than double ulp spacing and the decimal->double
    conversion may legitimately differ by one ulp between engines
    (Spark's single BigDecimal conversion vs DuckDB's int128/10^k
    float path) — caught at sf0.1/sf1-synthetic in round 5. At scale 2
    the quantum stays coarser than ulp spacing up to ~10^13, so the
    conversion is bit-identical through any realistic money sum.
    """
    return F.round(F.sum(dec(col)), 2).cast("double")


def dec_avg(col) -> Column:
    """Order-independent AVG: cent-rounded exact decimal sum / count,
    in doubles (lockstep with oracle_dec_avg)."""
    return (F.round(F.sum(dec(col)), 2).cast("double") / F.count(dec(col))).cast("double")


def oracle_dec_sum(expr: str) -> str:
    """DuckDB SQL equivalent of dec_sum (keep in lockstep with dec_sum)."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(24,6))), 2) AS DOUBLE)"


def oracle_dec_avg(expr: str) -> str:
    return (
        f"CAST(CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(24,6))), 2) AS DOUBLE)"
        f" / COUNT(CAST(({expr}) AS DECIMAL(24,6))) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# Vector math over array<float>/array<double> columns — built-in
# higher-order functions (JVM-side), used by the similarity operators.
# At 100 TB these run inside whole-stage codegen; the pandas-UDF variant
# in operators/similarity.py exists only as an alternative batch path.
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (sequential fold — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product unrolled over a KNOWN dimension.

    MEASURED SLOWER THAN ``dot`` IN THE HOT PATHS — kept for the
    record, not used by the similarity operators. The original theory
    (unrolling keeps the dot inside whole-stage codegen while HOFs
    interpret) does not survive contact with the actual stages: the
    verify stage already carries HOF nodes (the ``transform``
    normalization), whole-stage codegen falls back for the stage
    either way, and then the unrolled form is a ~127-node interpreted
    expression tree per row while ``aggregate``'s fold is a tight
    per-element loop. On 310k candidate pairs at dim=64 (sf0.1 s03):
    unrolled ~7.2 s, 4x16-chunked ~7.3 s, HOF fold ~2.0 s — and the
    two are bit-identical (same left-to-right association; verified
    over all 124,750 sf0.01 pairs). Profile before unrolling.

    Pass column NAMES when possible: the name form builds the unrolled
    expression as one parsed SQL string (a single py4j round trip,
    ~5 ms) instead of ~5*dim Column-operator calls (~2 s of driver time
    at dim=64, measured). SQL ``+``/``*`` parse left-associative, so
    both forms evaluate in the identical order. Name form assumes
    array<double> inputs (all vector columns in this engine are —
    normalized/cast once at scan)."""
    from pyspark.sql import functions as F

    if isinstance(a, str) and isinstance(b, str):
        return F.expr(" + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim)))
    out = a[0].cast("double") * b[0].cast("double")
    for i in range(1, dim):
        out = out + a[i].cast("double") * b[i].cast("double")
    return out



def literal_frame(spark, rows, schema_ddl: str) -> DataFrame:
    """Droplet-sized driver-local rows as a DataFrame WITHOUT the
    Python-worker scan that ``spark.createDataFrame(list)`` plans.

    createDataFrame over a local list becomes a pickled-row RDD whose
    every action launches defaultParallelism Python worker tasks —
    measured ~8.6 s of executor time per bench pass for s14's 320-row
    PQ lookup table on local[32] (guide §4: every Python path pays the
    JVM<->Python boundary; a model/plan frame does not need one). Here
    each COLUMN becomes one array literal (a single py4j transfer) and
    a 1-partition ``spark.range`` indexes into it — pure JVM codegen,
    no Python workers, no SQL-text escaping concerns. Values must be
    plain Python scalars Spark can fold to literals (int/float/str/
    bool/None/datetime). Intended for model state and plan tables
    (<= a few thousand rows); big frames belong in real sources.
    """
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(schema_ddl)
    rows = [tuple(r) for r in rows]
    if not rows:
        return spark.createDataFrame([], schema)
    idx = F.col("id").cast("int")
    cols = []
    for j, f in enumerate(schema.fields):
        vals = [r[j] for r in rows]
        if all(v is None for v in vals):
            # an all-NULL column gives lit() no element type to infer
            col = F.lit(None)
        else:
            col = F.get(F.lit(vals), idx)
        cols.append(col.cast(f.dataType).alias(f.name))
    return spark.range(0, len(rows), 1, 1).select(*cols)
