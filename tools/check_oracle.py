"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at the
given sf dir, then compares row count, schema shape, and values
(columns sorted by name, rows sorted, exact equality for
ints/strings/timestamps, exact-or-tiny-ulp report for doubles).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
       [--main-only] [--vanilla]

--vanilla runs the queries on a BARE SparkSession (no kaylee_spark
session configs), exactly as the external driver does — the probe
that proves get_spark's tuning is never load-bearing for correctness.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaylee_spark.queries import load_all, load_everything  # noqa: E402
from kaylee_spark.session import get_spark  # noqa: E402
from kaylee_spark.sources import TABLES, table_path  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
            # array columns: normalize list/ndarray cells to tuples so
            # equality is scalar and sortable
            df[c] = df[c].map(lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v) if v is not None else None)
    # normalize all missing flavors (None/NaN/NaT) to None so both
    # engines render and sort identically
    df = df.astype(object).where(pd.notna(df), None)
    # sort on the string rendering (repr is injective enough for
    # identical bit patterns) so None/NaN ordering is engine-agnostic
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class mirroring the driver's dtype-sensitive hash.

    The driver hashes canonicalized cell values, so an int64 500 vs a
    float64 500.0 is a mismatch even though the values are equal
    (round-1 driver failures t01/t07/a14: DuckDB SUM(int) -> HUGEINT
    -> pandas float64 vs Spark bigint). We therefore FAIL on class
    mismatch instead of coercing both sides to float.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    # the driver's canonicalizer sorts the raw frame and crashes with
    # "unhashable type: 'list'" on any array cell (round-1 a02/a10) —
    # replicate that as a hard failure before any comparison
    for frame, side in ((spark_df, "spark"), (duck_df, "duck")):
        for c in frame.columns:
            if frame[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
                problems.append(
                    f"col {c} ({side}): array-typed cells would crash the driver canonicalizer"
                )
    if problems:
        return problems
    s, d = canon(spark_df), canon(duck_df)
    for c in s.columns:
        sv, dv = s[c], d[c]
        s_class = _dtype_class(spark_df[c])
        d_class = _dtype_class(duck_df[c])
        if s_class != d_class:
            problems.append(
                f"col {c}: dtype class mismatch spark={s_class}({spark_df[c].dtype}) "
                f"duck={d_class}({duck_df[c].dtype}) — driver hash would differ"
            )
            continue
        if s_class == "float":
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = sv.isna() & dv.isna()
            neq = ~both_nan & (sv != dv)
            if neq.any():
                idx = neq.idxmax()
                a, b = sv[idx], dv[idx]
                ulps = "inf"
                if not (math.isnan(a) or math.isnan(b)):
                    ulps = abs(a - b)
                problems.append(f"col {c}: {int(neq.sum())} float mismatches, first {a!r} vs {b!r} (absdiff {ulps})")
        else:
            sv = sv.astype(object).where(pd.notna(sv), None)
            dv = dv.astype(object).where(pd.notna(dv), None)
            both_na = sv.isna() & dv.isna()
            neq = ~(both_na | (sv == dv).fillna(False))
            if neq.any():
                idx = neq.idxmax()
                problems.append(f"col {c}: {int(neq.sum())} mismatches, first {sv[idx]!r} vs {dv[idx]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    args = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    main_only = "--main-only" in args
    vanilla = "--vanilla" in args
    only = set(a for a in args if not a.startswith("--"))
    # default: verify the whole surface (driver-facing main registry
    # plus the locally-verified extra tier)
    registry = load_all() if main_only else load_everything()
    extra_names = set() if main_only else set(registry) - set(load_all())
    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("check_oracle_vanilla").getOrCreate()
    else:
        spark = get_spark("check_oracle")
    con = duck_connection(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        tag = " (extra)" if name in extra_names else ""
        name = name + tag
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # operators cache loop invariants / materialization
            # barriers that a lazy result may still reference; once
            # the query is drained to pandas nothing does, and 144
            # queries in one JVM otherwise accumulate storage memory.
            spark.catalog.clearCache()
        if spec.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
