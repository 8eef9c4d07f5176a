"""Declarative data-quality rule suite: one report frame per table.

The reference trusts its input bytes completely (the mmap scan,
`/root/reference/example.py:15-20`, has no notion of a bad record);
at 100 TB every ingest runs a constraint pass BEFORE the expensive
operators — a silent null key or orphaned foreign key poisons every
join downstream of it.

Rule families and their plan shapes:

- ``not_null`` / ``ranges`` / ``accepted`` / ``unique`` all fuse into
  ONE full-scan aggregate: the null/range/membership checks are
  conditional sums and the uniqueness check is
  ``COUNT(*) - COUNT(DISTINCT key)`` — Catalyst evaluates every rule
  in a single pass over the table (distinct keys ride the same
  Expand+aggregate the profiler uses).
- each ``fk`` (referential integrity) is one LEFT ANTI join against
  the referenced key column — ids-only on both sides, and the parent
  key set is typically dimension-sized, so the anti join broadcasts.

Output: (rule string, n_violations long) — one row per rule,
zero-violation rows included (absence of a rule row would be
indistinguishable from "never checked").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list] | None = None,
    fk: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate the rule set against ``df``.

    ``ranges`` bounds are inclusive; a null value violates neither a
    range nor an accepted-values rule (nullability is ``not_null``'s
    job — one defect, one rule). Null foreign keys are likewise not
    orphans. ``unique`` entries are composite key column lists.
    """
    aggs: list = []
    labels: list[str] = []

    def add(label: str, violation_count) -> None:
        labels.append(label)
        aggs.append(violation_count.alias(f"__v{len(labels)}"))

    for c in not_null or []:
        add(f"not_null:{c}", F.sum(F.col(c).isNull().cast("long")))
    for c, (lo, hi) in (ranges or {}).items():
        bad = (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
        add(f"range:{c}", F.sum(F.coalesce(bad.cast("long"), F.lit(0))))
    for c, vals in (accepted or {}).items():
        bad = ~F.col(c).isin(*vals)
        add(f"accepted:{c}", F.sum(F.coalesce(bad.cast("long"), F.lit(0))))
    for key in unique or []:
        # duplicate rows = rows beyond the first of each key; rows with
        # any null key column are exempt (SQL UNIQUE semantics)
        nn = F.lit(True)
        for c in key:
            nn = nn & F.col(c).isNotNull()
        n_keyed = F.sum(nn.cast("long"))
        n_keys = F.count_distinct(*[F.when(nn, F.col(c)) for c in key]) if len(key) > 1 else F.count_distinct(F.when(nn, F.col(key[0])))
        add(f"unique:{','.join(key)}", n_keyed - n_keys)

    parts: list[DataFrame] = []
    if aggs:
        one = df.agg(*aggs)
        entries = F.array(
            *[
                F.struct(
                    F.lit(label).alias("rule"),
                    F.col(f"__v{i + 1}").cast("long").alias("n_violations"),
                )
                for i, label in enumerate(labels)
            ]
        )
        parts.append(one.select(F.explode(entries).alias("r")).select("r.*"))

    for col, ref, ref_col in fk or []:
        orphans = (
            df.select(col)
            .filter(F.col(col).isNotNull())
            .join(F.broadcast(ref.select(F.col(ref_col).alias(col)).distinct()), col, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(f"fk:{col}->{ref_col}").alias("rule"), "n_violations")
        )
        parts.append(orphans)

    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
