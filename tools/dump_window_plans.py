"""Dump .explain("formatted") for every driver-window query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence
files. Streaming queries (true readStream drains) cannot be explained
without running; for those we record the batch twin of their source
plan when cheap, else a SKIP marker.

Usage: python tools/dump_window_plans.py <outdir> <suffix> [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaylee_spark.queries import load_all  # noqa: E402
from kaylee_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)
    registry = load_all()
    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    todo = names or sorted(registry)
    for name in todo:
        spec = registry[name]
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:
            plan = f"SKIP: {type(exc).__name__}: {exc}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
