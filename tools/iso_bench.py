"""Isolated bench for a subset of registry queries — bench.py's exact
methodology (sf0.001 warmup, min of N cold-cache passes into the noop
sink, process stores cleared per pass) without paying for the other
49 queries. For A/B measurements during optimization rounds; the
committed BENCH numbers still come from bench.py.

Usage: python tools/iso_bench.py <query> [query ...] [--passes N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaylee_spark.queries import clear_process_stores, load_everything  # noqa: E402
from kaylee_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    passes, sf_dir, names = 5, "/root/testdata/sf0.1", []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    registry = load_everything()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("iso_bench")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        registry[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _p in range(passes):
        spark.catalog.clearCache()
        clear_process_stores()
        for name in sorted(names):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
    out = {n: {"min": min(s), "all": s} for n, s in samples.items()}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
