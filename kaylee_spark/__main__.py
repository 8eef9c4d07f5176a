"""CLI entry point: run a user MapReduce job module on Spark.

    python -m kaylee_spark path/to/job.py [--cpus N] [--verbose]

The reference ships this entry point UNFINISHED — its server CLI
parses ``path`` and constructs the server but the module-loading lines
are commented out (reference server.py:335-353; SURVEY.md §3.3). This
completes the intended contract: ``path`` is a Python module defining
the reference's job surface —

    datafn    () -> iterable of (key, value)        [required]
    mapfn     (key, value) -> iterable of (k2, v2)  [required]
    reducefn  (key, values_iterator) -> result      [required]
    combiner  (a, b) -> merged                      [optional: enables
                                                     map-side combine]
    num_partitions / partition_fn                   [optional]

— and the results dict prints to stdout as one JSON object with
sorted keys (deterministic byte output for shell pipelines).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys


def load_job_module(path: str):
    spec = importlib.util.spec_from_file_location("kaylee_user_job", path)
    if spec is None or spec.loader is None:
        raise SystemExit(f"cannot load job module: {path}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for required in ("datafn", "mapfn", "reducefn"):
        if not callable(getattr(mod, required, None)):
            raise SystemExit(f"job module must define callable {required!r}: {path}")
    return mod


def run_job(mod, spark=None) -> dict:
    from kaylee_spark.core.mapreduce import MapReduceJob
    from kaylee_spark.session import get_spark

    spark = spark or get_spark("kaylee_cli")
    job = MapReduceJob(
        spark,
        datafn=mod.datafn,
        mapfn=mod.mapfn,
        reducefn=mod.reducefn,
        combiner=getattr(mod, "combiner", None),
        num_partitions=getattr(mod, "num_partitions", None),
        partition_fn=getattr(mod, "partition_fn", None),
    )
    return job.results()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m kaylee_spark",
        description="run a datafn/mapfn/reducefn job module on Spark",
    )
    ap.add_argument("path", help="Python file defining datafn/mapfn/reducefn")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    ap.add_argument("--verbose", action="store_true", help="INFO-level Spark logs")
    args = ap.parse_args(argv)

    from kaylee_spark.session import get_spark

    spark = get_spark("kaylee_cli", cpus=args.cpus) if args.cpus else get_spark("kaylee_cli")
    spark.sparkContext.setLogLevel("INFO" if args.verbose else "ERROR")
    results = run_job(load_job_module(args.path), spark=spark)
    json.dump(results, sys.stdout, sort_keys=True, default=str)
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
