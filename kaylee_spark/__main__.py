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


def cmd_list() -> int:
    """Print the query registry: name, tier, first docstring line."""
    from kaylee_spark.queries import load_all, load_everything

    main_names = set(load_all())
    for name, spec in sorted(load_everything().items()):
        tier = "main" if name in main_names else "extra"
        doc = (spec.doc or "").strip().splitlines()
        head = doc[0] if doc else ""
        print(f"{name:28s} {tier:5s} {head}")
    return 0


def cmd_query(args) -> int:
    """Run one registry query against a fixture dir and print rows."""
    from kaylee_spark.queries import load_everything
    from kaylee_spark.session import get_spark

    reg = load_everything()
    if args.name not in reg:
        close = [n for n in sorted(reg) if args.name.split("_")[0] in n]
        hint = f" (did you mean: {', '.join(close[:5])}?)" if close else ""
        raise SystemExit(f"unknown query {args.name!r}{hint} — see `python -m kaylee_spark list`")
    spark = get_spark("kaylee_cli", cpus=args.cpus) if args.cpus else get_spark("kaylee_cli")
    spark.sparkContext.setLogLevel("INFO" if args.verbose else "ERROR")
    df = reg[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    rows = df.limit(args.limit).collect() if args.limit else df.collect()
    for r in rows:
        json.dump(r.asDict(recursive=True), sys.stdout, sort_keys=True, default=str)
        sys.stdout.write("\n")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "list":
        return cmd_list()
    if argv and argv[0] == "query":
        qp = argparse.ArgumentParser(
            prog="python -m kaylee_spark query",
            description="run one registry query against a fixture dir",
        )
        qp.add_argument("name", help="query name (see `python -m kaylee_spark list`)")
        qp.add_argument("--sf-dir", default="/root/testdata/sf0.001", help="fixture directory")
        qp.add_argument("--limit", type=int, default=20, help="max rows to print (0 = all)")
        qp.add_argument("--explain", action="store_true", help="print the physical plan instead of rows")
        qp.add_argument("--cpus", type=int, default=None, help="local[N] cores")
        qp.add_argument("--verbose", action="store_true", help="INFO-level Spark logs")
        return cmd_query(qp.parse_args(argv[1:]))
    ap = argparse.ArgumentParser(
        prog="python -m kaylee_spark",
        description="run a datafn/mapfn/reducefn job module on Spark "
        "(or: `list` / `query NAME` for the registry)",
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
