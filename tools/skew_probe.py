"""Skew-mitigation measurement: a planted hot join key at x1/x10,
three strategies timed head-to-head — the evidence behind
docs/SCALE.md's "LSH bucket skew / hot join key" rows, which until
round 8 cited the AQE dial untested.

Strategies over the same forced-shuffle equi-join (broadcast disabled,
so the planner cannot dodge the skew):

- naive:  plain sort-merge join, AQE skew splitting OFF — the hot
          key's entire probe side lands on ONE reduce task.
- aqe:    AQE skew-join ON (thresholds scaled down proportionally to
          the probe data; at 100 TB the 256 MB default engages
          unaided) — the runtime splits the oversized partition and
          replicates the matching build rows.
- salted: operators/skew.salted_join n_salts=8 — the probe side is
          pre-split by a content hash, the build side replicated 8x;
          works where AQE can't rewrite (see the module docstring).

Each (strategy, scale) runs in its OWN subprocess/JVM so JIT state
and the UI's task metrics are attributable; wall is end-to-end into a
noop sink, max_task is the longest task across the job's stages (the
straggler the strategies exist to kill), read from the Spark UI REST
API. Results print as a table to paste into BASELINE.md.

The planted shape: fact(id key payload) with HOT_SHARE of all rows on
key 0 and the rest uniform over 100k keys; dim = 200k distinct keys
with payloads. At x1 the fact is 2M rows; x10 is 20M.

Usage: python tools/skew_probe.py            # full matrix, ~4 min
       python tools/skew_probe.py --run naive 1   # one cell (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_FACT_ROWS = 2_000_000
DIM_ROWS = 200_000
N_KEYS = 100_000
HOT_SHARE = 2  # every 2nd fact row -> key 0 (50% of the table)
UI_PORT = 4049


def build_frames(spark, mult: int):
    from pyspark.sql import functions as F

    fact = (
        spark.range(BASE_FACT_ROWS * mult)
        .select(
            F.when(F.col("id") % HOT_SHARE == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .cast("long")
            .alias("k"),
            F.concat(F.lit("p" * 48), F.col("id").cast("string")).alias("payload"),
        )
    )
    dim = spark.range(DIM_ROWS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d" * 24), F.col("id").cast("string")).alias("dim_payload"),
    )
    return fact, dim


def max_task_ms() -> int:
    """Longest single task duration across all stages of this app —
    the straggler metric. Reads the local UI REST API."""
    apps = json.loads(
        urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/applications").read()
    )
    app_id = apps[0]["id"]
    stages = json.loads(
        urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
        ).read()
    )
    worst = 0
    for st in stages:
        url = (
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages/"
            f"{st['stageId']}/{st['attemptId']}/taskSummary?quantiles=1.0"
        )
        try:
            summ = json.loads(urllib.request.urlopen(url).read())
            worst = max(worst, int(summ["duration"][0]))
        except Exception:
            continue  # tiny stages may lack task summaries
    return worst


def run_cell(strategy: str, mult: int) -> None:
    from pyspark.sql import SparkSession

    from kaylee_spark.operators.skew import salted_join

    b = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.shuffle.partitions", "32")
        # force the shuffle join: the strategies differ only there
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    )
    if strategy == "aqe":
        b = (
            b.config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            # scale the 256MB default down with the probe data so the
            # split engages exactly as it would at 100 TB partitions
            .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
            .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        )
    else:
        b = b.config("spark.sql.adaptive.skewJoin.enabled", "false")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build_frames(spark, mult)
    # materialize inputs once so the timed section is the join alone
    fact.write.format("noop").mode("overwrite").save()
    dim.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    if strategy == "salted":
        out = salted_join(fact, dim, on="k", n_salts=8)
    else:
        out = fact.join(dim, "k")
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(json.dumps({"wall_s": round(wall, 2), "max_task_ms": max_task_ms()}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", nargs=2, metavar=("STRATEGY", "MULT"), default=None)
    args = ap.parse_args()
    if args.run:
        run_cell(args.run[0], int(args.run[1]))
        return

    results: dict[str, dict] = {}
    for mult in (1, 10):
        for strategy in ("naive", "aqe", "salted"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", strategy, str(mult)],
                capture_output=True,
                text=True,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
            try:
                cell = json.loads(line)
            except json.JSONDecodeError:
                cell = {"error": proc.stderr[-500:]}
            results[f"{strategy}_x{mult}"] = cell
            print(f"{strategy:7s} x{mult:<3d} -> {cell}", flush=True)

    print("\n| config | wall x1 | max-task x1 | wall x10 | max-task x10 |")
    print("| --- | --- | --- | --- | --- |")
    for strategy in ("naive", "aqe", "salted"):
        a, b = results[f"{strategy}_x1"], results[f"{strategy}_x10"]
        print(
            f"| {strategy} | {a.get('wall_s', '?')} s | {a.get('max_task_ms', '?')} ms "
            f"| {b.get('wall_s', '?')} s | {b.get('max_task_ms', '?')} ms |"
        )


if __name__ == "__main__":
    main()
