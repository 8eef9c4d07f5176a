"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes end-to-end into a noop sink (full plan runs, no
collect/serialization overhead measured). The first query's time
includes JVM/codegen warmup; a tiny warmup query runs first to keep
that out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kaylee_spark.queries import load_all  # noqa: E402
from kaylee_spark.session import get_spark  # noqa: E402
from kaylee_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    spark = get_spark("kaylee_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table + spin up codegen/shuffle machinery
    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).limit(1).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in sorted(registry.items()):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
