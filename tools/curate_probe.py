"""End-to-end measurement of the composed curation pipeline
(pipelines.curate: quality gate -> exact dedup -> near-dup clustering
-> train/eval split) at sf0.1 and at the persistent ~sf1 synthetic
fixture (VERDICT r10 item 4) — the cost-ladder claim measured as ONE
pipeline, not as its stages individually.

Per scale it reports:
- cumulative stage walls (each stage materialized via count() on a
  fresh lineage, so stage k's wall INCLUDES its predecessors — the
  deltas approximate per-stage cost; the pipeline is deliberately run
  uncached, exactly as shipped);
- rows in / survivors per stage and the reject-reason breakdown
  (quality / exact_dup / near_dup) — the stage-by-stage funnel;
- total end-to-end wall for the full CurationResult (train + eval +
  rejected all materialized).

Usage: python tools/curate_probe.py [--skip-sf1]
Numbers are only meaningful run solo (no concurrent Spark JVM).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaylee_spark.session import get_spark  # noqa: E402
from kaylee_spark.sources import load_table  # noqa: E402

SF1_FIXTURE = "/tmp/kaylee_sf1"


def probe(spark, sf_dir: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from kaylee_spark import pipelines as P
    from kaylee_spark.operators import text as T
    from kaylee_spark.operators.dedup import content_hash, dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    # cumulative stage materializations (fresh lineage each, uncached —
    # the shipped pipeline's own shape)
    t0 = time.perf_counter()
    quality = docs.filter(
        (T.stopword_ratio("text") >= 0.05) & (T.repeated_line_ratio("text") <= 0.3)
    )
    n_quality = quality.count()
    t_quality = time.perf_counter() - t0

    t0 = time.perf_counter()
    w = quality.withColumn("_h", content_hash("text"))
    winners = w.groupBy("_h").agg(F.min("doc_id").alias("_w"))
    exact = w.join(winners, "_h").filter(F.col("doc_id") == F.col("_w"))
    n_exact = exact.count()
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    clusters = dedup_clusters(exact.drop("_h", "_w"), "doc_id", "text", threshold=0.5)
    n_canonical = clusters.filter("is_canonical").count()
    t_near = time.perf_counter() - t0

    # the full composed pipeline, all three outputs materialized
    t0 = time.perf_counter()
    res = P.curate(docs)
    n_train = res.train.count()
    n_eval = res.eval.count()
    reasons = {
        r["reason"]: r["n"]
        for r in res.rejected.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    t_total = time.perf_counter() - t0

    out = {
        "label": label,
        "n_in": n_in,
        "n_quality": n_quality,
        "n_exact_unique": n_exact,
        "n_canonical": n_canonical,
        "n_train": n_train,
        "n_eval": n_eval,
        "rejects": reasons,
        "t_quality_s": round(t_quality, 2),
        "t_plus_exact_s": round(t_exact, 2),
        "t_plus_neardup_s": round(t_near, 2),
        "t_total_s": round(t_total, 2),
    }
    print(
        f"{label}: in={n_in} quality={n_quality} exact={n_exact} "
        f"canonical={n_canonical} train={n_train} eval={n_eval} "
        f"rejects={reasons}"
    )
    print(
        f"{label}: walls quality={out['t_quality_s']}s "
        f"(+exact)={out['t_plus_exact_s']}s (+neardup)={out['t_plus_neardup_s']}s "
        f"TOTAL={out['t_total_s']}s"
    )
    assert n_train + n_eval == n_canonical
    assert n_in == n_quality + reasons.get("quality", 0)
    assert n_quality == n_exact + reasons.get("exact_dup", 0)
    assert n_exact == n_canonical + reasons.get("near_dup", 0)
    return out


def main() -> None:
    spark = get_spark("curate_probe")
    spark.sparkContext.setLogLevel("ERROR")
    r01 = probe(spark, "/root/testdata/sf0.1", "sf0.1")
    if "--skip-sf1" not in sys.argv:
        if not os.path.exists(os.path.join(SF1_FIXTURE, "documents.parquet")):
            print(f"~sf1 fixture missing at {SF1_FIXTURE}; run tools/bench_sf1.py first")
            return
        r1 = probe(spark, SF1_FIXTURE, "~sf1")
        ratio = round(r1["t_total_s"] / max(r01["t_total_s"], 1e-9), 2)
        print(f"end-to-end wall ratio ~sf1 / sf0.1 = {ratio}x on 10x documents")


if __name__ == "__main__":
    main()
