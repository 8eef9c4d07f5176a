"""Hard guarantees for the three rows-only registry queries
(a02/d05/s03 — the ones the driver cannot hash-check because their
values are sketch-valued or hash-seeded): error bounds, completeness,
and soundness against brute-force references."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaylee_spark.queries import load_everything
from kaylee_spark.sources import load_table

REG = load_everything()


def test_a02_sketch_error_bounds(spark, sf_dir):
    """HLL count-distinct within its advertised rsd (5 sigma) and each
    approximate quantile bracketed by exact neighbors around its rank."""
    out = {r["l_returnflag"]: r.asDict() for r in REG["a02_approx_sketches"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r.asDict()
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("n"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for flag, got in out.items():
        ex = exact[flag]
        # HLL++ rsd=0.02 -> 5-sigma relative error bound
        assert abs(got["approx_orders"] - ex["n"]) <= max(5 * 0.02 * ex["n"], 1.0), (flag, got, ex["n"])
        for p in ("p50", "p95", "p99"):
            assert ex["lo"] <= got[p] <= ex["hi"]
            # percentile_approx(accuracy=10000): rank error <= n/accuracy;
            # with group sizes ~2-24k this stays within 1% of the value
            # range of the exact interpolated percentile on this data
            assert abs(got[p] - ex[p]) <= 0.02 * (ex["hi"] - ex["lo"]), (flag, p, got[p], ex[p])


def test_d05_pigeonhole_bucketing_is_complete(spark, sf_dir):
    """The chunk-bucketed SimHash pair set must EQUAL the brute-force
    all-pairs Hamming<=k set computed from the same signatures — the
    pigeonhole guarantee (any pair within k differing bits agrees on
    >=1 of k+1 chunks) has no probabilistic slack, so bucketing may
    lose nothing."""
    from kaylee_spark.operators.dedup import simhash, simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    got = {(r.doc_a, r.doc_b, r.hamming) for r in simhash_pairs(docs, "doc_id", "text", max_hamming=6).collect()}
    sig = simhash(docs, "doc_id", "text")
    a = sig.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sig.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"))
        .filter(F.col("hamming") <= 6)
    )
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    assert got == want


def test_s03_output_sound_and_recall_bounded(spark, sf_dir):
    """Every emitted near-dup pair must appear in the brute-force
    cosine>=threshold set with a matching similarity (soundness is
    absolute — the exact verify stage guarantees it); bucketing may
    only lose recall, quantified here with a floor."""
    from kaylee_spark.functions import cosine

    out = {(r.id_a, r.id_b): r.cosine_sim for r in REG["s03_embedding_neardup"].fn(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    c1 = emb.select(F.col("vec_id").alias("id_a"), dbl.alias("va"))
    c2 = emb.select(F.col("vec_id").alias("id_b"), dbl.alias("vb"))
    exact = {
        (r.id_a, r.id_b): r.cs
        for r in c1.crossJoin(c2)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cs", cosine(F.col("va"), F.col("vb")).cast("double"))
        .filter(F.col("cs") >= 0.4)
        .collect()
    }
    assert set(out) <= set(exact)
    for pair, cs in out.items():
        assert abs(cs - exact[pair]) < 1e-9
    assert len(out) >= 0.3 * len(exact), (len(out), len(exact))
