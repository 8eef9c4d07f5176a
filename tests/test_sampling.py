"""Deterministic sampling operators: reproducibility, disjointness,
fraction accuracy, and partitioning-invariance."""

from __future__ import annotations

from kaylee_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_eval_split,
)
from kaylee_spark.sources import load_table


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_reproducible_and_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(deterministic_sample(docs, "doc_id", 0.3))
    b = _ids(deterministic_sample(docs.repartition(7), "doc_id", 0.3))
    c = _ids(deterministic_sample(docs.coalesce(1), "doc_id", 0.3))
    assert a == b == c and len(a) > 0


def test_sample_fraction_accuracy_and_seed_independence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    kept = len(_ids(deterministic_sample(docs, "doc_id", 0.5, seed=1)))
    # hash uniformity: binomial(n, 0.5) within 5 sigma
    assert abs(kept - 0.5 * n) < 5 * (0.25 * n) ** 0.5
    other = _ids(deterministic_sample(docs, "doc_id", 0.5, seed=2))
    assert other != _ids(deterministic_sample(docs, "doc_id", 0.5, seed=1))


def test_stratified_sample_respects_strata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "doc_id", "lang", {"en": 1.0, "de": 0.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter("lang = 'en'").count()
    assert out.count() == n_en  # fraction 1.0 keeps every en row


def test_train_eval_split_disjoint_exhaustive_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, ev = train_eval_split(docs, "doc_id", eval_fraction=0.2)
    t, e = _ids(train), _ids(ev)
    assert t.isdisjoint(e)
    assert t | e == _ids(docs)
    # stability: same split after reprocessing a subset
    sub = docs.limit(100)
    t2, e2 = train_eval_split(sub, "doc_id", eval_fraction=0.2)
    assert _ids(t2) <= t and _ids(e2) <= e
