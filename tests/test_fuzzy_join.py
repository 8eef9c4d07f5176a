"""fuzzy_join: exactness vs brute force, short-string path, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaylee_spark.operators.joins import fuzzy_join


def _pairs(df):
    return {(r["lid"], r["rid"], r["edit_distance"]) for r in df.collect()}


def test_fuzzy_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "customer#0001"), (2, "customer#0xx2")], ["lid", "lname"]
    )
    right = spark.createDataFrame(
        [(10, "customer#0001"), (11, "customer#0002")], ["rid", "rname"]
    )
    out = fuzzy_join(left, right, "lname", "rname", max_dist=1)
    assert _pairs(out) == {(1, 10, 0), (1, 11, 1)}  # lid 2 is 2 edits from both


def test_fuzzy_join_short_strings_no_shared_gram(spark):
    """'abc' vs 'abd' share no 3-gram — only the shorts path can find
    them; losing it silently breaks exactness."""
    left = spark.createDataFrame([(1, "abc"), (2, "xy")], ["lid", "ls"])
    right = spark.createDataFrame([(10, "abd"), (11, "xz"), (12, "abcdef")], ["rid", "rs"])
    out = fuzzy_join(left, right, "ls", "rs", max_dist=1)
    assert _pairs(out) == {(1, 10, 1), (2, 11, 1)}


def test_fuzzy_join_matches_brute_force(spark):
    """Oracle-style exactness on a mixed-length corpus: the q-gram +
    shorts decomposition must equal the cross-join ground truth."""
    words = [
        "spark", "spill", "spine", "sp", "s", "",
        "shuffle", "shufle", "shuffled", "scan", "scam", "scanner",
        "partition", "partitions", "petition", "join", "jon", "joint",
    ]
    left = spark.createDataFrame([(i, w) for i, w in enumerate(words)], ["lid", "lw"])
    right = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(words)], ["rid", "rw"]
    )
    for d in (1, 2):
        got = _pairs(fuzzy_join(left, right, "lw", "rw", max_dist=d))
        truth = {
            (r["lid"], r["rid"], r["d"])
            for r in left.crossJoin(right)
            .withColumn("d", F.levenshtein("lw", "rw"))
            .filter(F.col("d") <= d)
            .collect()
        }
        assert got == truth, f"mismatch at max_dist={d}"


def test_fuzzy_join_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="share column names"):
        fuzzy_join(df, df, "name", "name")
