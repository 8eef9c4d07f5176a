"""dq_report rule semantics: planted violations, null exemptions."""

from __future__ import annotations

import pytest

from kaylee_spark.operators.dq import dq_report


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, 100),
            (2, "a", -5.0, 100),   # range violation
            (2, "b", 20.0, None),  # duplicate id; null fk exempt
            (None, "zz", 999.0, 7),  # null id; bad tag; range; orphan fk
        ],
        ["id", "tag", "score", "ref_id"],
    )


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(100,)], ["rid"])


def test_rule_counts(spark, tbl, ref):
    got = {
        r["rule"]: r["n_violations"]
        for r in dq_report(
            tbl,
            not_null=["id"],
            unique=[["id"]],
            ranges={"score": (0.0, 100.0)},
            accepted={"tag": ["a", "b"]},
            fk=[("ref_id", ref, "rid")],
        ).collect()
    }
    assert got == {
        "not_null:id": 1,
        "unique:id": 1,        # id=2 twice -> one surplus row; null id exempt
        "range:score": 2,      # -5 and 999
        "accepted:tag": 1,     # 'zz'
        "fk:ref_id->rid": 1,   # 7; the null ref_id is exempt
    }


def test_composite_unique_ignores_null_keys(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (None, "x"), (None, "x")],
        ["a", "b"],
    )
    got = {r["rule"]: r["n_violations"] for r in dq_report(df, unique=[["a", "b"]]).collect()}
    # (1,x) twice -> 1 surplus; null-keyed rows exempt entirely
    assert got == {"unique:a,b": 1}


def test_zero_violations_still_reported(spark, ref):
    df = ref.selectExpr("rid AS id")
    got = dq_report(df, not_null=["id"], unique=[["id"]]).collect()
    assert {r["rule"]: r["n_violations"] for r in got} == {"not_null:id": 0, "unique:id": 0}


def test_scan_rules_fuse_into_one_pass(spark, tbl):
    out = dq_report(
        tbl,
        not_null=["id"],
        unique=[["id"]],
        ranges={"score": (0.0, 100.0)},
        accepted={"tag": ["a", "b"]},
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") + plan.count("LocalRelation") == 1


def test_no_rules_raises(spark, tbl):
    with pytest.raises(ValueError, match="no rules"):
        dq_report(tbl)
