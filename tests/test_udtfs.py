"""Python UDTF surface: lateral emission semantics + codegen-twin parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaylee_spark.functions.udtfs import CharNgrams, TokenizePos, register_udtfs


def test_tokenize_pos_basic(spark):
    rows = TokenizePos(F.lit("a bb  ccc")).collect()
    assert [(r.pos, r.token, r.n_chars) for r in rows] == [
        (0, "a", 1),
        (1, "bb", 2),
        (2, "ccc", 3),
    ]


def test_tokenize_pos_null_and_empty(spark):
    # null text and all-separator text both emit nothing
    df = spark.createDataFrame([(1, None), (2, "   ")], ["id", "text"])
    df.createOrReplaceTempView("udtf_null_t")
    register_udtfs(spark)
    out = spark.sql(
        "SELECT id, t.pos FROM udtf_null_t, LATERAL tokenize_pos(text) t"
    ).collect()
    assert out == []


def test_tokenize_pos_matches_codegen_twin(spark):
    """The UDTF must agree with the JVM-side posexplode(split()) twin
    that hot paths use instead (functions/udtfs.py module doc)."""
    df = spark.createDataFrame(
        [(1, "the quick  brown"), (2, "x"), (3, "")], ["id", "text"]
    )
    df.createOrReplaceTempView("udtf_twin_t")
    register_udtfs(spark)
    via_udtf = spark.sql(
        "SELECT id, t.pos, t.token FROM udtf_twin_t, LATERAL tokenize_pos(text) t"
    )
    via_builtin = (
        df.select(
            "id",
            F.posexplode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "pos", "token"
            ),
        )
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_builtin.collect())
    )


def test_char_ngrams(spark):
    rows = CharNgrams(F.lit("abcd"), F.lit(2)).collect()
    assert [(r.pos, r.gram) for r in rows] == [(0, "ab"), (1, "bc"), (2, "cd")]
    # n larger than the text -> single truncated gram at pos 0
    short = CharNgrams(F.lit("ab"), F.lit(5)).collect()
    assert [(r.pos, r.gram) for r in short] == [(0, "ab")]


def test_explode_typed_records_polymorphic_schema(spark):
    """The SAME registration plans different output schemas from the
    constant spec argument (analyze-time polymorphism): column names,
    types, missing-key NULLs, and the tolerant malformed-JSON drop."""
    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, '{"a": 7, "b": "x", "c": 1.5, "d": true}'),
            (2, '{"a": 8}'),
            (3, "not json at all"),
            (4, None),
            (5, "[1, 2, 3]"),  # valid JSON but not an object -> dropped
        ],
        "id long, js string",
    ).createOrReplaceTempView("poly_t")
    out = spark.sql(
        "SELECT v.id, t.* FROM poly_t v, "
        "LATERAL explode_typed_records('a:bigint,b:string,c:double,d:boolean', v.js) t"
    )
    assert out.schema.simpleString() == (
        "struct<id:bigint,a:bigint,b:string,c:double,d:boolean>"
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 7, "x", 1.5, True), (2, 8, None, None, None)]
    # a different spec from the SAME registration -> different schema
    out2 = spark.sql(
        "SELECT t.* FROM poly_t v, LATERAL explode_typed_records('b:string', v.js) t"
    )
    assert out2.schema.simpleString() == "struct<b:string>"
    # a bad spec fails at PLANNING (analyze), not mid-job
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="name:type"):
        spark.sql(
            "SELECT t.* FROM poly_t v, LATERAL explode_typed_records('a:blob', v.js) t"
        ).collect()
