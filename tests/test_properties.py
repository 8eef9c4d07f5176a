"""Property-based tests (hypothesis) for the MapReduce-algebra laws the
reference's README asserts (README.md:20-24): for an associative,
commutative reducer the result is invariant under input order and
partition count. Bounded example counts — every example is a Spark job."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kaylee_spark.core.mapreduce import MapReduceJob

pairs_strategy = st.lists(
    st.tuples(st.sampled_from("abcdef"), st.integers(min_value=-100, max_value=100)),
    min_size=0,
    max_size=30,
)

SPARK_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


def run_job(spark, pairs, **kw) -> dict:
    job = MapReduceJob(
        spark,
        datafn=lambda: iter(pairs),
        mapfn=lambda k, v: [(k, v)],
        reducefn=lambda k, vs: sum(vs),
        **kw,
    )
    return job.results()


@given(pairs=pairs_strategy, n_parts=st.integers(min_value=1, max_value=7))
@SPARK_SETTINGS
def test_result_invariant_under_partitioning_and_order(spark, pairs, n_parts):
    expected = {}
    for k, v in pairs:
        expected[k] = expected.get(k, 0) + v
    assert run_job(spark, pairs, num_partitions=n_parts, combiner=lambda a, b: a + b) == expected
    assert run_job(spark, list(reversed(pairs)), num_partitions=n_parts) == expected


@given(pairs=pairs_strategy)
@SPARK_SETTINGS
def test_holistic_equals_combiner_path_for_associative_reducer(spark, pairs):
    """When the reducer IS associative, declaring the combiner must not
    change the result — only the plan (reduceByKey vs groupByKey)."""
    assert run_job(spark, pairs) == run_job(spark, pairs, combiner=lambda a, b: a + b)


@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=0, max_size=8))
@SPARK_SETTINGS
def test_wordcount_matches_python_counter(spark, texts):
    """DataFrame word count == plain Python Counter on any input."""
    from kaylee_spark.core.mapreduce import word_count

    df = spark.createDataFrame([(t,) for t in texts] or [("",)], "value string")
    got = {r["word"]: r["count"] for r in word_count(spark, df).collect()}
    want = Counter(w for t in (texts or [""]) for w in t.split() if w)
    assert got == dict(want)


@SPARK_SETTINGS
@given(
    n_words=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
def test_chunk_reconstruction(spark, n_words, chunk, overlap):
    """Lossless-coverage law: dropping each non-first chunk's first
    `overlap` tokens and concatenating reconstructs the document
    exactly — no token lost, none duplicated, for ANY (chunk, overlap)
    with overlap < chunk."""
    from hypothesis import assume

    from kaylee_spark.operators.text import chunk_documents

    assume(overlap < chunk)
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert rows[0]["chunk_idx"] == 0
    rebuilt = []
    for r in rows:
        toks = [t for t in r["chunk_text"].split(" ") if t]
        rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[overlap:])
    assert rebuilt == words, (chunk, overlap, [r["chunk_text"] for r in rows])


# ---------------------------------------------------------------------------
# fuzzy_join exactness on adversarial random corpora
# ---------------------------------------------------------------------------

words_strategy = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=12),  # tiny alphabet ->
    # maximal gram collisions and many genuine near-matches, the
    # hardest regime for the prefix filter and the gram-poor split
    min_size=1,
    max_size=14,
    unique=True,
)


@given(words=words_strategy, d=st.integers(min_value=1, max_value=2))
@SPARK_SETTINGS
def test_fuzzy_join_exact_vs_brute_force(spark, words, d):
    import pyspark.sql.functions as F

    from kaylee_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame([(i, w) for i, w in enumerate(words)], ["lid", "lw"])
    right = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(words)], ["rid", "rw"]
    )
    got = {
        (r["lid"], r["rid"], r["edit_distance"])
        for r in fuzzy_join(left, right, "lw", "rw", max_dist=d).collect()
    }
    truth = {
        (r["lid"], r["rid"], r["d"])
        for r in left.crossJoin(right)
        .withColumn("d", F.levenshtein("lw", "rw"))
        .filter(F.col("d") <= d)
        .collect()
    }
    assert got == truth


@given(
    base_rows=st.lists(
        st.tuples(st.integers(0, 15), st.text("xyz", max_size=3)), max_size=12
    ),
    upd_rows=st.lists(
        st.tuples(st.integers(0, 15), st.text("xyz", max_size=3), st.booleans()),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
@SPARK_SETTINGS
def test_upsert_snapshot_matches_dict_semantics(spark, base_rows, upd_rows):
    from kaylee_spark.operators.maintenance import upsert_snapshot

    base_rows = list({k: (k, v) for k, v in base_rows}.values())  # unique keys
    base = spark.createDataFrame(base_rows, "k int, v string")
    updates = spark.createDataFrame(upd_rows, "k int, v string, del boolean")
    got = {(r["k"], r["v"]) for r in
           upsert_snapshot(base, updates, keys="k", tombstone_col="del").collect()}
    model = {k: v for k, v in base_rows}
    for k, v, dele in upd_rows:
        if dele:
            model.pop(k, None)
        else:
            model[k] = v
    assert got == set(model.items())


# ---------------------------------------------------------------------------
# Fourth-session operator invariants under random corpora
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"]), min_size=0, max_size=20).map(" ".join),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@given(docs=docs_strategy)
@SPARK_SETTINGS
def test_segment_dedup_partitions_every_document(spark, docs):
    """n_kept + n_removed always equals the doc's total segment count,
    every input doc appears exactly once, and kept text is a
    subsequence of the original — for ANY corpus."""
    from kaylee_spark.operators.text import remove_common_segments

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc"]: r for r in remove_common_segments(df, "doc_id", "text", words_per_seg=3).collect()}
    assert set(out) == {d for d, _ in docs}
    for doc_id, text in docs:
        r = out[doc_id]
        n_seg = -(-len(text.split()) // 3) if text.split() else 0
        assert r["n_kept"] + r["n_removed"] == n_seg
        # order-preserving subsequence of the original token stream
        it = iter(text.split())
        assert all(tok in it for tok in r["clean_text"].split())


@given(docs=docs_strategy)
@SPARK_SETTINGS
def test_unigram_logprob_bounds_and_coverage(spark, docs):
    """Scores are finite, non-positive, and exactly the non-empty docs
    are scored — for ANY corpus."""
    import math

    from kaylee_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = unigram_logprob(df, "doc_id", "text").collect()
    assert {r["doc"] for r in rows} == {d for d, t in docs if t.split()}
    for r in rows:
        assert math.isfinite(r["avg_logprob"]) and r["avg_logprob"] <= 0.0


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(100, 115)),
        min_size=1,
        max_size=40,
    )
)
@SPARK_SETTINGS
def test_pagerank_total_mass_bounded_any_graph(spark, edges):
    """Mass never exceeds RANK_SCALE and every node gets a positive
    rank — for ANY bipartite edge multiset (duplicates included)."""
    from pyspark.sql import functions as F

    from kaylee_spark.operators.graph import RANK_SCALE, pagerank

    df = spark.createDataFrame(edges, "src long, dst long").distinct()
    ranks = pagerank(df, iterations=2)
    agg = ranks.agg(F.sum("rank_e12").alias("s"), F.min("rank_e12").alias("m")).first()
    assert agg["s"] <= RANK_SCALE
    assert agg["m"] > 0


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 50),
            st.text(alphabet="xy ", min_size=0, max_size=30),
            st.sampled_from(["en", "de"]),
        ),
        min_size=0,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    capacity=st.integers(min_value=1, max_value=16),
)
@SPARK_SETTINGS
def test_sequence_packing_invariants_any_corpus(spark, docs, capacity):
    """For ANY corpus and capacity: waste = n_blocks*C - total,
    0 <= waste < C when total > 0, boundary docs never exceed docs
    with tokens, and totals equal a python recount."""
    from kaylee_spark.operators.text import sequence_packing_stats

    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = sequence_packing_stats(df, "doc_id", "text", "lang", capacity=capacity).collect()
    by_lang = {}
    for d, t, lang in docs:
        by_lang.setdefault(lang, []).append(len([w for w in t.split(" ") if w]))
    assert {r["lang"] for r in rows} == set(by_lang)
    for r in rows:
        toks = by_lang[r["lang"]]
        total = sum(toks)
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == total
        assert r["n_blocks"] == (total + capacity - 1) // capacity
        assert r["waste_tokens"] == r["n_blocks"] * capacity - total
        if total > 0:
            assert 0 <= r["waste_tokens"] < capacity
        assert 0 <= r["n_boundary_docs"] <= sum(1 for n in toks if n > 0)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
@SPARK_SETTINGS
def test_triangle_stats_matches_brute_force_any_graph(spark, edges):
    """Degree-oriented count == brute-force triple enumeration for ANY
    small graph (self-loops dropped, edges canonicalized u<v)."""
    from itertools import combinations

    from kaylee_spark.operators.graph import triangle_stats

    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not canon:
        return
    df = spark.createDataFrame(canon, "u long, v long")
    r = triangle_stats(df).collect()[0]
    es = set(canon)
    nodes = sorted({n for e in canon for n in e})
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    assert r["n_triangles"] == brute
    assert r["n_nodes"] == len(nodes)
    assert r["n_edges"] == len(canon)
