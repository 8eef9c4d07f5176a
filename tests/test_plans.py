"""Plan-quality regression tests: assert the PHYSICAL PLAN properties
the 100 TB design depends on, not just result correctness.

A refactor that silently drops a broadcast hint, breaks predicate
pushdown, or introduces a cartesian product still returns correct rows
at fixture scale — these tests are what turns that into a red test.
Plans are built (analysis + physical planning only), never executed,
so the whole file costs seconds.
"""

from __future__ import annotations

import re

import pytest

from kaylee_spark.queries import load_all
from kaylee_spark.sources import load_table


def plan_of(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def registry():
    from kaylee_spark.queries import load_everything

    return load_everything()


def test_q01_pushdown_and_pruning(spark, sf_dir, registry):
    """The flagship agg must push its date filter into the parquet scan
    and prune unused lineitem columns (7 of 11 used)."""
    p = plan_of(registry["q01_pricing_summary"].fn(spark, sf_dir))
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", p), p
    scan_schemas = re.findall(r"ReadSchema: (.*)", p)
    assert scan_schemas and all("l_partkey" not in s for s in scan_schemas), (
        "q01 reads l_partkey — column pruning broke"
    )


def test_star_join_broadcasts_dims(spark, sf_dir, registry):
    """q03/q05 join fact tables to small dims; the dims must arrive as
    broadcast hash joins, never shuffle both sides."""
    for q in ("q03_top_orders", "q05_region_revenue"):
        p = plan_of(registry[q].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in p, f"{q} lost its broadcast join"


def test_d07_broadcasts_eval_shingles(spark, sf_dir, registry):
    """Decontamination must semi-join train shingles against a
    BROADCAST eval set — shuffling the 100 TB train shingle stream
    against a tiny benchmark would be the classic scale mistake."""
    p = plan_of(registry["d07_decontamination"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p


def test_s01_broadcasts_queries(spark, sf_dir, registry):
    """Brute-force top-k: the query vectors are broadcast so the corpus
    is scanned exactly once with no shuffle of embeddings."""
    p = plan_of(registry["s01_cosine_topk"].fn(spark, sf_dir))
    assert "Broadcast" in p, p


# a fast smoke subset of the full-registry guard below: pure-lazy
# main-tier queries whose plans build in milliseconds — kept so a
# cartesian regression in the relational core fails in seconds even
# when someone runs only this file's fast tests
_LAZY = [
    "q01_pricing_summary", "q02_min_cost_supplier", "q03_top_orders",
    "q04_order_priority", "q05_region_revenue", "q07_distinct",
    "q09_nation_year_profit", "q10_returned_items", "q11_cube",
    "q13_order_count_distribution", "q15_string_funcs",
    "q16_customers_no_orders", "q17_above_avg_parts", "q20_set_intersect",
    "q23_date_trunc", "q25_salted_join", "q26_volume_shipping",
    "q27_market_share", "q30_large_volume_orders",
    "q31_dormant_rich_customers", "q32_sole_fault_suppliers",
    "w01_rank_orders", "w02_running_total",
    "w05_range_frame", "e01_tumbling_window", "e02_sliding_window",
    "e03_session_window", "e04_json_extract", "e05_event_dedup",
    "d01_exact_dedup", "d03_jaccard_pairs", "d07_decontamination",
    "t01_lang_stats", "t03_quality_filter", "t04_fingerprint",
    "a05_pivot", "a08_asof_join", "a09_range_join", "a10_array_agg",
]


def test_no_cartesian_products(spark, sf_dir, registry):
    """Fast subset: no relational-core query may plan a
    CartesianProduct. The REGISTRY-WIDE version of this guard is
    test_no_cartesian_products_full_registry below."""
    offenders = []
    for name in _LAZY:
        p = plan_of(registry[name].fn(spark, sf_dir))
        if "CartesianProduct" in p:
            offenders.append(name)
    assert not offenders, offenders


def test_no_cartesian_products_full_registry(spark, sf_dir, registry):
    """EVERY registry entry — main tier and extra tier — must plan
    without a CartesianProduct. Eager queries (iterative loops,
    k-means fits, streaming drains, collect-folded scalars) simply
    execute their small jobs at the smoke scale while the final frame
    is built; their FINAL plan is then inspected like any other, so
    nothing is exempt. The sanctioned near-cartesians in the engine
    are all BroadcastNestedLoopJoins against provably tiny sides
    (1-row stats frames, broadcast query/anchor sets, the IVF
    centroid probe) — BNLJ is not CartesianProduct and does not trip
    this guard; an actual CartesianProduct anywhere means both sides
    went unkeyed AND unbroadcast, which no operator here should ever
    plan. Cost: ~2 min (measured 129 s for 184 entries at sf0.001) —
    the price of making 'no cartesian anywhere' a test instead of a
    tool run."""
    offenders = []
    errors = []
    for name in sorted(registry):
        try:
            p = plan_of(registry[name].fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — collect, don't mask
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if "CartesianProduct" in p:
            offenders.append(name)
    assert not errors, errors
    assert not offenders, offenders


def test_hot_paths_are_codegen(spark, sf_dir, registry):
    """The relational hot paths must run inside whole-stage codegen
    (JVM-compiled loops), not interpreted expression evaluation."""
    # under AQE the pre-execution plan is one opaque AdaptiveSparkPlan
    # and reports 0 codegen subtrees; build these plans with AQE off —
    # codegen eligibility is a property of the operators, not of AQE
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("q01_pricing_summary", "q05_region_revenue", "t01_lang_stats"):
            p = plan_of(registry[name].fn(spark, sf_dir), mode="codegen")
            m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p)
            assert m and int(m.group(1)) >= 1, f"{name} fell out of codegen"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_events_scan_prunes_props(spark, sf_dir, registry):
    """e01 aggregates (ts, event_type, value) — the wide props JSON
    column must not be read from parquet."""
    p = plan_of(registry["e01_tumbling_window"].fn(spark, sf_dir))
    schemas = re.findall(r"ReadSchema: (.*)", p)
    assert schemas and all("props" not in s for s in schemas), p


def test_shingling_is_shuffle_free(spark, sf_dir):
    """Per-doc shingle distinctness is row-local (array_distinct before
    the explode) — the AMPLIFIED (doc, shingle) stream must reach
    downstream consumers without any exchange. A regression to a global
    .distinct() would re-shuffle the full shingle stream, the largest
    avoidable exchange in the dedup family at 100 TB.

    One exchange IS allowed, and only below the Generate: the
    scale-adaptive fan_out (operators/skew.fan_out) round-robins the
    narrow PRE-amplification rows when the scan is under-parallel
    (single-row-group fixture files); on any already-parallel input it
    is the identity. What must never appear is an exchange ABOVE the
    explode, where each row has been amplified ~|doc| times."""
    from kaylee_spark.operators.dedup import hashed_shingles

    df = hashed_shingles(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    p = plan_of(df, mode="simple")
    # Every Exchange line must sit strictly below the Generate (explode)
    # in each plan rendering (initial/final under AQE), i.e. appear
    # after it in the printed tree, and be the round-robin fan_out —
    # never a hash/range exchange of the shingle stream.
    assert "Exchange hashpartitioning" not in p, p
    assert "Exchange rangepartitioning" not in p, p
    for section in p.split("== ")[1:]:
        gen = section.find("Generate explode")
        for m in re.finditer(r"Exchange \w+", section):
            assert "RoundRobinPartitioning" in m.group(0), section
            assert gen != -1 and m.start() > gen, section


def test_documents_dedup_scan_prunes_text_after_hash(spark, sf_dir):
    """exact_dedup must reduce text to a 32-byte hash before its one
    shuffle: no Exchange in the plan may carry the raw text column."""
    from kaylee_spark.operators.dedup import exact_dedup

    df = exact_dedup(load_table(spark, sf_dir, "documents"), "text", "doc_id")
    p = plan_of(df, mode="simple")
    # the only exchange partitions on the 32-byte hash, computed
    # map-side by the partial aggregate
    assert "Exchange hashpartitioning(content_sha" in p, p


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir, registry):
    """Under the 100 TB shuffle-join shape (broadcast disabled), Spark
    must inject a runtime bloom filter into the lineitem scan from
    q03's selective orders side — the runtime row-group-skipping
    mechanism a cluster run gets with the DEFAULT thresholds (10 MB
    creation / 10 GB application side). At fixture scale the joins
    broadcast instead (measured faster: bloom build overhead exceeds
    the tiny scan savings), so the engine does NOT lower thresholds —
    this test pins only that the capability engages when the shape
    calls for it."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "128mb",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1kb",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        p = plan_of(registry["q03_top_orders"].fn(spark, sf_dir))
        assert "might_contain" in p or "bloomfilter" in p.lower(), p[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q35_dynamic_partition_pruning_in_plan(spark, sf_dir, registry):
    """The fact scan must carry a runtime dynamicpruningexpression
    partition filter (fed by the dim broadcast) — static pruning is
    impossible here because no literal predicate touches ship_month."""
    p = plan_of(registry["q35_dynamic_partition_pruning"].fn(spark, sf_dir))
    assert "dynamicpruningexpression" in p, p
    assert "PartitionFilters" in p


def test_q34_bucketed_join_plans_without_exchange(spark, sf_dir, registry):
    """Both bucketed scans must feed the SortMergeJoin directly: the
    shuffle was paid at write time, so no Exchange may appear below
    the join (the only sanctioned Exchange is the final 3-group agg)."""
    p = plan_of(registry["q34_bucketed_colocated_join"].fn(spark, sf_dir))
    assert "SortMergeJoin" in p, p
    assert p.count("Bucketed: true") == 2, p
    # formatted mode lists the tree first: nothing upstream of the SMJ
    # node in the tree section may be an Exchange
    tree = p.split("(1) ")[0]
    smj_line = next(i for i, l in enumerate(tree.splitlines()) if "SortMergeJoin" in l)
    below = "\n".join(tree.splitlines()[smj_line:])
    assert "Exchange" not in below, below


def test_q37_box_filters_pushed_to_zorder_scan(spark, sf_dir, registry):
    """q37's 2-D box predicate must reach the parquet scan of the
    Z-ordered layout as pushed min/max-skippable filters on BOTH
    dimensions — without pushdown the clustering buys nothing."""
    p = plan_of(registry["q37_zorder_box_scan"].fn(spark, sf_dir))
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(l_partkey", p), p
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_suppkey", p), p


def test_q38_one_scan_decorrelation(spark, sf_dir, registry):
    """q38's correlated-scalar-per-group decorrelation must stay
    ONE-SCAN: the per-part average rides a window over the filtered
    fact, never a second lineitem scan or a per-row subquery; the
    pruned part dim arrives broadcast."""
    p = plan_of(registry["q38_small_quantity_revenue"].fn(spark, sf_dir))
    assert len(re.findall(r"Location: InMemoryFileIndex \[\S*lineitem", p)) == 1, p
    assert "BroadcastHashJoin" in p, p
    assert "Window" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_q39_single_aggregate_scalar_broadcast(spark, sf_dir, registry):
    """q39's global-scalar decorrelation must compute the per-part
    aggregate ONCE (localCheckpoint shares it between the scalar
    branch and the output branch — no second lineitem scan) and
    return the 1-row (total, count) via a broadcast, never a shuffle
    or a per-row subquery."""
    p = plan_of(registry["q39_important_part_values"].fn(spark, sf_dir))
    assert len(re.findall(r"Location: InMemoryFileIndex \[\S*lineitem", p)) == 0, (
        "scalar branch re-scans lineitem — localCheckpoint reuse broke"
    )
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p
