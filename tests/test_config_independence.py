"""Queries must be correct on ANY session config — the external driver
runs them on its own vanilla SparkSession, not our tuned one. These
tests flip the optimizer knobs that change PHYSICAL plans (broadcast
vs shuffle join, AQE) and assert identical RESULTS."""

from __future__ import annotations

import pytest

from kaylee_spark.queries import load_everything

REG = load_everything()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ["q03_top_orders", "q05_region_revenue", "q09_nation_year_profit", "a08_asof_join"])
def test_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "d07_decontamination",
        "q25_salted_join",
        "d08_incremental_dedup",
        "a17_zscore_outliers",
        "t13_bm25_topk",
        "a19_dq_report",
        "e16_sessionize",
    ],
)
def test_round5_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


def test_streamed_tumbling_timezone_independent(spark, sf_dir):
    """e07 must equal e01's batch result even when the session runs on
    a half-hour-offset timezone — the drain pins UTC internally and the
    emitted window_start converts back to NTZ by epoch arithmetic, so
    no session tz can shift window boundaries (the classic LTZ
    streaming bug this guards against)."""
    want = _rows(REG["e01_tumbling_window"].fn(spark, sf_dir))
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        got = _rows(REG["e07_streamed_tumbling"].fn(spark, sf_dir))
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Kolkata"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got == want


@pytest.mark.parametrize(
    "name", ["a16_fuzzy_join", "d09_snapshot_upsert", "e11_funnel", "t12_token_budget_mix"]
)
def test_late_round5_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


@pytest.mark.parametrize("name", ["e12_cohort_retention", "e13_resample", "e15_trend", "e16_sessionize"])
def test_timestamp_queries_session_tz_independent(spark, sf_dir, name):
    """Bucketing/cohort arithmetic must be pure NTZ — a half-hour-offset
    session timezone (Asia/Kolkata) must not move bucket edges or week
    boundaries."""
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got == want


@pytest.mark.parametrize("name", ["e17_rollup_cascade", "d10_snapshot_diff", "a20_skew_report", "e18_streamed_dedup"])
def test_third_session_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


@pytest.mark.parametrize("name", ["a17_zscore_outliers", "t14_vocabulary", "e16_sessionize", "d10_snapshot_diff"])
def test_results_identical_across_shuffle_partition_counts(spark, sf_dir, name):
    """The driver session runs the default 200 shuffle partitions, not
    our tuned 32 — global windows, decimal aggs, and hash joins must
    produce identical bits under any partitioning."""
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "g01_pagerank",
        "a21_mad_outliers",
        "t16_stratified_sample",
        "d11_line_dedup",
        "t17_unigram_logprob",
        "s06_nearest_centroid",
    ],
)
def test_fourth_session_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",      # decimal accumulation under both modes
        "a17_zscore_outliers",      # division guarded by a pre-projection filter
        "a21_mad_outliers",         # same guard, MAD denominator
        "q13_order_count_distribution",
        "t17_unigram_logprob",      # ln + decimal fold
    ],
)
def test_results_identical_with_ansi_disabled(spark, sf_dir, name):
    """Spark 4 runs ANSI mode by default; nothing here may RELY on it.
    With ANSI off, illegal arithmetic yields null instead of raising —
    a query whose guards are correct produces identical rows either
    way, while one leaning on ANSI errors (or on silent nulls) drifts."""
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "d12_incremental_neardup",  # broadcast hot-set anti + semi joins
        "s07_mmr_topk",             # greedy loop over checkpointed frames
        "g03_triangle_count",       # degree-oriented wedge joins
        "s08_diverse_coreset",      # sign cells + portable-hash rank
        "t19_bpe_pair_counts",      # pair-keyed agg + TakeOrdered
        "t20_sequence_packing",     # group cumsum window, integer arith
    ],
)
def test_sixth_session_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "s13_hard_negatives",
        "e30_pit_join",
        "a30_ks_test",
        "d19_duplicate_windows",
        "g07_label_propagation",
        "p02_pretraining_mix",
    ],
)
def test_round7_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want


@pytest.mark.parametrize("name", ["e28_scd2_history", "e29_seasonal_anomaly", "e30_pit_join", "a31_psi_drift", "e31_psi_timeline"])
def test_round7_timestamp_queries_session_tz_independent(spark, sf_dir, name):
    """Period boundaries (Jan-16 split, per-day buckets), hour-of-day
    extraction, and as-of ordering must be pure NTZ arithmetic — a
    half-hour-offset session timezone must not move any of them."""
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "a39_moment_store",
        "a40_quantile_store",
        "a41_comoment_store",
        "q38_small_quantity_revenue",
        "q39_important_part_values",
    ],
)
def test_round13_results_identical_across_shuffle_partition_counts(
    spark, sf_dir, name
):
    """The mergeable stores' whole claim is partition-independence —
    integer/decimal registers merged by a commutative monoid must be
    bit-identical at any shuffle width; the q38/q39 decorrelations'
    exact thresholds likewise cannot depend on partial-agg merge
    order."""
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == want


@pytest.mark.parametrize(
    "name",
    ["q38_small_quantity_revenue", "q39_important_part_values"],
)
def test_round13_results_identical_without_broadcast_or_aqe(spark, sf_dir, name):
    """The decorrelations hint broadcasts; with broadcast disabled the
    planner falls back to shuffle joins and the results must not
    move."""
    fn = REG[name].fn
    want = _rows(fn(spark, sf_dir))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert got == want
