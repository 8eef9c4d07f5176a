"""Funnel and cohort-retention operator semantics."""

from __future__ import annotations

from datetime import datetime

import pytest

from kaylee_spark.operators.analytics import cohort_retention, funnel


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_strictly_after_and_dropout(spark):
    ev = _ev(
        spark,
        [
            # u1 completes in order
            (1, ts("2024-01-01 10:00"), "view"),
            (1, ts("2024-01-01 11:00"), "click"),
            (1, ts("2024-01-01 12:00"), "purchase"),
            # u2 clicked BEFORE viewing: click must not count
            (2, ts("2024-01-01 09:00"), "click"),
            (2, ts("2024-01-01 10:00"), "view"),
            # u3 never viewed: excluded entirely
            (3, ts("2024-01-01 10:00"), "purchase"),
            # u4 view and click at the SAME instant: strictly-after fails
            (4, ts("2024-01-01 10:00"), "view"),
            (4, ts("2024-01-01 10:00"), "click"),
        ],
    )
    out = {r["user_id"]: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["t_purchase"] == ts("2024-01-01 12:00")
    assert out[2]["t_click"] is None and out[2]["t_purchase"] is None
    assert out[4]["t_click"] is None


def test_funnel_picks_first_qualifying_not_first_overall(spark):
    ev = _ev(
        spark,
        [
            (1, ts("2024-01-01 10:00"), "view"),
            (1, ts("2024-01-01 09:00"), "click"),  # too early
            (1, ts("2024-01-01 11:00"), "click"),  # first qualifying
            (1, ts("2024-01-01 12:00"), "click"),
        ],
    )
    row = funnel(ev, ["view", "click"]).collect()[0]
    assert row["t_click"] == ts("2024-01-01 11:00")
    with pytest.raises(ValueError, match="steps"):
        funnel(ev, [])


def test_cohort_retention_offsets_and_rates(spark):
    ev = _ev(
        spark,
        [
            # two users first seen week of Jan 1 (Mon); one returns next week
            (1, ts("2024-01-02 10:00"), "view"),
            (2, ts("2024-01-03 10:00"), "view"),
            (1, ts("2024-01-09 10:00"), "view"),
            # one user first seen the following week
            (3, ts("2024-01-10 10:00"), "view"),
        ],
    )
    out = {
        (r["cohort"].date().isoformat(), r["period_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention_rate"],
        )
        for r in cohort_retention(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(out) == 3


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def test_sessionize_gap_splits_and_tiebreak(spark):
    from pyspark.sql import functions as F

    from kaylee_spark.operators.analytics import sessionize

    ev = spark.createDataFrame(
        [
            # user 1: two sessions split by a 31-min gap
            (1, 1, ts("2024-01-01 10:00:00")),
            (2, 1, ts("2024-01-01 10:10:00")),
            (3, 1, ts("2024-01-01 10:41:00")),
            # duplicate timestamps: event_id tie-break keeps the order total
            (4, 1, ts("2024-01-01 10:41:00")),
            # user 2: one event
            (5, 2, ts("2024-01-01 09:00:00")),
        ],
        ["event_id", "user_id", "ts"],
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_exact_boundary_is_same_session(spark):
    from kaylee_spark.operators.analytics import sessionize

    ev = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00")), (2, 1, ts("2024-01-01 10:30:00"))],
        ["event_id", "user_id", "ts"],
    )
    got = {r["event_id"]: r["session_idx"] for r in sessionize(ev, gap_seconds=1800).collect()}
    # a gap of EXACTLY gap_seconds does not split (strict >)
    assert got == {1: 0, 2: 0}


def test_sessionize_single_exchange(spark):
    from kaylee_spark.operators.analytics import sessionize

    ev = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00"))], ["event_id", "user_id", "ts"]
    )
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    # lag + running sum must ride ONE user-keyed exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_markov_transitions_counts_and_probs(spark):
    from kaylee_spark.operators.analytics import markov_transitions

    # user 1: A -> B -> A -> C ; user 2: B -> A
    rows = [
        (1, 1, ts("2024-01-01 10:00:00"), "A"),
        (2, 1, ts("2024-01-01 10:01:00"), "B"),
        (3, 1, ts("2024-01-01 10:02:00"), "A"),
        (4, 1, ts("2024-01-01 10:03:00"), "C"),
        (5, 2, ts("2024-01-01 10:00:00"), "B"),
        (6, 2, ts("2024-01-01 10:01:00"), "A"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = markov_transitions(ev, tiebreak_cols=["event_id"])
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p_transition"])
        for r in out.collect()
    }
    # transitions: A->B (1), B->A (2), A->C (1); first event per user excluded
    assert got == {
        ("A", "B"): (1, 0.5),
        ("A", "C"): (1, 0.5),
        ("B", "A"): (2, 1.0),
    }


def test_markov_transitions_probs_sum_to_one(spark):
    from pyspark.sql import functions as F

    from kaylee_spark.operators.analytics import markov_transitions
    from kaylee_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = markov_transitions(ev, tiebreak_cols=["event_id"])
    sums = (
        out.groupBy("prev_type")
        .agg(F.round(F.sum("p_transition"), 4).alias("s"))
        .collect()
    )
    assert sums and all(abs(r["s"] - 1.0) < 1e-3 for r in sums)


def test_markov_transitions_single_full_exchange(spark):
    from kaylee_spark.operators.analytics import markov_transitions

    ev = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00"), "A")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    plan = (
        markov_transitions(ev, tiebreak_cols=["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the raw events shuffle once (user-keyed lag); everything after
    # operates on the |types|^2-row aggregate
    before_agg = plan.split("HashAggregate")[-1]
    assert before_agg.count("Exchange hashpartitioning") == 1


def test_association_rules_exact_counts(spark):
    from kaylee_spark.operators.analytics import association_rules

    # baskets: {A,B,C}, {A,B}, {A,C}, {B}  -> N=4
    rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"), (3, "A"), (3, "C"), (4, "B")]
    df = spark.createDataFrame(rows, ["bk", "item"])
    out = association_rules(df, "bk", "item", min_item_support=1, min_pair_support=1)
    got = {(r["item_a"], r["item_b"]): r for r in out.collect()}
    ab = got[("A", "B")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["confidence_a_to_b"] == round(2 / 3, 6)
    assert ab["lift"] == round(2 * 4 / (3 * 3), 6)
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_association_rules_apriori_prune(spark):
    from kaylee_spark.operators.analytics import association_rules

    # item C appears once -> pruned before pair expansion
    rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, ["bk", "item"])
    out = association_rules(df, "bk", "item", min_item_support=2, min_pair_support=1)
    assert {(r["item_a"], r["item_b"]) for r in out.collect()} == {("A", "B")}


def test_association_rules_duplicate_lines_one_vote(spark):
    from kaylee_spark.operators.analytics import association_rules

    # the same item twice in one basket counts once (distinct first)
    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, ["bk", "item"])
    out = association_rules(df, "bk", "item", min_item_support=1, min_pair_support=1)
    r = out.collect()[0]
    assert (r["n_both"], r["n_a"], r["n_b"]) == (2, 2, 2)
    assert r["lift"] == round(2 * 2 / (2 * 2), 6)


def test_association_rules_broadcast_prune_plan(spark):
    from kaylee_spark.operators.analytics import association_rules

    df = spark.createDataFrame([(1, "A"), (1, "B")], ["bk", "item"])
    plan = (
        association_rules(df, "bk", "item", 1, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # frequent-item prune and both support re-joins broadcast; the
    # only shuffled join is the basket-keyed pair expansion
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------


def test_welch_matches_scipy_formula(spark):
    import math
    import random

    from kaylee_spark.operators.analytics import welch_ttest

    rng = random.Random(31)
    a = [round(rng.gauss(12, 3), 2) for _ in range(80)]
    b = [round(rng.gauss(10, 5), 2) for _ in range(50)]
    rows = [("treat", v) for v in a] + [("ctl", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = welch_ttest(df, "value", "grp", control="ctl").collect()[0]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        return n, m, sum((x - m) ** 2 for x in xs) / (n - 1)

    n1, m1, v1 = mv(a)
    n2, m2, v2 = mv(b)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dof = se2 * se2 / (v1 * v1 / (n1 * n1 * (n1 - 1)) + v2 * v2 / (n2 * n2 * (n2 - 1)))
    assert out["n1"] == n1 and out["n2"] == n2
    assert abs(out["t_stat"] - t) < 1e-5
    assert abs(out["dof"] - dof) < 1e-4
    assert abs(out["mean_diff"] - (m1 - m2)) < 1e-6


def test_welch_significance_direction(spark):
    from kaylee_spark.operators.analytics import welch_ttest

    # planted lift: treatment clearly above control; noise arm flat
    rows = [("ctl", 10.0 + (i % 5) * 0.1) for i in range(100)]
    rows += [("lift", 14.0 + (i % 5) * 0.1) for i in range(100)]
    rows += [("flat", 10.0 + ((i + 2) % 5) * 0.1) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r["grp"]: r for r in welch_ttest(df, "value", "grp", control="ctl").collect()}
    assert set(out) == {"lift", "flat"}
    assert out["lift"]["significant"] and out["lift"]["t_stat"] > 1.96
    assert not out["flat"]["significant"]


def test_welch_degenerate_arms_and_missing_control(spark):
    import pytest

    from kaylee_spark.operators.analytics import welch_ttest

    df = spark.createDataFrame(
        [("ctl", 1.0), ("ctl", 2.0), ("tiny", 5.0), ("const", 3.0), ("const", 3.0)],
        "grp string, value double",
    )
    out = {r["grp"]: r for r in welch_ttest(df, "value", "grp", control="ctl").collect()}
    assert out["tiny"]["t_stat"] is None and not out["tiny"]["significant"]
    # constant arm + tiny control variance still guards se2 > 0 path
    assert out["const"]["t_stat"] is not None or out["const"]["significant"] is False
    with pytest.raises(ValueError):
        welch_ttest(df, "value", "grp", control="nope")


# ---------------------------------------------------------------------------
# benford_screen
# ---------------------------------------------------------------------------


def test_benford_accepts_benford_and_flags_uniform(spark):
    import math
    import random

    from kaylee_spark.operators.analytics import benford_screen

    rng = random.Random(41)
    rows = []
    # "natural": log-uniform over 4 decades follows Benford closely
    for _ in range(2000):
        rows.append(("natural", round(10 ** rng.uniform(0, 4), 2)))
    # "fabricated": uniform [100, 1000) — first digits uniform, not Benford
    for _ in range(2000):
        rows.append(("fab", round(rng.uniform(100, 999), 2)))
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r["grp"]: r for r in benford_screen(df, "value", "grp").collect()}
    assert not out["natural"]["suspicious"]
    assert out["fab"]["suspicious"] and out["fab"]["chi2"] > 100
    # counts pivot exactly
    assert sum(out["fab"][f"o{d}"] for d in range(1, 10)) == out["fab"]["n"] == 2000
    # replay chi2 by hand for the fabricated arm
    n = out["fab"]["n"]
    chi2 = sum(
        (out["fab"][f"o{d}"] - n * math.log10(1 + 1 / d)) ** 2
        / (n * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert abs(out["fab"]["chi2"] - chi2) < 1e-4


def test_benford_digit_extraction_and_filters(spark):
    from kaylee_spark.operators.analytics import benford_screen

    df = spark.createDataFrame(
        [("g", 0.95), ("g", 912.44), ("g", 0.07), ("g", -5.0), ("g", 0.0)],
        "grp string, value double",
    )
    out = benford_screen(df, "value", "grp").collect()[0]
    # 0.95 -> 9, 912.44 -> 9, 0.07 -> 7; negatives and zero excluded
    assert out["n"] == 3 and out["o9"] == 2 and out["o7"] == 1


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_weights_are_poisson1_ish(spark):
    from kaylee_spark.operators.analytics import poisson_bootstrap_ci

    # 2000 rows x 32 replicates: the mean Poisson(1) weight is ~1, so
    # every replicate's weighted count lands near n and the weight
    # distribution is non-degenerate (some 0s, some >= 2).
    from pyspark.sql import functions as F

    from kaylee_spark.operators.analytics import bootstrap_weight_sql

    df = spark.range(2000).select(
        F.col("id").alias("k"), F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep")
    )
    w = df.select(F.expr(bootstrap_weight_sql("k", "rep", 32)).alias("w"))
    stats = w.agg(
        F.avg("w").alias("m"),
        F.count(F.when(F.col("w") == 0, 1)).alias("z"),
        F.count(F.when(F.col("w") >= 2, 1)).alias("big"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert abs(stats["m"] - 1.0) < 0.02
    # P(0) = P(>=2) ~ .368/.264: both arms must be well-populated
    assert stats["z"] / stats["n"] > 0.3
    assert stats["big"] / stats["n"] > 0.2


def test_bootstrap_ci_brackets_true_mean(spark):
    from kaylee_spark.operators.analytics import poisson_bootstrap_ci

    rows = [(i, "g", 100.0 + (i % 40)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, grp string, value double")
    out = poisson_bootstrap_ci(df, "grp", "value", "k", replicates=32).collect()[0]
    true_mean = sum(100.0 + (i % 40) for i in range(1000)) / 1000
    assert out["n_rows"] == 1000
    assert abs(out["point_mean"] - true_mean) < 1e-6
    assert out["ci_lo"] <= true_mean <= out["ci_hi"]
    # a 40-unit-spread population of n=1000: the CI is tight, not [0, inf)
    assert out["ci_hi"] - out["ci_lo"] < 5.0


def test_bootstrap_ci_rejects_tiny_replicates(spark):
    import pytest as _pytest

    from kaylee_spark.operators.analytics import poisson_bootstrap_ci

    df = spark.createDataFrame([(1, "g", 1.0)], "k long, grp string, value double")
    with _pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "grp", "value", "k", replicates=3)


def _ks_reference(a, c):
    """Pure-Python exact KS: max |i*m - j*n| over the pooled walk."""
    pts = sorted(set(a) | set(c))
    n, m = len(a), len(c)
    num = max(abs(sum(1 for x in a if x <= p) * m - sum(1 for x in c if x <= p) * n) for p in pts)
    return num, n * m


def test_ks_two_sample_hand_values(spark):
    from kaylee_spark.operators.analytics import ks_two_sample

    rows = [("a", v) for v in [1.0, 2.0, 3.0]] + [("ctl", v) for v in [1.5, 2.5, 3.5]]
    df = spark.createDataFrame(rows, ["grp", "value"])
    r = ks_two_sample(df, "value", "grp", control="ctl").collect()[0]
    assert (r["ks_num"], r["ks_denom"]) == (3, 9)
    assert abs(r["ks_stat"] - 1 / 3) < 1e-15
    assert r["significant"] is False


def test_ks_two_sample_ties_use_full_peer_group(spark):
    from kaylee_spark.operators.analytics import ks_two_sample

    rows = [("a", v) for v in [1.0, 1.0, 2.0]] + [("ctl", v) for v in [1.0, 3.0, 3.0]]
    df = spark.createDataFrame(rows, ["grp", "value"])
    r = ks_two_sample(df, "value", "grp", control="ctl").collect()[0]
    # at x=1: |2*3-1*3|=3; x=2: |3*3-1*3|=6; x=3: 0 -> num 6
    assert (r["ks_num"], r["ks_denom"]) == (6, 9)


def test_ks_two_sample_matches_python_reference(spark):
    from kaylee_spark.operators.analytics import ks_two_sample

    # deterministic LCG samples, two shifted arms + control
    seq, x = [], 7
    for _ in range(200):
        x = (x * 48271) % 2147483647
        seq.append(x / 2147483647)
    a, b, c = seq[0:60], [v * 0.5 for v in seq[60:140]], seq[140:200]
    rows = (
        [("a", v) for v in a] + [("b", v) for v in b] + [("ctl", v) for v in c]
    )
    df = spark.createDataFrame(rows, ["grp", "value"])
    got = {r["grp"]: r for r in ks_two_sample(df, "value", "grp", control="ctl").collect()}
    for grp, sample in (("a", a), ("b", b)):
        num, den = _ks_reference(sample, c)
        assert (got[grp]["ks_num"], got[grp]["ks_denom"]) == (num, den), grp
    # arm b is a strong compression toward 0 -> detectable shift
    assert got["b"]["significant"] is True


def test_psi_drift_identical_periods_near_zero(spark):
    from kaylee_spark.operators.analytics import psi_drift

    rows = [("g", True, v) for v in [1.0, 7.0, 30.0, 100.0]] + [
        ("g", False, v) for v in [1.0, 7.0, 30.0, 100.0]
    ]
    df = spark.createDataFrame(rows, ["grp", "is_a", "value"])
    r = psi_drift(df, "value", "grp", "is_a").collect()[0]
    assert abs(r["psi"]) < 1e-9 and r["drifted"] is False
    assert r["na"] == 4 and r["nb"] == 4 and r["a0"] == 1 and r["b0"] == 1


def test_psi_drift_detects_shift(spark):
    from kaylee_spark.operators.analytics import psi_drift

    # period A concentrated in the lowest bin, period B in the highest
    rows = [("g", True, 1.0)] * 50 + [("g", False, 400.0)] * 50
    df = spark.createDataFrame(rows, ["grp", "is_a", "value"])
    r = psi_drift(df, "value", "grp", "is_a").collect()[0]
    assert r["psi"] > 2.0 and r["drifted"] is True
    assert r["a0"] == 50 and r["b7"] == 50


def test_psi_drift_matches_python_reference(spark):
    import math

    from kaylee_spark.operators.analytics import PSI_BIN_EDGES, psi_drift

    def bin_of(v):
        for i, e in enumerate(PSI_BIN_EDGES):
            if v < e:
                return i
        return len(PSI_BIN_EDGES)

    seq, x = [], 11
    for _ in range(300):
        x = (x * 48271) % 2147483647
        seq.append(0.01 + 489.0 * (x / 2147483647))
    a_vals, b_vals = seq[:150], [v * 0.6 for v in seq[150:]]
    k = len(PSI_BIN_EDGES) + 1
    ca = [sum(1 for v in a_vals if bin_of(v) == i) for i in range(k)]
    cb = [sum(1 for v in b_vals if bin_of(v) == i) for i in range(k)]
    want = 0.0
    for i in range(k):
        pa = (ca[i] + 1.0) / (len(a_vals) + float(k))
        pb = (cb[i] + 1.0) / (len(b_vals) + float(k))
        want += (pa - pb) * round(math.log(pa / pb), 6)
    rows = [("g", True, v) for v in a_vals] + [("g", False, v) for v in b_vals]
    df = spark.createDataFrame(rows, ["grp", "is_a", "value"])
    r = psi_drift(df, "value", "grp", "is_a").collect()[0]
    assert abs(r["psi"] - want) < 1e-9


def test_gini_extremes_and_reference(spark):
    from kaylee_spark.operators.analytics import gini_by_group

    rows = (
        # perfect equality -> G = 0
        [("eq", i, 10.0) for i in range(1, 5)]
        # maximal concentration among 4: one holder -> G = (n-1)/n = 0.75
        + [("one", 1, 0.0), ("one", 2, 0.0), ("one", 3, 0.0), ("one", 4, 100.0)]
        # hand case: values 1,2,3,4 -> G = (2*30 - 5*10)/(4*10) = 0.25
        + [("hand", i, float(i)) for i in range(1, 5)]
        # all-zero group -> NULL
        + [("zero", i, 0.0) for i in range(1, 3)]
    )
    df = spark.createDataFrame(rows, ["grp", "id", "v"])
    got = {r["grp"]: r for r in gini_by_group(df, "grp", "v", "id").collect()}
    assert abs(got["eq"]["gini"]) < 1e-15
    assert abs(got["one"]["gini"] - 0.75) < 1e-15
    assert abs(got["hand"]["gini"] - 0.25) < 1e-15
    assert got["zero"]["gini"] is None


def test_psi_timeline_reference_day_excluded_and_shift_scored(spark):
    from datetime import datetime

    from kaylee_spark.operators.analytics import psi_timeline

    rows = (
        # ref day: low values; day 2 identical; day 3 shifted high
        [("g", datetime(2024, 1, 1, 0, 0, i % 60), 1.0) for i in range(40)]
        + [("g", datetime(2024, 1, 2, 0, 0, i % 60), 1.0) for i in range(40)]
        + [("g", datetime(2024, 1, 3, 0, 0, i % 60), 400.0) for i in range(40)]
    )
    df = spark.createDataFrame(rows, ["grp", "ts", "value"])
    got = {r["day"]: r for r in psi_timeline(df, "value", "grp", "ts", "2024-01-01").collect()}
    assert set(got) == {"2024-01-02", "2024-01-03"}   # ref day absent
    assert abs(got["2024-01-02"]["psi"]) < 1e-9 and got["2024-01-02"]["drifted"] is False
    assert got["2024-01-03"]["psi"] > 2.0 and got["2024-01-03"]["drifted"] is True
    assert got["2024-01-03"]["na"] == 40 and got["2024-01-03"]["nb"] == 40


def test_bootstrap_weight_sql_total_over_extreme_keys(spark):
    """The weight draw must be a total function shared VERBATIM by both
    engines: huge bigint keys must not overflow (DuckDB raises Out of
    Range where Spark wraps) and negative keys must not collapse every
    weight to the first CDF arm."""
    import duckdb

    from pyspark.sql import functions as F

    from kaylee_spark.operators.analytics import bootstrap_weight_sql

    expr = bootstrap_weight_sql("k", "rep", 32)
    keys = [-(2**60) - 7, -12345, -1, 0, 1, 2**40 + 3, 2**60 + 11]
    rows = [(k, r) for k in keys for r in range(32)]
    df = spark.createDataFrame(rows, "k long, rep int")
    got = {
        (r["k"], r["rep"]): r["w"]
        for r in df.select("k", "rep", F.expr(expr).alias("w")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, rep INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (k, r): w for k, r, w in con.execute(f"SELECT k, rep, {expr} FROM t").fetchall()
    }
    assert got == want  # bit-identical across engines, no Out of Range
    assert all(0 <= w <= 8 for w in got.values())
    # negative keys draw non-degenerate weights too
    neg = [w for (k, _), w in got.items() if k < 0]
    assert any(w > 0 for w in neg)


def test_bootstrap_ci_degenerate_replicate_falls_back_to_point_mean(spark):
    """A group so small that some replicate draws weight 0 on every row
    must still emit a full-length replicate-mean list: the degenerate
    replicate collapses to the group's point mean, so ci_lo/ci_hi are
    never NULL and never mis-ranked (Spark's collect_list drops NULLs
    where DuckDB's list() keeps them — the guard removes the NULL)."""
    from pyspark.sql import functions as F

    from kaylee_spark.operators.analytics import bootstrap_weight_sql, poisson_bootstrap_ci

    # find a key whose 32 replicate draws include a zero weight — with
    # a 1-row group that zero-weight replicate is fully degenerate
    probe = spark.range(64).select(
        F.col("id").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep"),
    ).select("k", F.expr(bootstrap_weight_sql("k", "rep", 32)).alias("w"))
    zero_keys = {
        r["k"] for r in probe.filter(F.col("w") == 0).select("k").distinct().collect()
    }
    assert zero_keys, "probe must find a key with a zero-weight replicate"
    k = min(zero_keys)
    df = spark.createDataFrame([(k, "lone", 42.5)], "k long, grp string, value double")
    out = poisson_bootstrap_ci(df, "grp", "value", "k", replicates=32).collect()[0]
    assert out["n_rows"] == 1
    # every replicate mean is either the row's value or the point-mean
    # fallback — which are the same number here, so the CI is a point
    assert out["point_mean"] == 42.5
    assert out["ci_lo"] == 42.5 and out["ci_hi"] == 42.5


def _mwu_reference(a, c):
    """Brute-force pair-count U1 + the tie-corrected integer screen."""
    from collections import Counter

    n1, n2 = len(a), len(c)
    u1 = 0.0
    for x in a:
        for y in c:
            if x > y:
                u1 += 1
            elif x == y:
                u1 += 0.5
    t = Counter(a + c)
    tcorr = sum(k**3 - k for k in t.values())
    n = n1 + n2
    lhs = (2 * u1 - n1 * n2) ** 2 * 3 * n * (n - 1) * 10000
    rhs = 38416 * n1 * n2 * ((n + 1) * n * (n - 1) - tcorr)
    return u1, lhs > rhs


def test_mann_whitney_hand_values(spark):
    from kaylee_spark.operators.analytics import mann_whitney_u

    rows = [("a", v) for v in [1.0, 2.0, 3.0]] + [("ctl", v) for v in [1.5, 2.5, 3.5]]
    df = spark.createDataFrame(rows, ["grp", "value"])
    r = mann_whitney_u(df, "value", "grp", control="ctl").collect()[0]
    # wins: 2>1.5, 3>1.5, 3>2.5 -> U1 = 3
    assert (r["n1"], r["n2"], r["u1"]) == (3, 3, 3.0)
    assert r["significant"] is False


def test_mann_whitney_ties_count_half(spark):
    from kaylee_spark.operators.analytics import mann_whitney_u

    rows = [("a", v) for v in [1.0, 1.0, 2.0]] + [("ctl", v) for v in [1.0, 3.0, 3.0]]
    df = spark.createDataFrame(rows, ["grp", "value"])
    r = mann_whitney_u(df, "value", "grp", control="ctl").collect()[0]
    # ties 1=1 (x2 half-wins) + win 2>1 -> U1 = 2.0
    assert r["u1"] == 2.0


def test_mann_whitney_matches_python_reference(spark):
    from kaylee_spark.operators.analytics import mann_whitney_u

    # LCG half-integer samples (exact in double AND decimal(18,2)):
    # arm a ~ control's distribution, arm b shifted up by +30
    seq, x = [], 7
    for _ in range(200):
        x = (x * 48271) % 2147483647
        seq.append((x % 200) / 2.0)
    a, c = seq[0:60], seq[140:200]
    b = [v + 30.0 for v in seq[60:140]]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("ctl", v) for v in c]
    df = spark.createDataFrame(rows, ["grp", "value"])
    got = {r["grp"]: r for r in mann_whitney_u(df, "value", "grp", control="ctl").collect()}
    for grp, sample in (("a", a), ("b", b)):
        u1, sig = _mwu_reference(sample, c)
        assert got[grp]["u1"] == u1, grp
        assert got[grp]["significant"] is sig, grp
    # the planted +30 shift must actually trip the 5% screen
    assert got["b"]["significant"] is True


def test_hll_distinct_store_raw_branch_accuracy(spark):
    from kaylee_spark.operators.analytics import hll_distinct_store

    # 5000 distinct sequential ids, split across 3 days -> the
    # harmonic (raw) branch, and day-shard merging is non-trivial
    rows = [("a", f"2024-01-0{1 + (u % 3)} 00:00:00", u) for u in range(5000)]
    df = (
        spark.createDataFrame(rows, ["event_type", "ts", "user_id"])
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id")
    )
    r = hll_distinct_store(df, "user_id", "event_type").collect()[0]
    assert r["n_exact"] == 5000
    assert r["merge_exact"] is True
    assert r["within_bound"] is True
    assert abs(r["estimate"] - 5000) / 5000 < 0.2


def test_hll_distinct_store_duplicates_do_not_move_registers(spark):
    from kaylee_spark.operators.analytics import hll_distinct_store

    once = [("a", "2024-01-01 00:00:00", u) for u in range(300)]
    thrice = once + [("a", "2024-01-02 00:00:00", u) for u in range(300)] * 2
    def run(rows):
        df = spark.createDataFrame(rows, ["event_type", "ts", "user_id"]).selectExpr(
            "event_type", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id"
        )
        return hll_distinct_store(df, "user_id", "event_type").collect()[0]
    a, b = run(once), run(thrice)
    # idempotence: repeated observations of the same ids leave the
    # registers (and so the estimate) exactly unchanged
    assert a["estimate"] == b["estimate"]
    assert b["n_exact"] == 300 and b["merge_exact"] is True


def test_sliding_distinct_users_matches_bruteforce(spark):
    from datetime import date, timedelta

    from kaylee_spark.operators.analytics import sliding_distinct_users

    # LCG (user, day) activity with multi-day gaps and repeat days —
    # the shapes the lag-contribution trick must get exactly right
    rows, x = [], 11
    for _ in range(120):
        x = (x * 48271) % 2147483647
        u, dd = x % 7, (x // 7) % 25
        rows.append((u, f"2024-03-{1 + dd:02d} 0{u % 9}:15:00"))
    df = spark.createDataFrame(rows, ["user_id", "ts"]).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts"
    )
    got = {
        r["window_end"].date(): r["users"]
        for r in sliding_distinct_users(df, "user_id", "ts", 7).collect()
    }
    days = {(u, date(2024, 3, 1) + timedelta(days=dd)) for u, dd in
            ((u, int(t[8:10]) - 1) for u, t in rows)}
    lo = min(d for _, d in days)
    hi = max(d for _, d in days)
    expected = {}
    e = lo
    while e <= hi:
        expected[e] = len({u for u, d in days if e - timedelta(days=6) <= d <= e})
        e += timedelta(days=1)
    assert got == expected


def test_last_touch_attribution_matches_bruteforce(spark):
    from kaylee_spark.operators.analytics import last_touch_attribution

    # LCG event stream: ties at identical timestamps exercise the
    # (ts, event_id) tie-break; old touches exercise the lookback cut
    rows, x = [], 3
    types = ["click", "view", "purchase", "signup"]
    for i in range(200):
        x = (x * 48271) % 2147483647
        u, tmin, ty = x % 5, (x // 5) % 20000, types[(x // 7) % 4]
        rows.append((u, tmin, i, ty, float(x % 97)))
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    data = [
        (u, base + timedelta(minutes=tmin), i, ty, v)
        for (u, tmin, i, ty, v) in rows
    ]
    df = spark.createDataFrame(
        data, ["user_id", "ts", "event_id", "event_type", "value"]
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_id", "event_type", "value"
    )
    got = {
        r["channel"]: (r["conversions"], round(r["revenue"], 2))
        for r in last_touch_attribution(df, lookback_days=7).collect()
    }
    expected = {}
    per_user = {}
    for u, ts, i, ty, v in sorted(data, key=lambda r: (r[1], r[2])):
        per_user.setdefault(u, [])
        if ty == "purchase":
            touch = None
            for (tts, tty) in reversed(per_user[u]):
                touch = (tts, tty)
                break
            ch = (
                touch[1]
                if touch and touch[0] >= ts - timedelta(days=7)
                else "direct"
            )
            c, s = expected.get(ch, (0, 0.0))
            expected[ch] = (c + 1, round(s + v, 2))
        if ty in ("click", "view"):
            per_user[u].append((ts, ty))
    expected = {k: (c, round(s, 2)) for k, (c, s) in expected.items()}
    assert got == expected
