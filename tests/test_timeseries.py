"""Resample densification and forward-fill semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kaylee_spark.operators.timeseries import forward_fill, resample


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_resample_materializes_empty_buckets(spark):
    df = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:10"), 1.0),
            ("a", ts("2024-01-01 02:20"), 2.0),  # 01:00 bucket empty
            ("b", ts("2024-01-01 00:30"), 5.0),  # b missing 01:00 and 02:00
        ],
        ["k", "t", "v"],
    )
    out = resample(
        df,
        "t",
        "'1 hour'",
        aggs={"n": F.count("*"), "s": F.sum("v")},
        key_cols=["k"],
        fill={"n": 0},
    )
    got = {(r["k"], r["bucket"]): (r["n"], r["s"]) for r in out.collect()}
    # dense grid: 2 keys x 3 buckets
    assert len(got) == 6
    assert got[("a", ts("2024-01-01 01:00"))] == (0, None)  # unfilled col stays null
    assert got[("a", ts("2024-01-01 02:00"))] == (1, 2.0)
    assert got[("b", ts("2024-01-01 02:00"))] == (0, None)
    assert got[("b", ts("2024-01-01 00:00"))] == (1, 5.0)


def test_resample_global_grid_without_keys(spark):
    df = spark.createDataFrame(
        [(ts("2024-01-01 00:00"), 1.0), (ts("2024-01-01 03:00"), 1.0)], ["t", "v"]
    )
    out = resample(df, "t", "'1 hour'", aggs={"n": F.count("*")}, fill={"n": 0})
    rows = sorted((r["bucket"], r["n"]) for r in out.collect())
    assert [n for _, n in rows] == [1, 0, 0, 1]


def test_forward_fill_carries_last_observation(spark):
    df = spark.createDataFrame(
        [
            (1, 1, 10.0),
            (1, 2, None),
            (1, 3, None),
            (1, 4, 40.0),
            (2, 1, None),  # leading null stays null
            (2, 2, 7.0),
        ],
        ["user", "seq", "v"],
    )
    out = forward_fill(df, "v", "seq", "user")
    got = {(r["user"], r["seq"]): r["v"] for r in out.collect()}
    assert got == {
        (1, 1): 10.0,
        (1, 2): 10.0,
        (1, 3): 10.0,
        (1, 4): 40.0,
        (2, 1): None,
        (2, 2): 7.0,
    }


# ---------------------------------------------------------------------------
# trend
# ---------------------------------------------------------------------------


def test_trend_recovers_exact_line(spark):
    from datetime import datetime

    from kaylee_spark.operators.timeseries import trend

    # y = 2x + 5 over days 0..9, single group: exact recovery
    rows = [
        ("g", datetime(2024, 1, 1 + d, 12, 0), 5.0 + 2.0 * d) for d in range(10)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = trend(df, "ts", "v", ["k"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 10
    assert abs(r["slope_per_day"] - 2.0) < 1e-9
    assert abs(r["intercept"] - 5.0) < 1e-9


def test_trend_single_aggregate_plan(spark):
    from datetime import datetime

    from kaylee_spark.operators.timeseries import trend

    df = spark.createDataFrame(
        [("g", datetime(2024, 1, 1), 1.0), ("g", datetime(2024, 1, 2), 2.0)],
        ["k", "ts", "v"],
    )
    plan = trend(df, "ts", "v", ["k"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") + plan.count("LocalRelation") == 1


# ---------------------------------------------------------------------------
# rollup_cascade
# ---------------------------------------------------------------------------


def test_rollup_cascade_levels_sum_consistently(spark):
    from datetime import datetime

    from kaylee_spark.operators.timeseries import rollup_cascade

    rows = [
        ("a", datetime(2024, 1, 1, h, m), 1.5)
        for h in range(0, 12)
        for m in (0, 30)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = rollup_cascade(df, "ts", "v", ["1 hour", "6 hours", "1 day"], ["k"]).collect()
    by_res = {}
    for r in out:
        by_res.setdefault(r["resolution"], []).append(r)
    assert len(by_res["1 hour"]) == 12
    assert len(by_res["6 hours"]) == 2
    assert len(by_res["1 day"]) == 1
    # every level carries the SAME totals
    for res, rows_ in by_res.items():
        assert sum(r["n_events"] for r in rows_) == 24, res
        assert abs(sum(r["total_value"] for r in rows_) - 36.0) < 1e-9, res


def test_rollup_cascade_single_raw_scan(spark):
    from datetime import datetime

    from kaylee_spark.operators.timeseries import rollup_cascade

    df = spark.createDataFrame([("a", datetime(2024, 1, 1), 1.0)], ["k", "ts", "v"])
    out = rollup_cascade(df, "ts", "v", ["1 hour", "6 hours"], ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every union branch must read the MATERIALIZED level, not rebuild
    # from raw (Spark does not dedupe common subplans across a union)
    assert plan.count("InMemoryTableScan") >= 2


def test_rollup_cascade_rejects_non_multiple_steps(spark):
    from datetime import datetime

    import pytest as _pytest

    from kaylee_spark.operators.timeseries import rollup_cascade

    df = spark.createDataFrame([("a", datetime(2024, 1, 1), 1.0)], ["k", "ts", "v"])
    with _pytest.raises(ValueError, match="integer multiples"):
        rollup_cascade(df, "ts", "v", ["1 hour", "90 minutes"], ["k"])


def test_rollup_cascade_equals_direct_aggregation_on_random_data(spark):
    """Every cascaded level must be bit-identical to aggregating the
    raw data directly at that resolution — on adversarial data too
    (negative values, sub-cent decimals, sparse hours)."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from kaylee_spark.operators.timeseries import rollup_cascade

    rng = random.Random(42)
    base = datetime(2024, 3, 1)
    rows = [
        (
            rng.choice(["a", "b"]),
            base + timedelta(seconds=rng.randrange(0, 3 * 86400)),
            rng.uniform(-100, 100),
        )
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = rollup_cascade(df, "ts", "v", ["1 hour", "6 hours", "1 day"], ["k"])
    for step, trunc in (("1 hour", "hour"), ("6 hours", None), ("1 day", "day")):
        got = sorted(
            (r["k"], r["bucket"], r["n_events"], r["total_value"])
            for r in out.filter(F.col("resolution") == step).collect()
        )
        if trunc:
            bucket = F.date_trunc(trunc, "ts").cast("timestamp_ntz")
        else:
            bucket = F.expr(
                "timestampadd(SECOND, CAST(floor(timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 21600) * 21600 AS BIGINT),"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            )
        want = sorted(
            (r["k"], r["bucket"], r["n_events"], r["total_value"])
            for r in df.groupBy("k", bucket.alias("bucket"))
            .agg(
                F.count("v").alias("n_events"),
                F.round(F.sum(F.col("v").cast("decimal(24,6)")), 2).cast("double").alias("total_value"),
            )
            .collect()
        )
        assert got == want, step


# ---------------------------------------------------------------------------
# linear_interpolate
# ---------------------------------------------------------------------------


def test_linear_interpolate_time_weighted_gap(spark):
    from kaylee_spark.operators.timeseries import linear_interpolate

    # anchors at 00:00 (v=10) and 00:30 (v=40); null at 00:10 sits a
    # third of the way through the gap -> 10 + 30 * (1/3) = 20
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00"), 10.0),
            (1, ts("2024-01-01 00:10"), None),
            (1, ts("2024-01-01 00:30"), 40.0),
        ],
        ["user", "t", "v"],
    )
    out = linear_interpolate(df, "v", "t", "user")
    got = {r["t"]: r["v_filled"] for r in out.collect()}
    assert got[ts("2024-01-01 00:00")] == 10.0
    assert got[ts("2024-01-01 00:10")] == 20.0
    assert got[ts("2024-01-01 00:30")] == 40.0


def test_linear_interpolate_edge_nulls_take_nearest_anchor(spark):
    from kaylee_spark.operators.timeseries import linear_interpolate

    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00"), None),  # leading -> next anchor
            (1, ts("2024-01-01 00:10"), 5.0),
            (1, ts("2024-01-01 00:20"), None),  # trailing -> prev anchor
            (2, ts("2024-01-01 00:00"), None),  # all-null key stays null
        ],
        ["user", "t", "v"],
    )
    out = linear_interpolate(df, "v", "t", "user")
    got = {(r["user"], r["t"]): r["v_filled"] for r in out.collect()}
    assert got[(1, ts("2024-01-01 00:00"))] == 5.0
    assert got[(1, ts("2024-01-01 00:20"))] == 5.0
    assert got[(2, ts("2024-01-01 00:00"))] is None


def test_linear_interpolate_equal_timestamp_anchors_take_previous(spark):
    from kaylee_spark.operators.timeseries import linear_interpolate

    # both anchors and the null share one timestamp: ratio is 0/0, the
    # documented contract says the previous anchor wins
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00"), 1, 3.0),
            (1, ts("2024-01-01 00:00"), 2, None),
            (1, ts("2024-01-01 00:00"), 3, 9.0),
        ],
        ["user", "t", "seq", "v"],
    )
    out = linear_interpolate(df, "v", "t", "user", tiebreak_cols=["seq"])
    got = {r["seq"]: r["v_filled"] for r in out.collect()}
    assert got == {1: 3.0, 2: 3.0, 3: 9.0}


def test_linear_interpolate_single_exchange_plan(spark):
    from kaylee_spark.operators.timeseries import linear_interpolate

    df = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00"), 1.0)], ["user", "t", "v"]
    )
    plan = linear_interpolate(df, "v", "t", "user")._jdf.queryExecution().executedPlan().toString()
    # both window frames must share ONE partition+sort, not shuffle twice
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# rolling_zscore
# ---------------------------------------------------------------------------


def test_rolling_zscore_flags_planted_spike(spark):
    from kaylee_spark.operators.timeseries import rolling_zscore

    # mildly noisy history (sd = 1) so the window is non-degenerate,
    # then a spike; scoring is vs the PRECEDING window, so the spike
    # cannot dilute its own z
    rows = [(1, ts(f"2024-01-01 00:{m:02d}"), 10.0 + (m % 2) * 2) for m in range(10)]
    rows[7] = (1, ts("2024-01-01 00:07"), 500.0)  # the spike
    df = spark.createDataFrame(rows, ["user", "t", "v"])
    out = rolling_zscore(df, "v", "t", "user", window_rows=20).collect()
    flagged = {r["t"]: r["is_anomaly"] for r in out}
    assert flagged[ts("2024-01-01 00:07")] is True
    assert sum(flagged.values()) == 1  # nothing else trips, incl. post-spike rows


def test_rolling_zscore_constant_series_never_flags(spark):
    from kaylee_spark.operators.timeseries import rolling_zscore

    df = spark.createDataFrame(
        [(1, ts(f"2024-01-01 00:{m:02d}"), 7.0) for m in range(5)],
        ["user", "t", "v"],
    )
    out = rolling_zscore(df, "v", "t", "user").collect()
    assert all(r["z"] is None for r in out)        # sd == 0 -> degenerate
    assert all(r["is_anomaly"] is False for r in out)  # flag never null


def test_rolling_zscore_window_is_trailing_and_bounded(spark):
    from kaylee_spark.operators.timeseries import rolling_zscore

    # window_rows=3: at 00:03 the window is {100, 10, 10} — the old
    # spike at 00:00 must have slid out by 00:04 where it's {10,10,10}
    rows = [
        (1, ts("2024-01-01 00:00"), 100.0),
        (1, ts("2024-01-01 00:01"), 10.0),
        (1, ts("2024-01-01 00:02"), 10.0),
        (1, ts("2024-01-01 00:03"), 10.0),
        (1, ts("2024-01-01 00:04"), 10.0),
    ]
    out = rolling_zscore(
        spark.createDataFrame(rows, ["user", "t", "v"]), "v", "t", "user", window_rows=3
    ).collect()
    got = {r["t"]: r["z"] for r in out}
    assert got[ts("2024-01-01 00:03")] is not None  # spike still in window
    assert got[ts("2024-01-01 00:04")] is None      # constant window again


def test_rolling_zscore_near_degenerate_window_clamps_z(spark):
    from kaylee_spark.operators.timeseries import rolling_zscore

    # A history that is constant except for one value 0.01 away (the
    # 2-dp quantum) leaves sd tiny but nonzero; an unclamped z on the
    # spike row would be ~1e9, where one double ulp beats the 6-dp
    # ROUND quantum and engines can disagree in the last digit (the
    # round-6 e23 sf0.1 escape). The clamp pins it to exactly 1e6.
    rows = [(1, ts(f"2024-01-01 00:{m:02d}"), 10.0) for m in range(20)]
    rows[10] = (1, ts("2024-01-01 00:10"), 10.01)
    rows.append((1, ts("2024-01-01 00:20"), 5000.0))  # the spike
    df = spark.createDataFrame(rows, ["user", "t", "v"])
    out = {r["t"]: r for r in rolling_zscore(df, "v", "t", "user").collect()}
    spike = out[ts("2024-01-01 00:20")]
    assert spike["z"] == 1e6
    assert spike["is_anomaly"] is True


def test_rolling_zscore_single_exchange_plan(spark):
    from kaylee_spark.operators.timeseries import rolling_zscore

    df = spark.createDataFrame([(1, ts("2024-01-01 00:00"), 1.0)], ["user", "t", "v"])
    plan = rolling_zscore(df, "v", "t", "user")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# ewma
# ---------------------------------------------------------------------------


def test_ewma_matches_pandas_adjusted(spark):
    import pandas as pd

    from kaylee_spark.operators.timeseries import ewma

    vals = [10.0, 20.0, 5.0, 40.0, 15.0, 30.0]
    df = spark.createDataFrame(
        [(1, ts(f"2024-01-01 00:{m:02d}"), v) for m, v in enumerate(vals)],
        ["user", "t", "v"],
    )
    out = ewma(df, "v", "t", "user", alpha=0.5, max_lags=24)
    got = [r["v_ewma"] for r in out.orderBy("t").collect()]
    want = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    # series shorter than max_lags -> identical to untruncated pandas
    assert got == [round(x, 6) for x in want]


def test_ewma_truncation_and_null_handling(spark):
    from kaylee_spark.operators.timeseries import ewma

    # max_lags=2: row 3 sees only {v3, v2}; null v2 drops out of both
    # numerator and denominator (weights renormalize over what's there)
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00"), 100.0),
            (1, ts("2024-01-01 00:01"), None),
            (1, ts("2024-01-01 00:02"), 30.0),
        ],
        ["user", "t", "v"],
    )
    out = ewma(df, "v", "t", "user", alpha=0.5, max_lags=2)
    got = {r["t"]: r["v_ewma"] for r in out.collect()}
    assert got[ts("2024-01-01 00:00")] == 100.0
    assert got[ts("2024-01-01 00:01")] == 100.0   # only the lag survives
    assert got[ts("2024-01-01 00:02")] == 30.0    # null lag contributes nothing


def test_ewma_contract_errors_and_plan(spark):
    import pytest

    from kaylee_spark.operators.timeseries import ewma

    df = spark.createDataFrame([(1, ts("2024-01-01 00:00"), 1.0)], ["user", "t", "v"])
    with pytest.raises(ValueError):
        ewma(df, "v", "t", "user", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, "v", "t", "user", max_lags=0)
    plan = ewma(df, "v", "t", "user")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # 24 lags ride one sort


# ---------------------------------------------------------------------------
# autocorrelation
# ---------------------------------------------------------------------------


def _rows_to_ts(i):
    from datetime import datetime, timedelta

    return datetime(2024, 1, 1) + timedelta(minutes=i)


def test_acf_matches_numpy_reference(spark):
    import numpy as np

    from kaylee_spark.operators.timeseries import autocorrelation

    rng = np.random.default_rng(9)
    vals = np.round(rng.uniform(1, 50, size=120), 2)
    rows = [(i, _rows_to_ts(i), "k", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    out = autocorrelation(
        df, "value", "ts", "key", lags=[1, 2], tiebreak_cols=["event_id"]
    ).collect()[0]
    m = vals.mean()
    den = ((vals - m) ** 2).sum()
    for k in (1, 2):
        ref = ((vals[k:] - m) * (vals[:-k] - m)).sum() / den
        assert abs(out[f"acf_{k}"] - ref) < 1e-6
    assert out["n"] == 120


def test_acf_detects_planted_period(spark):
    from kaylee_spark.operators.timeseries import autocorrelation

    # period-4 sawtooth: lag 4 correlates perfectly, lag 2 anti-correlates
    rows = [
        (i, _rows_to_ts(i), "k", float([1.0, 5.0, 9.0, 5.0][i % 4]))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    out = autocorrelation(
        df, "value", "ts", "key", lags=[2, 4], tiebreak_cols=["event_id"]
    ).collect()[0]
    assert out["acf_4"] > 0.95
    assert out["acf_2"] < -0.95


def test_acf_constant_and_short_series_null(spark):
    import pytest

    from kaylee_spark.operators.timeseries import autocorrelation

    rows = [(i, _rows_to_ts(i), "const", 7.0) for i in range(10)]
    rows += [(i, _rows_to_ts(i), "short", float(i)) for i in range(2)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    out = {
        r["key"]: r
        for r in autocorrelation(
            df, "value", "ts", "key", lags=[1, 3], tiebreak_cols=["event_id"]
        ).collect()
    }
    assert out["const"]["acf_1"] is None  # zero variance
    assert out["short"]["acf_3"] is None  # no lag-3 pairs
    with pytest.raises(ValueError):
        autocorrelation(df, "value", "ts", "key", lags=[0])
    with pytest.raises(ValueError):
        autocorrelation(df, "value", "ts", "key", lags=[1, 1])


def test_acf_single_exchange_plan(spark):
    from kaylee_spark.operators.timeseries import autocorrelation

    rows = [(i, _rows_to_ts(i), "k" + str(i % 3), float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    plan = autocorrelation(
        df, "value", "ts", "key", tiebreak_cols=["event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    # all lag columns + the aggregate ride ONE key-hash exchange
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# cusum
# ---------------------------------------------------------------------------


def _ref_cusum(vals, slack, threshold):
    """Textbook recursion, exact integer replay of the operator math."""
    cents = [round(v * 100) for v in vals]
    n, s = len(cents), sum(cents)
    st, out = 0, []
    for c in cents:
        st = max(0, st + (n * c - s - n * round(slack * 100)))
        out.append((st / (n * 100.0), st > n * round(threshold * 100)))
    return out


def test_cusum_matches_recursive_reference(spark):
    import random

    from kaylee_spark.operators.timeseries import cusum

    rng = random.Random(21)
    vals = [round(rng.uniform(1, 30), 2) for _ in range(150)]
    rows = [(i, _rows_to_ts(i), "k", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    got = [
        (r["cusum"], r["is_shift"])
        for r in cusum(
            df, "value", "ts", "key", slack=0.5, threshold=5.0,
            tiebreak_cols=["event_id"],
        ).orderBy("event_id").collect()
    ]
    assert got == _ref_cusum(vals, 0.5, 5.0)


def test_cusum_flags_planted_mean_shift(spark):
    from kaylee_spark.operators.timeseries import cusum

    # stable around 10, then the mean jumps to 18 halfway
    vals = [10.0 + (i % 3) * 0.1 for i in range(60)]
    vals += [18.0 + (i % 3) * 0.1 for i in range(60)]
    rows = [(i, _rows_to_ts(i), "k", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    out = cusum(
        df, "value", "ts", "key", slack=0.5, threshold=5.0,
        tiebreak_cols=["event_id"],
    ).orderBy("event_id").collect()
    flags = [r["is_shift"] for r in out]
    assert not any(flags[:60])          # quiet before the shift
    assert any(flags[60:])              # fires after it
    first = flags.index(True)
    assert 60 <= first <= 75            # and promptly
    assert all(flags[first:])           # one-sided chart stays latched here


def test_cusum_contract_and_single_exchange(spark):
    import pytest

    from kaylee_spark.operators.timeseries import cusum

    rows = [(i, _rows_to_ts(i), "k" + str(i % 3), float(i % 7)) for i in range(30)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, key string, value double"
    )
    with pytest.raises(ValueError):
        cusum(df, "value", "ts", "key", slack=-0.1)
    with pytest.raises(ValueError):
        cusum(df, "value", "ts", "key", threshold=0)
    plan = cusum(
        df, "value", "ts", "key", tiebreak_cols=["event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_seasonal_zscore_uses_hour_bucket_baseline(spark):
    from kaylee_spark.operators.timeseries import seasonal_zscore

    # 9am history is {10.0 x30, spike 100.0}; 10am history is constant
    # 100.0 -> the SAME value 100.0 is anomalous at 9am, normal at
    # 10am. 30 baseline points matter: the bucket baseline INCLUDES
    # the spike, which caps a lone outlier's z near sqrt(n).
    rows = [(1, ts(f"2024-01-{d:02d} 09:00"), 10.0) for d in range(1, 31)]
    rows.append((1, ts("2024-02-01 09:00"), 100.0))
    rows += [(1, ts(f"2024-01-0{d} 10:00"), 100.0) for d in range(1, 6)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {(r["hod"], r["v"]): r for r in seasonal_zscore(df, "v", "t", "k").collect()}
    spike = out[(9, 100.0)]
    calm = out[(10, 100.0)]
    assert spike["is_anomaly"] is True and spike["z"] > 2.0
    # constant bucket -> sd 0 -> null z, not anomalous
    assert calm["z"] is None and calm["is_anomaly"] is False
    # the 9am baseline rows score slightly negative, not anomalous
    assert out[(9, 10.0)]["is_anomaly"] is False


def test_seasonal_zscore_hand_computed_bits(spark):
    import math

    from kaylee_spark.operators.timeseries import seasonal_zscore

    vals = [2.0, 4.0, 6.0, 8.0]
    rows = [(1, ts(f"2024-01-0{i+1} 07:30"), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    n = len(vals)
    sv, svv = sum(vals), sum(v * v for v in vals)
    mean = sv / n
    sd = math.sqrt(max((svv - sv * sv / n) / n, 0.0))
    out = {r["v"]: r["z"] for r in seasonal_zscore(df, "v", "t", "k").collect()}
    for v in vals:
        assert out[v] == round(max(min((v - mean) / sd, 1e6), -1e6), 6)
