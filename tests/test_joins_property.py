"""Property-based tests: the custom join operators vs brute-force
pure-Python references on hypothesis-generated inputs.

The oracle gate covers a08/a09 on the fixture distributions; these
tests cover the operators on adversarial shapes the fixture doesn't
produce — empty sides, all-equal timestamps, keys present on only one
side, intervals that touch at endpoints, zero-width intervals.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kaylee_spark.operators.joins import asof_join, range_join

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=20)
values = st.integers(min_value=-100, max_value=100)


@given(
    left=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
    right=st.lists(st.tuples(keys, times, values), min_size=0, max_size=12),
)
@_settings
def test_asof_backward_matches_reference(spark, left, right):
    # unique (key, time) on the right: backward as-of is otherwise
    # ambiguous about which equal-time row wins (engine picks the last
    # in window order, a tie the reference can't define portably)
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lt long"
    ) if left else spark.createDataFrame([], "lid long, k long, lt long")
    rdf = spark.createDataFrame(right, "k long, rt long, v long") if right else spark.createDataFrame(
        [], "k long, rt long, v long"
    )
    got = {
        r["lid"]: (r["v"], r["rt"])
        for r in asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        want = (None, None) if not cands else (max(cands)[1], max(cands)[0])
        assert got[i] == want, (i, k, t, got[i], want)


@given(
    points=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=12),
    intervals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), st.integers(min_value=0, max_value=10)),
        min_size=0,
        max_size=6,
    ),
)
@_settings
def test_bucketed_range_join_matches_reference(spark, points, intervals):
    ivs = [(i, lo, lo + w) for i, (lo, w) in enumerate(intervals)]
    pdf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "pid long, p double"
    ) if points else spark.createDataFrame([], "pid long, p double")
    idf = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, lo, hi in ivs], "iid long, lo double, hi double"
    ) if ivs else spark.createDataFrame([], "iid long, lo double, hi double")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pdf, idf, left_point="p", right_lo="lo", right_hi="hi", bucket_width=7.0).collect()
    }
    want = {
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, lo, hi in ivs
        if lo <= p <= hi
    }
    assert got == want


intervals_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=15)
    ),
    min_size=0,
    max_size=10,
)


@given(left=intervals_st, right=intervals_st, width=st.sampled_from([1, 3, 7, 50]))
@_settings
def test_interval_overlap_join_matches_bruteforce(spark, left, right, width):
    """Bucketed overlap join == brute-force on adversarial shapes:
    touching endpoints, zero-width intervals, empty sides, widths both
    smaller and larger than every interval. Exactly-once output — the
    first-overlap-bucket dedup must not drop or duplicate pairs."""
    from kaylee_spark.operators.joins import interval_overlap_join

    lrows = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(left)]
    rrows = [(j, lo, lo + ln) for j, (lo, ln) in enumerate(right)]
    expected = sorted(
        (li, rj)
        for (li, llo, lhi) in lrows
        for (rj, rlo, rhi) in rrows
        if llo <= rhi and rlo <= lhi
    )
    ldf = spark.createDataFrame(lrows, ["lid", "lo", "hi"]) if lrows else None
    rdf = spark.createDataFrame(rrows, ["rid", "rlo", "rhi"]) if rrows else None
    if ldf is None or rdf is None:
        assert expected == []
        return
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "lo", "hi", "rlo", "rhi", bucket_width=width
        ).collect()
    )
    assert got == expected
