"""Unit + property tests for the bucketed two-pass prefix primitive
(`functions/twopass.py`) — the scale-safe replacement for unpartitioned
cumulative windows now load-bearing under pareto_8020_customers,
rfm_segmentation_events, ks_two_sample_events and mann_whitney_events.

The oracle inside each test is the very global-window plan the helper
replaces, so equality here IS the semantic contract: same ranks, same
prefix sums, for any bucket count, under ties, skew, negatives,
doubles, and frames smaller than the bucket fan-out."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.functions.twopass import (
    bucketed_cumulative,
)


def _reference(spark, rows):
    """Global-window oracle: rank + inclusive cumsum over (k, id)."""
    df = spark.createDataFrame(rows, "id int, k int, x int")
    w = Window.orderBy("k", "id")
    ref = df.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cx"
        ),
    )
    return {r["id"]: (r["rk"], r["cx"]) for r in ref.collect()}


def _twopass(spark, rows, buckets):
    df = spark.createDataFrame(rows, "id int, k int, x int")
    out = bucketed_cumulative(
        df, ["k", "id"], sums={"x": "cx"}, rank_col="rk", buckets=buckets
    )
    return {r["id"]: (r["rk"], r["cx"]) for r in out.collect()}


def test_matches_global_window_with_ties_and_negatives(spark):
    rows = [
        (1, 5, 10),
        (2, 5, -3),   # tie on leading key → same bucket, id breaks tie
        (3, -7, 4),   # negative leading key
        (4, 0, 0),
        (5, 12, 7),
        (6, 5, 1),    # triple tie
    ]
    for buckets in (1, 2, 4, 64):
        assert _twopass(spark, rows, buckets) == _reference(spark, rows)


def test_single_row_and_constant_key(spark):
    assert _twopass(spark, [(1, 3, 9)], 8) == _reference(spark, [(1, 3, 9)])
    # span == 0: every row lands in bucket 0 (degrades to the single
    # sort it replaces — never worse, never wrong)
    rows = [(i, 42, i) for i in range(1, 8)]
    assert _twopass(spark, rows, 16) == _reference(spark, rows)


def test_skewed_leading_key(spark):
    # one hot value + a spread tail: hot bucket is wide but ordering and
    # offsets stay exact
    rows = [(i, 1, 1) for i in range(1, 20)] + [
        (100, 1000, 5),
        (101, 2000, 5),
    ]
    assert _twopass(spark, rows, 4) == _reference(spark, rows)


def test_count_col_and_double_keys(spark):
    df = spark.createDataFrame(
        [(1, 0.5, 2), (2, 0.25, 3), (3, 1.75, 4)], "id int, k double, x int"
    )
    out = bucketed_cumulative(
        df, ["k", "id"], sums={"x": "cx"}, rank_col="rk", count_col="n",
        buckets=8,
    )
    got = {r["id"]: (r["rk"], r["cx"], r["n"]) for r in out.collect()}
    assert got == {2: (1, 3, 3), 1: (2, 5, 3), 3: (3, 9, 3)}


def test_no_unpartitioned_window_in_plan(spark):
    """The helper's entire point: no single-partition WindowExec. Every
    window in the physical plan must carry a partition spec."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit(1).alias("x")
    )
    out = bucketed_cumulative(
        df, ["k", "id"], sums={"x": "cx"}, rank_col="rk", buckets=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # a partitioned window spec lists partition expressions
            # before the ORDER BY clause inside windowspecdefinition
            assert "_tp_bkt" in line, f"unpartitioned window: {line}"


def test_exclusive_prefix_max_matches_global_window(spark):
    """prev_maxes: exclusive running max, NULL on the global first row,
    identical to the rowsBetween(-inf, -1) window it replaces."""
    rows = [(1, 5, 10), (2, 3, 40), (3, 3, 2), (4, 9, 1), (5, -2, 7)]
    df = spark.createDataFrame(rows, "id int, k int, y int")
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["id"]: r["pm"]
        for r in df.select("id", F.max("y").over(w).alias("pm")).collect()
    }
    for buckets in (1, 2, 4, 64):
        got = {
            r["id"]: r["pm"]
            for r in bucketed_cumulative(
                df, ["k", "id"], prev_maxes={"y": "pm"}, buckets=buckets
            ).collect()
        }
        assert got == ref
    assert ref[5] is None  # smallest key: no strictly-preceding row


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(                                 # leading key:
                st.none(),                             # NULLs (bin first)
                st.integers(min_value=-50, max_value=50),  # ties!
            ),
            st.integers(min_value=-5, max_value=5),    # summed value
        ),
        min_size=1,
        max_size=25,
    ),
    buckets=st.sampled_from([1, 3, 8, 32]),
)
def test_property_equals_global_window(spark, rows, buckets):
    data = [(i, k, x) for i, (k, x) in enumerate(rows)]
    assert _twopass(spark, data, buckets) == _reference(spark, data)


def test_null_numeric_leading_key_bins_first(spark):
    """A NULL numeric leading key must rank exactly where the global
    window puts it — FIRST (nulls-first ascending), not silently in the
    last bucket (the F.least-skips-nulls trap)."""
    rows = [(1, 5, 10), (2, None, 3), (3, -7, 4), (4, None, 1), (5, 12, 7)]
    df = spark.createDataFrame(rows, "id int, k int, x int")
    w = Window.orderBy("k", "id")
    ref = {
        r["id"]: (r["rk"], r["cx"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rk"),
            F.sum("x")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cx"),
        ).collect()
    }
    for buckets in (1, 2, 4, 64):
        for eq in (False, True):
            got = {
                r["id"]: (r["rk"], r["cx"])
                for r in bucketed_cumulative(
                    df,
                    ["k", "id"],
                    sums={"x": "cx"},
                    rank_col="rk",
                    buckets=buckets,
                    equi_depth=eq,
                ).collect()
            }
            assert got == ref, (buckets, eq)
    # nulls really are the first ranks
    assert {ref[2][0], ref[4][0]} == {1, 2}


def test_nan_double_leading_key_bins_last(spark):
    """NaN doubles order AFTER every value in Spark — and must not
    poison the [min, max] envelope (NaN max would NaN the span)."""
    rows = [
        (1, 5.0, 1),
        (2, float("nan"), 1),
        (3, -7.5, 1),
        (4, None, 1),
        (5, float("nan"), 1),
        (6, 120.25, 1),
    ]
    df = spark.createDataFrame(rows, "id int, k double, x int")
    w = Window.orderBy("k", "id")
    ref = {
        r["id"]: (r["rk"], r["cx"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rk"),
            F.sum("x")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cx"),
        ).collect()
    }
    for buckets in (1, 4, 64):
        for eq in (False, True):
            got = {
                r["id"]: (r["rk"], r["cx"])
                for r in bucketed_cumulative(
                    df,
                    ["k", "id"],
                    sums={"x": "cx"},
                    rank_col="rk",
                    buckets=buckets,
                    equi_depth=eq,
                ).collect()
            }
            assert got == ref, (buckets, eq)
    # NaN rows are the last ranks, NULL the first
    assert ref[4][0] == 1
    assert {ref[2][0], ref[5][0]} == {5, 6}


def test_equi_depth_spreads_adversarial_skew(spark):
    """The fixed-width soft spot: 99% of keys in [0, 1) plus far
    outliers collapses [min, max] splitting into ONE hot bucket.
    Equi-depth boundaries (approxQuantile literals) must restore
    ≥ bucket-count-order parallelism on that distribution — and both
    binnings must still agree with the global window exactly."""
    n = 400
    rows = [(i, (i % 97) / 100.0, 1) for i in range(n)] + [
        (n + 1, 1.0e9, 5),
        (n + 2, 2.0e9, 5),
        (n + 3, 3.0e9, 5),
        (n + 4, 4.0e9, 5),
    ]
    df = spark.createDataFrame(rows, "id int, k double, x int")

    w = Window.orderBy("k", "id")
    ref = {
        r["id"]: (r["rk"], r["cx"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rk"),
            F.sum("x")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cx"),
        ).collect()
    }
    for eq in (False, True):
        got = {
            r["id"]: (r["rk"], r["cx"])
            for r in bucketed_cumulative(
                df, ["k", "id"], sums={"x": "cx"}, rank_col="rk",
                buckets=16, equi_depth=eq,
            ).collect()
        }
        assert got == ref, eq

    # parallelism check: the equi-depth boundary list IS the binning
    # (bucket id = Σ [key >= boundary], literals in the plan). With
    # fixed-width [min, max] splitting, the entire 99% hot range
    # [0, 0.97) falls inside bucket 0 of 16 (width 2.5e8). Equi-depth
    # must place ≥ 10 distinct interior boundaries INSIDE the hot range,
    # i.e. the hot mass spreads across ≥ ~11 buckets.
    probs = [i / 16 for i in range(1, 16)]
    bounds = df.select(F.col("k").alias("_tp_k")).approxQuantile(
        "_tp_k", probs, 0.001
    )
    hot = [b for b in sorted(set(bounds)) if b < 1.0]
    assert len(hot) >= 10, sorted(set(bounds))


def test_string_leading_key_matches_global_window(spark):
    """String leading keys bin by zero-padded byte prefix — must stay
    monotone under binary collation (the 'b' > 'aaa' case a non-padded
    projection gets wrong), tolerate NULLs (sort-first like ''), and
    agree with the global window rank exactly."""
    rows = [
        (1, "b"),
        (2, "aaa"),
        (3, "aab"),
        (4, None),
        (5, ""),
        (6, "aaaaaaaaXXX"),   # ties beyond the 7-byte prefix share a bucket
        (7, "aaaaaaaaYYY"),
        (8, "b"),
    ]
    df = spark.createDataFrame(rows, "id int, k string")
    w = Window.orderBy("k", "id")
    ref = {
        r["id"]: r["rk"]
        for r in df.select("id", F.row_number().over(w).alias("rk")).collect()
    }
    for buckets in (1, 4, 64):
        got = {
            r["id"]: r["rk"]
            for r in bucketed_cumulative(
                df, ["k", "id"], rank_col="rk", buckets=buckets
            ).collect()
        }
        assert got == ref
