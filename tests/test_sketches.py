"""KMV sketch: partition-layout invariance (exact mergeability) and
estimate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators.sketches import (
    kmv_distinct,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], "g string, v int"
    )
    out = kmv_distinct(df, "g", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    # 10 < k distinct values → sketch is lossless: exact count
    assert r.n_kmv == 10 and r.est_distinct == 10.0


def test_kmv_partition_invariant_and_accurate(spark):
    # 2000 distinct values in one group, k=64 → estimate within ~25%
    base = spark.range(2000).select(
        F.lit("g1").alias("g"), F.col("id").alias("v")
    )
    one = kmv_distinct(base.coalesce(1), "g", "v", k=64)
    many = kmv_distinct(base.repartition(13), "g", "v", k=64)
    direct = kmv_distinct(base, "g", "v", k=64, partial_per_partition=False)
    r1, r2, r3 = _rows(one), _rows(many), _rows(direct)
    # k-smallest is exactly mergeable: any partitioning, with or without
    # the partial pass, produces the identical sketch and estimate
    assert r1 == r2 == r3
    est = r1[0][2]
    assert 1500 < est < 2500


def test_kmv_multiple_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(500)] + [("b", i) for i in range(30)],
        "g string, v int",
    )
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["b"].est_distinct == 30.0  # below k → exact
    assert 300 < out["a"].est_distinct < 800


def test_binned_quantiles_accuracy_and_layout_invariance(spark):
    from _data_engineering_pipeline_project_spark.operators.sketches import (
        binned_quantiles,
    )

    # uniform 0..9999 → p50 ≈ 5000, p99 ≈ 9900; bin width = 9999/256 ≈ 39
    base = spark.range(10_000).select(
        F.lit("u").alias("g"), F.col("id").cast("double").alias("v")
    )
    est1 = _rows(binned_quantiles(base.coalesce(1), "g", "v"))
    est2 = _rows(binned_quantiles(base.repartition(17), "g", "v"))
    # bin counts are associative: identical output under any layout
    assert est1 == est2
    by_p = {r[1]: r[2] for r in est1}
    assert abs(by_p[0.5] - 5000) < 80  # within ~2 bin widths
    assert abs(by_p[0.99] - 9900) < 80


def test_binned_quantiles_constant_group(spark):
    from _data_engineering_pipeline_project_spark.operators.sketches import (
        binned_quantiles,
    )

    df = spark.createDataFrame([("c", 42.0)] * 5, "g string, v double")
    rows = binned_quantiles(df, "g", "v").collect()
    assert len(rows) == 3 and all(r.quantile_est == 42.0 for r in rows)


def test_kmv_maintainer_time_merge_equals_oneshot(spark, tmp_path):
    """Streaming maintenance across micro-batches produces EXACTLY the
    one-shot sketch over the union — batch boundaries are invisible
    (k-smallest is a monoid in time as well as space). Also restart-safe:
    a reopened maintainer resumes the committed state."""
    from _data_engineering_pipeline_project_spark.streaming.sketchmaint import (
        KmvMaintainer,
    )

    b1 = spark.createDataFrame(
        [("t", i) for i in range(300)], "g string, v long"
    )
    b2 = spark.createDataFrame(
        [("t", i) for i in range(200, 600)] + [("u", 1), ("u", 2)],
        "g string, v long",
    )
    m = KmvMaintainer(spark, str(tmp_path / "kmv"), "g", "v", k=64)
    m.merge_batch(b1, 0)
    m.merge_batch(b2, 1)
    maintained = _rows(m.estimates())

    oneshot = _rows(kmv_distinct(b1.unionByName(b2), "g", "v", k=64))
    assert maintained == oneshot

    # restart: fresh maintainer over the same dir sees the same state
    m2 = KmvMaintainer(spark, str(tmp_path / "kmv"), "g", "v", k=64)
    assert m2.version == 2
    assert _rows(m2.estimates()) == maintained


def test_kmv_maintainer_streaming_available_now(spark, tmp_path):
    """End-to-end through a real file stream: two parquet drops, two
    run_available_now invocations (cron-style), state accumulates."""
    from _data_engineering_pipeline_project_spark.streaming.sketchmaint import (
        KmvMaintainer,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [("a", i) for i in range(100)], "g string, v long"
    ).write.mode("append").parquet(str(src))

    m = KmvMaintainer(spark, str(tmp_path / "state"), "g", "v", k=32)
    schema = spark.read.parquet(str(src)).schema
    m.run_available_now(str(src), schema, str(tmp_path / "ckpt"))
    first = {r.g: r.est_distinct for r in m.estimates().collect()}
    assert 50 < first["a"] < 200

    spark.createDataFrame(
        [("a", i) for i in range(100, 150)], "g string, v long"
    ).write.mode("append").parquet(str(src))
    m.run_available_now(str(src), schema, str(tmp_path / "ckpt"))
    final = {r.g: r.est_distinct for r in m.estimates().collect()}
    assert final["a"] > first["a"] * 1.1  # new distincts reflected


def test_cm_sketch_merge_and_overestimate(spark):
    from _data_engineering_pipeline_project_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_counters,
    )

    rows = [(i % 7,) for i in range(700)] + [(99,)] * 50
    df = spark.createDataFrame(rows, "v long")
    counters = cm_sketch_counters(df, "v", depth=4, width=64)
    # counter matrix is bounded: at most depth*width rows
    assert counters.count() <= 4 * 64
    # counters are additive: two halves merge to the whole
    h1 = cm_sketch_counters(
        spark.createDataFrame(rows[:300], "v long"), "v", depth=4, width=64
    )
    h2 = cm_sketch_counters(
        spark.createDataFrame(rows[300:], "v long"), "v", depth=4, width=64
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.j, r.bucket): r.cnt for r in counters.collect()}
    assert {(r.j, r.bucket): r.cnt for r in merged.collect()} == full

    items = df.select("v").distinct()
    est = {
        r.v: r.cm_est
        for r in cm_estimate(items, counters, "v", depth=4, width=64).collect()
    }
    # CM never underestimates
    exact = {r.v: r.n for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    for v, n in exact.items():
        assert est[v] >= n


def test_binned_quantiles_error_bound_property(spark):
    """For arbitrary value sets, the estimate is within one bin width of
    an exact rank statistic (the sketch's documented error bound)."""
    from hypothesis import given, settings, strategies as st

    from _data_engineering_pipeline_project_spark.operators.sketches import (
        binned_quantiles,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=2,
            max_size=200,
        )
    )
    def check(vals):
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        est = {
            r.p: r.quantile_est
            for r in binned_quantiles(df, "g", "v", probs=(0.5, 0.9)).collect()
        }
        s = sorted(vals)
        width = (s[-1] - s[0]) / 256.0
        for p, e in est.items():
            # exact rank-p value (ceil rank, 1-indexed)
            import math

            exact = s[max(0, math.ceil(p * len(s)) - 1)]
            # the estimate is rounded to 6 dp for oracle parity, so for
            # ranges smaller than ~1e-6 the ROUNDING (5e-7), not the bin
            # width, bounds the error (hypothesis found range=FLT_EPSILON)
            assert abs(e - exact) <= max(width * 1.5, 5.1e-7), (p, e, exact)

    check()


def test_histogram_maintainer_time_merge(spark, tmp_path):
    """Fixed-range bin counts are a monoid in time: maintained quantiles
    equal the single-shot histogram over the concatenation, and restart
    resumes committed state."""
    from _data_engineering_pipeline_project_spark.streaming.sketchmaint import (
        HistogramMaintainer,
    )

    m = HistogramMaintainer(
        spark, str(tmp_path / "h"), "g", "v", lo=0.0, hi=1000.0, bins=100
    )
    b1 = spark.createDataFrame(
        [("t", float(i)) for i in range(500)], "g string, v double"
    )
    b2 = spark.createDataFrame(
        [("t", float(i)) for i in range(500, 1000)], "g string, v double"
    )
    m.merge_batch(b1, 0)
    m.merge_batch(b2, 1)
    q = {r.p: r.quantile_est for r in m.quantiles().collect()}
    assert abs(q[0.5] - 500) < 20 and abs(q[0.99] - 990) < 20

    one = HistogramMaintainer(
        spark, str(tmp_path / "h1"), "g", "v", lo=0.0, hi=1000.0, bins=100
    )
    one.merge_batch(b1.unionByName(b2), 0)
    assert _rows(m.quantiles()) == _rows(one.quantiles())

    m2 = HistogramMaintainer(
        spark, str(tmp_path / "h"), "g", "v", lo=0.0, hi=1000.0, bins=100
    )
    assert m2.version == 2
    assert _rows(m2.quantiles()) == _rows(m.quantiles())


def test_maintainers_ignore_redelivered_batch(spark, tmp_path):
    """foreachBatch is at-least-once: re-merging an already-committed
    batch id is a no-op for both maintainers (exactly-once by
    construction, not by luck)."""
    from _data_engineering_pipeline_project_spark.streaming.sketchmaint import (
        HistogramMaintainer,
        KmvMaintainer,
    )

    b = spark.createDataFrame(
        [("t", float(i)) for i in range(100)], "g string, v double"
    )
    h = HistogramMaintainer(
        spark, str(tmp_path / "h"), "g", "v", lo=0.0, hi=100.0, bins=10
    )
    h.merge_batch(b, 0)
    before = _rows(h.quantiles())
    h.merge_batch(b, 0)  # redelivery: must not double-count
    assert h.version == 1
    assert _rows(h.quantiles()) == before

    m = KmvMaintainer(spark, str(tmp_path / "k"), "g", "v", k=16)
    m.merge_batch(b, 0)
    v = m.version
    m.merge_batch(b, 0)
    assert m.version == v


def test_maintainer_crash_before_commit_is_invisible(spark, tmp_path):
    """A state version written but not pointer-committed (crash between
    write and os.replace) is ignored on restart — the reader resumes the
    last committed version (same protocol guarantee Scd2Table pins)."""
    from _data_engineering_pipeline_project_spark.streaming.sketchmaint import (
        KmvMaintainer,
    )

    b = spark.createDataFrame(
        [("t", i) for i in range(50)], "g string, v long"
    )
    m = KmvMaintainer(spark, str(tmp_path / "k"), "g", "v", k=16)
    m.merge_batch(b, 0)
    committed = _rows(m.estimates())

    # simulate a crash: orphan v2 state exists, pointer still says v1
    m._batch_sketch(
        spark.createDataFrame([("t", 999)], "g string, v long")
    ).write.mode("overwrite").parquet(str(tmp_path / "k" / "kmv_v2"))

    m2 = KmvMaintainer(spark, str(tmp_path / "k"), "g", "v", k=16)
    assert m2.version == 1
    assert _rows(m2.estimates()) == committed
    # and the next merge OVERWRITES the orphan rather than tripping on it
    m2.merge_batch(
        spark.createDataFrame([("t", 123)], "g string, v long"), 1
    )
    assert m2.version == 2
