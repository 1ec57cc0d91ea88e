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
