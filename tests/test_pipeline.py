"""Pipeline-level tests: QualityChecker orchestration over a registry
catalog, error sink, as-of join operator."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators.asof import asof_join
from _data_engineering_pipeline_project_spark.operators.quality import QualityChecker
from _data_engineering_pipeline_project_spark.schema import (
    ForeignKey,
    SchemaRegistry,
    TableSchema,
)
from _data_engineering_pipeline_project_spark.sources.sinks import (
    log_check_summary,
    write_error_sink,
)


def _registry():
    from pyspark.sql import types as T

    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "parent",
            T.StructType(
                [
                    T.StructField("pk", T.IntegerType()),
                    T.StructField("v", T.StringType()),
                ]
            ),
            primary_key=("pk",),
        )
    )
    reg.register(
        TableSchema(
            "child",
            T.StructType(
                [
                    T.StructField("id", T.IntegerType()),
                    T.StructField("fk", T.IntegerType()),
                    T.StructField("amount", T.DoubleType()),
                ]
            ),
            primary_key=("id",),
            foreign_keys=(ForeignKey(("fk",), "parent", ("pk",)),),
        )
    )
    return reg


def test_quality_checker_pipeline(spark, tmp_path):
    reg = _registry()
    tables = {
        "parent": spark.createDataFrame(
            [(1, "a"), (1, "b"), (None, "c"), (2, "d")], "pk int, v string"
        ),
        "child": spark.createDataFrame(
            [(10, 1, 5.0), (11, 99, -2.0), (12, None, -3.0), (10, 2, 1.0)],
            "id int, fk int, amount double",
        ),
    }
    checker = QualityChecker(reg)
    cleaned = checker.run(tables)

    # parent: dup pk=1 deduped (keep-first by v), null pk dropped
    assert sorted(r["pk"] for r in cleaned["parent"].collect()) == [1, 2]
    # child: dup id=10 deduped; orphan fk=99 dropped; null fk kept
    got = {r["id"]: r["fk"] for r in cleaned["child"].collect()}
    assert got == {10: 1, 12: None}
    # negative amount flagged but kept (report-only) → not in cleaned diff
    union = checker.violations_union()
    counts = {(r["check"], r["issue"]) for r in union.collect()}
    assert ("parent.primary_key", "duplicate_pk") in counts
    assert ("parent.primary_key", "null_pk") in counts
    assert ("child.foreign_key", "orphan_fk") in counts
    assert ("child.negative_values", "negative:amount") in counts

    # error sink: one partitioned write, reloadable
    out = str(tmp_path / "errors")
    write_error_sink(union, out)
    back = spark.read.parquet(out)
    assert back.count() == union.count()
    assert "check" in back.columns

    summary = log_check_summary(union)
    assert sum(n for _, _, n in summary) == union.count()


def test_asof_join_semantics(spark):
    t = datetime
    left = spark.createDataFrame(
        [
            (1, t(2024, 1, 10), "l1"),
            (1, t(2024, 1, 20), "l2"),
            (2, t(2024, 1, 5), "l3"),  # before any right row → null match
            (1, t(2024, 1, 15), "l4"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, t(2024, 1, 10), 100.0),  # exactly at l1 → visible to l1
            (1, t(2024, 1, 18), 200.0),
            (2, t(2024, 1, 7), 300.0),
        ],
        "k int, ts timestamp, px double",
    )
    out = {
        r["tag"]: (r["px_asof"], r["ts_asof"])
        for r in asof_join(left, right, ["k"], "ts", "ts").collect()
    }
    assert out["l1"] == (100.0, t(2024, 1, 10))  # tie at ts → right visible
    assert out["l4"] == (100.0, t(2024, 1, 15).replace(day=10))
    assert out["l2"] == (200.0, t(2024, 1, 18))
    assert out["l3"] == (None, None)  # no right row at or before


def test_observed_load_collects_metrics_without_extra_scan(spark, tmp_path):
    import pyspark.sql.functions as F

    from _data_engineering_pipeline_project_spark.pipeline import observed_load

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "id int, v double"
    )
    observed, obs = observed_load(
        df,
        checks={
            "null_v": F.sum(F.col("v").isNull().cast("int")),
            "neg_v": F.sum((F.col("v") < 0).cast("int")),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got == {"n_rows": 3, "null_v": 1, "neg_v": 1}
