"""Unit tests for the quality-check operator library (SURVEY.md §5 item 2):
tiny hand-built frames exercising each check's edge cases — null PK, dup
composite PK, orphan FK, NULL FK kept, emoji, negative value, date
inversion, partial-null timestamp chains."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators import quality as Q


def rows(df, *cols):
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def test_pk_null_and_dup(spark):
    df = spark.createDataFrame(
        [
            (1, "a"),
            (None, "b"),
            (2, "c"),
            (2, "a"),  # dup, later by tiebreak on payload
            (3, "x"),
        ],
        "id int, payload string",
    )
    res = Q.validate_primary_keys(df, ["id"], order_by=["payload"])
    assert rows(res.violations, "id", "payload", "issue") == [
        (2, "c", "duplicate_pk"),
        (None, "b", "null_pk"),
    ]
    assert rows(res.cleaned, "id", "payload") == [(1, "a"), (2, "a"), (3, "x")]


def test_pk_composite(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 1, "z"), (1, None, "n")],
        "k1 int, k2 int, v string",
    )
    res = Q.validate_primary_keys(df, ["k1", "k2"], order_by=["v"])
    assert rows(res.violations, "k1", "k2", "issue") == [
        (1, 1, "duplicate_pk"),
        (1, None, "null_pk"),
    ]
    assert res.cleaned.count() == 2


def test_fk_orphans_dropped_nulls_kept(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "id int, fk int"
    )
    res = Q.validate_foreign_keys(child, ["fk"], parent, ["pk"])
    assert rows(res.violations, "id", "fk") == [(12, 99)]
    # NULL FK row kept — reference dq:151
    assert rows(res.cleaned, "id") == [(10,), (11,), (13,)]


def test_chronology_skip_nulls(spark):
    t = datetime
    df = spark.createDataFrame(
        [
            # ok: strictly increasing
            (1, t(2020, 1, 1), t(2020, 1, 2), t(2020, 1, 3)),
            # c earlier than a, b null → compared against a (null skipped)
            (2, t(2020, 1, 5), None, t(2020, 1, 4)),
            # b earlier than a; c later than b (so only one issue)
            (3, t(2020, 1, 5), t(2020, 1, 4), t(2020, 1, 6)),
            # all null → no issue
            (4, None, None, None),
            # b earlier than a AND c earlier than b → two issues
            (5, t(2020, 1, 9), t(2020, 1, 8), t(2020, 1, 7)),
        ],
        "id int, a timestamp, b timestamp, c timestamp",
    )
    res = Q.check_chronological_order(df, ["a", "b", "c"])
    got = {r["id"]: r["issue"] for r in res.violations.collect()}
    assert got == {2: "a > c", 3: "a > b", 5: "a > b; b > c"}


def test_date_inversion(spark):
    t = datetime
    df = spark.createDataFrame(
        [(1, t(2020, 1, 2), t(2020, 1, 1)), (2, t(2020, 1, 1), t(2020, 1, 2)),
         (3, None, t(2020, 1, 1))],
        "id int, created timestamp, answered timestamp",
    )
    res = Q.check_date_inversion(df, "created", "answered")
    assert rows(res.violations, "id") == [(1,)]


def test_negatives_excludes_coordinates(spark):
    df = spark.createDataFrame(
        [(1, -5.0, -23.5, -46.6), (2, 3.0, -10.0, -50.0)],
        "id int, price double, latitude double, longitude double",
    )
    res = Q.detect_negative_values(df)
    v = rows(res.violations, "id", "issue")
    # price flagged; lat/lng NOT flagged (reference bug dq:332 fixed to intent)
    assert v == [(1, "negative:price")]


def test_null_counts(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, None)], "a int, b string"
    )
    got = dict(Q.check_nulls(df).collect())
    assert got == {"a": 1, "b": 2}


def test_pattern_scan_emoji(spark):
    df = spark.createDataFrame(
        [("hi 😀", "clean"), ("plain", "also clean")], "m string, n string"
    )
    got = dict(Q.detect_pattern_columns(df).collect())
    assert got == {"m": True, "n": False}


def test_required_nulls(spark):
    df = spark.createDataFrame([(1, "x", None), (2, "y", 3)], "id int, a string, b int")
    res = Q.detect_required_nulls(df, ["a", "b"])
    assert rows(res.violations, "id") == [(1,)]
    assert res.cleaned.count() == 2  # report-only: rows kept


def test_value_range(spark):
    df = spark.createDataFrame([(1, 5.0), (2, -1.0), (3, 101.0)], "id int, v double")
    res = Q.check_value_range(df, "v", lo=0, hi=100)
    assert rows(res.violations, "id") == [(2,), (3,)]


def test_type_validation():
    from pyspark.sql import types as T

    from _data_engineering_pipeline_project_spark.schema import TableSchema

    declared = TableSchema(
        "t",
        T.StructType(
            [
                T.StructField("a", T.IntegerType()),
                T.StructField("b", T.StringType()),
                T.StructField("c", T.TimestampType()),
            ]
        ),
    )

    class FakeDF:
        schema = T.StructType(
            [
                T.StructField("a", T.DoubleType()),  # numeric widening → ok
                T.StructField("b", T.TimestampType()),  # mismatch
            ]
        )

    issues = Q.validate_column_types(FakeDF(), declared)
    by_col = {i["column"]: i["issue"] for i in issues}
    assert by_col == {"b": "type_mismatch", "c": "missing_column"}
