"""Tests for join/diff/normalize operators and source readers."""

from __future__ import annotations

from _data_engineering_pipeline_project_spark.functions.expressions import (
    normalize_null_tokens,
)
from _data_engineering_pipeline_project_spark.operators.joins import (
    changed_rows,
    deleted_rows,
    new_rows,
    snapshot_diff,
)
from _data_engineering_pipeline_project_spark.operators.normalize import (
    extract_dimension,
    normalize_geolocation,
)
from _data_engineering_pipeline_project_spark.schema import tpch_registry


def ids(df, col="id"):
    return sorted(r[col] for r in df.collect())


def test_new_deleted_changed(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    new = spark.createDataFrame([(2, "b"), (3, "C"), (4, "d")], "id int, v string")
    assert ids(new_rows(new, old, ["id"])) == [4]
    assert ids(deleted_rows(old, new, ["id"])) == [1]
    assert ids(changed_rows(new, old, ["id"])) == [3]


def test_changed_rows_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "id int, v string")
    # NULL == NULL must not count as a change (reference J4 <=> semantics)
    assert ids(changed_rows(new, old, ["id"])) == [2]


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    new = spark.createDataFrame([(2, "b"), (3, "C"), (4, "d")], "id int, v string")
    got = {r["id"]: r["change_type"] for r in snapshot_diff(new, old, ["id"]).collect()}
    assert got == {1: "delete", 2: "unchanged", 3: "update", 4: "insert"}


def test_extract_dimension_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "sp", "SP"), (2, "rj", "RJ"), (3, "sp", "SP")], "id int, city string, st string"
    )
    dim, mapped = extract_dimension(df, ["city", "st"], "city_id")
    assert sorted(tuple(r) for r in dim.collect()) == [(1, "rj", "RJ"), (2, "sp", "SP")]
    got = {r["id"]: r["city_id"] for r in mapped.collect()}
    assert got == {1: 2, 2: 1, 3: 2}


def test_extract_dimension_no_forced_broadcast(spark):
    """Scale contract: by default the dimension map-back carries NO
    broadcast hint — a billion-row dimension extracted from a 100 TB
    fact table must be allowed to hash/sort-merge join (AQE decides from
    MEASURED size); only an explicit ``broadcast=True`` forces the hint."""
    df = spark.createDataFrame(
        [(1, "sp", "SP"), (2, "rj", "RJ")], "id int, city string, st string"
    )
    # the two-pass numbering legitimately broadcasts its envelope and
    # ≤buckets-row offset aggregates, so count hints rather than demand
    # zero: broadcast=True must add EXACTLY ONE more hint (the map-back
    # dimension side), and the default must not carry it.
    _, mapped = extract_dimension(df, ["city", "st"], "city_id")
    _, forced = extract_dimension(
        df, ["city", "st"], "city_id", broadcast=True
    )
    n_default = mapped._jdf.queryExecution().analyzed().toString().count(
        "strategy=broadcast"
    )
    n_forced = forced._jdf.queryExecution().analyzed().toString().count(
        "strategy=broadcast"
    )
    assert n_forced == n_default + 1, (n_default, n_forced)


def test_normalize_geolocation(spark):
    geo = spark.createDataFrame(
        [
            (1000, -23.5, -46.6, "sao paulo", "SP"),
            (1000, -23.6, -46.7, "sao paulo", "SP"),
            (2000, -22.9, -43.2, "rio", "RJ"),
        ],
        "geolocation_zip_code_prefix int, geolocation_lat double, "
        "geolocation_lng double, geolocation_city string, geolocation_state string",
    )
    out = normalize_geolocation(geo)
    assert sorted(tuple(r) for r in out["geo_city_state"].collect()) == [
        (1, "rio", "RJ"),
        (2, "sao paulo", "SP"),
    ]
    assert sorted(tuple(r) for r in out["geo_zip"].collect()) == [(1000, 2), (2000, 1)]
    assert out["geo_coordinates"].count() == 3


def test_normalize_null_tokens(spark):
    df = spark.createDataFrame(
        [("nan", 1), ("?", 2), ("ok", 3), (" nan ", 4)], "s string, i int"
    )
    out = normalize_null_tokens(df)
    got = {r["i"]: r["s"] for r in out.collect()}
    assert got == {1: None, 2: None, 3: "ok", 4: None}


def test_registry_load_order():
    reg = tpch_registry()
    order = reg.load_order()
    assert order.index("region") < order.index("nation")
    assert order.index("nation") < order.index("customer")
    assert order.index("customer") < order.index("orders")
    assert order.index("orders") < order.index("lineitem")
    assert order.index("part") < order.index("lineitem")


def test_csv_reader_multi_null_and_datetime_sniff(spark, tmp_path):
    p = tmp_path / "olist_orders_dataset.csv"
    p.write_text(
        "order_id,approved_at,note\n"
        "1,2020-01-01 10:00:00,ok\n"
        "2,not-a-date,nan\n"
        "3,?,x\n"
    )
    from _data_engineering_pipeline_project_spark.sources.csv_source import (
        read_csv_table,
        table_name_from_filename,
    )

    assert table_name_from_filename(str(p)) == "orders"
    df = read_csv_table(spark, str(p))
    rows = {r["order_id"]: (r["approved_at"], r["note"]) for r in df.collect()}
    assert rows[1][1] == "ok"
    assert rows[1][0] is not None  # parsed timestamp
    assert rows[2][0] is None  # coerce → null (F2 semantics)
    assert rows[2][1] is None  # 'nan' token → null (S2)
    assert rows[3][0] is None  # '?' token → null before cast


def test_csv_corrupt_record_capture(spark, tmp_path):
    from _data_engineering_pipeline_project_spark.sources.csv_source import (
        read_csv_with_corrupt_capture,
    )
    from pyspark.sql import types as T

    p = tmp_path / "t.csv"
    p.write_text(
        "id,qty,price\n"
        "1,5,9.99\n"
        "2,not_a_number,1.50\n"   # qty unparseable -> corrupt
        "3,7,2.25\n"
        '4,"unclosed quote,8\n'   # structurally malformed -> corrupt
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("qty", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    res = read_csv_with_corrupt_capture(spark, str(p), schema)
    clean, corrupt = res  # tuple-unpack compatibility
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    bad = sorted(r["raw_line"] for r in corrupt.collect())
    assert len(bad) == 2
    assert any("not_a_number" in b for b in bad)
    # clean rows parsed with the declared types
    assert clean.schema["qty"].dataType.typeName() == "long"
    # release the SPARK-21610 cache: repeated ingestion must not leak
    assert res._cached.storageLevel.useMemory
    res.release()
    assert not res._cached.storageLevel.useMemory


def test_conform_to_schema_evolution(spark):
    import pytest
    from pyspark.sql import types as T

    from _data_engineering_pipeline_project_spark.operators.evolution import (
        conform_to_schema,
    )

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),        # widened from int
            T.StructField("price", T.DoubleType()),   # widened from float
            T.StructField("note", T.StringType()),    # missing -> null
        ]
    )
    src = spark.createDataFrame(
        [(1, 2.5, "x")], "id int, price float, legacy string"
    )
    out, actions = conform_to_schema(src, target)
    assert [f.dataType.typeName() for f in out.schema.fields] == [
        "long", "double", "string",
    ]
    row = out.collect()[0]
    assert (row["id"], row["price"], row["note"]) == (1, 2.5, None)
    acts = {(a.column, a.action) for a in actions}
    assert acts == {
        ("id", "widened"),
        ("price", "widened"),
        ("note", "added_null"),
        ("legacy", "dropped"),
    }

    # narrowing drift refuses by default...
    bad_target = T.StructType([T.StructField("id", T.IntegerType())])
    big = spark.createDataFrame([(2**40,)], "id long")
    with pytest.raises(TypeError):
        conform_to_schema(big, bad_target)
    # ...and nulls-with-report when asked
    out2, actions2 = conform_to_schema(big, bad_target, on_incompatible="null")
    assert out2.collect()[0]["id"] is None
    assert actions2[0].action == "nulled_incompatible"

def test_keep_first_agg_matches_window_with_nulls(spark):
    """keep_first_agg (min_by struct hash aggregate) must pick the SAME
    row as the window row_number form, including NULL tie-break values
    (struct ordering is NULLS FIRST, like the window's ascending
    default) and null GROUP keys (SQL GROUP BY keeps them, like
    partitionBy)."""
    from _data_engineering_pipeline_project_spark.functions.expressions import (
        keep_first,
        keep_first_agg,
    )

    rows = [
        (1, 5, "a"),
        (1, None, "b"),   # NULL ts sorts FIRST -> the kept row for key 1
        (1, 3, "c"),
        (2, 7, "d"),
        (None, 1, "e"),   # null key forms its own group
        (None, 0, "f"),
    ]
    df = spark.createDataFrame(rows, "k int, ts int, payload string")
    win = {
        (r["k"], r["payload"])
        for r in keep_first(df, ["k"], ["ts", "payload"])[0].collect()
    }
    agg = {
        (r["k"], r["payload"])
        for r in keep_first_agg(df, ["k"], ["ts", "payload"]).collect()
    }
    assert agg == win == {(1, "b"), (2, "d"), (None, "f")}
