"""Round-10 brief: ADVICE r9 fixes (oracle zero-span guard, zorderk_sql
guard, unsplittable-codec coverage, quantized lane clamp), equi-depth
z-order quantization, BM25 incremental maintenance + de-cached build,
distributed layout audit, and the listing-economy guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --- ADVICE r9 fixes ---------------------------------------------------------


def test_zorderk_sql_guard_matches_spark_twin(spark):
    """Both twins reject k·bits > 62 loudly (ADVICE r9 #2): a caller
    mismatching params must not get silently sign-overflowing BIGINT
    terms in the oracle while the Spark side raises."""
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk,
        zorderk_sql,
    )

    with pytest.raises(ValueError):
        zorderk_sql(["a", "b"], bits=32)
    with pytest.raises(ValueError):
        zorderk([F.col("a"), F.col("b")], bits=32)
    # the boundary itself is legal in both
    assert zorderk_sql(["a"], bits=62).count(">>") == 62


def test_unsplittable_suffixes_cover_xz_lzma_lzo():
    """ADVICE r9 #3: .xz/.lzma/.lzo are stream-compressed (or
    index-dependent) — one scan partition per file; counting them as
    splittable would overestimate width and skip a needed widen."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        _file_is_splittable,
    )

    for suf in (".xz", ".lzma", ".lzo", ".gz", ".zst"):
        assert not _file_is_splittable(f"/data/part-0.json{suf}")
    # .bz2 is block-splittable in Hadoop — must stay splittable
    assert _file_is_splittable("/data/part-0.json.bz2")
    assert _file_is_splittable("/data/part-0.snappy.parquet")


def test_zorder_oracle_constant_column_parity(spark):
    """ADVICE r9 #1: a constant keyed column (zero span) must agree
    between the Spark path (maps to 0) and the DuckDB oracle twin —
    which previously divided by zero. Runs the REGISTERED oracle SQL
    over a constant-nationkey table in DuckDB against the registered
    Spark query path on the same rows."""
    import duckdb
    import pandas as pd

    from _data_engineering_pipeline_project_spark import queries_ext9 as q9
    from _data_engineering_pipeline_project_spark.operators.layout import (
        with_zorder_key,
    )

    pdf = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_acctbal": [0.0, 10.5, 99.99, 42.0],
            "c_nationkey": [7, 7, 7, 7],  # constant -> zero span
        }
    )
    con = duckdb.connect()
    con.register("customer", pdf)
    oracle = {
        r[0]: r[1] for r in con.execute(q9._zorder_sql()).fetchall()
    }
    df = spark.createDataFrame(pdf)
    got = {
        r["c_custkey"]: r["z_key"]
        for r in with_zorder_key(
            df, ["c_acctbal", "c_nationkey"], bits=16, key_col="z_key"
        )
        .select("c_custkey", "z_key")
        .collect()
    }
    assert got == oracle
    # the constant lane contributes nothing: keys are the acctbal lane only
    assert got[1] == 0  # min of the non-constant lane -> curve origin


def test_quantized_max_stays_in_lane(spark):
    """ADVICE r9 #4: col = mx maps to maxq or maxq-1, never ABOVE the
    lane (the interleave would corrupt neighboring dimensions). Spans
    chosen so (mx-mn)·maxq is NOT exactly representable."""
    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized,
    )

    rows = [(0.1,), (0.3,), (1.0 / 3.0,), (0.7,)]
    df = spark.createDataFrame(rows, "v double")
    for bits in (8, 16):
        maxq = (1 << bits) - 1
        out = df.select(
            quantized(
                F.col("v"), F.lit(0.1), F.lit(1.0 / 3.0), bits
            ).alias("q")
        ).collect()
        qs = [r["q"] for r in out]
        assert all(q <= maxq for q in qs), (bits, qs)
        # the mx row lands at the top of the lane (exact or one below)
        mx_q = df.filter(F.col("v") == 1.0 / 3.0).select(
            quantized(F.col("v"), F.lit(0.1), F.lit(1.0 / 3.0), bits).alias("q")
        ).collect()[0]["q"]
        assert mx_q in (maxq, maxq - 1)
