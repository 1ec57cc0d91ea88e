"""Serving-layer tests (S4/S11 parity): capped JSON rows, missing-table
error payloads, FastAPI gating."""

from __future__ import annotations

import pytest

from _data_engineering_pipeline_project_spark import serve


def test_table_rows_capped(spark):
    df = spark.range(0, 50).withColumnRenamed("id", "x")
    rows = serve.table_rows(df, limit=10)
    assert len(rows) == 10
    assert rows[0] == {"x": 0}


def test_serve_catalog_missing_table(spark, tmp_path):
    df = spark.range(0, 3)
    df.write.parquet(str(tmp_path / "region.parquet"))
    out = serve.serve_catalog(spark, str(tmp_path), ["region", "nope"], limit=5)
    assert len(out["region"]) == 3
    assert "error" in out["nope"][0]


def test_build_app_gated(spark, tmp_path):
    if serve._HAS_FASTAPI:
        pytest.skip("fastapi present; gating not applicable")
    with pytest.raises(NotImplementedError):
        serve.build_app(spark, str(tmp_path))


def test_approx_close_to_exact(spark):
    """Sketch accuracy: approx distinct within 5% of exact on testdata."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in e.queries()["approx_distinct_and_quantiles"](spark, sf).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in e.queries()["distinct_users_per_event_type"](spark, sf).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n <= 0.05, (k, approx[k], n)
