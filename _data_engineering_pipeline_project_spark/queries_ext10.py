"""Round-10: equi-depth (rank-quantized) Z-order layout key.

``zorder_key_equidepth_orders`` registers the rank-quantization +
interleave math that ``layout.py:write_zordered_quantized(quantize=
"equi_depth")`` clusters by, so it is oracle-checked bit-for-bit
against DuckDB. The boundaries here are PINNED LITERALS (a geometric
ladder over o_totalprice — the long-tailed column shape equi-depth
exists for — and a linear ladder over o_custkey): rank-quantization
against given boundaries is exact integer counting, reproducible in
any engine. The boundary DERIVATION (approxQuantile, Greenwald-Khanna)
is deliberately outside the oracle — its output is implementation-
defined within the error bound, so no other engine can re-derive it;
the same split ``functions/twopass.py`` pins (boundaries become plan
literals; pytest owns the derivation, the oracle owns the math). The
write path's payoff on a pareto-shaped column — where min/max
quantization measurably fails — is pinned by
``tests/test_round10.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.catalog import table
from _data_engineering_pipeline_project_spark.queries import query

_EQ_BITS = 4  # 2 lanes x 4 bits; ladders below stay under 2^4 buckets

# geometric ladder — the equi-depth shape for a long-tailed money
# column (each bucket doubles the value range, ~equalizing row counts
# under an exponential-ish tail); values are exact small doubles
_PRICE_BOUNDS = [float(1000 * (1 << i)) for i in range(10)]  # 1k..512k
_CUSTKEY_BOUNDS = [250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0, 16000.0]


def _equidepth_sql() -> str:
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk_sql,
    )
    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized_equi_depth_sql,
    )

    qp = quantized_equi_depth_sql("o_totalprice", _PRICE_BOUNDS)
    qc = quantized_equi_depth_sql("o_custkey", _CUSTKEY_BOUNDS)
    return f"""
SELECT o_orderkey,
       CAST({zorderk_sql([qp, qc], _EQ_BITS)} AS BIGINT) AS z_key
FROM orders
"""


@query("zorder_key_equidepth_orders", _equidepth_sql())
def zorder_key_equidepth_orders(spark: SparkSession, sf: str) -> DataFrame:
    """The Morton key an equi-depth z-ordered orders layout clusters
    by: each column rank-quantized against its boundary ladder (bucket
    = count of boundaries <= value, an exact integer the DuckDB twin
    reproduces bit-for-bit), buckets interleaved into one key. The
    count is a JVM-side higher-order size(filter(array_literal)) —
    no Python worker, no shuffle; the whole key is per-row column
    math over the scan."""
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk,
    )
    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized_equi_depth,
    )

    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_custkey"
    )
    # buckets inlined into the interleave: codegen subexpression
    # elimination evaluates each repeated bucket once per row (measured
    # r10 — a staged pre-projection is SLOWER; see
    # layout.quantized_zorder_key)
    qp = quantized_equi_depth(F.col("o_totalprice"), _PRICE_BOUNDS)
    qc = quantized_equi_depth(F.col("o_custkey"), _CUSTKEY_BOUNDS)
    return o.select(
        "o_orderkey", zorderk([qp, qc], _EQ_BITS).alias("z_key")
    )
