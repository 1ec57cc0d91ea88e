"""Round-9: quantized data-layout key (Z-order over arbitrary doubles).

``zorder_key_customers`` registers the QUANTIZED Morton-key computation
(``operators/layout.py``) — (acctbal, nationkey) mapped to 16-bit lanes
against the table's min/max, interleaved via the shared
``functions/zorder.py:zorderk`` expression — so the exact bit geometry
the clustered write sorts by is oracle-checked against DuckDB using the
same module's SQL twin (``zorderk_sql``). The integer-lane sibling is
``zorder_layout_orders`` (queries_ext7.py); what this query adds is the
min/max quantization that makes real-valued columns z-orderable. The
WRITE path (``layout.py:write_zordered_quantized``) and its payoff are
pinned by pytest (``tests/test_round9.py``): footer min/max spans per
file drop to ~sqrt(1/files) per dimension, and the scan METRIC shows
row groups actually skipped at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.catalog import table
from _data_engineering_pipeline_project_spark.queries import query

_ZBITS = 16


def _zorder_sql() -> str:
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk_sql,
    )

    maxq = (1 << _ZBITS) - 1  # derived, so the oracle can't desync from bits
    # mirrors quantized() branch-for-branch: the zero-span CASE keeps a
    # constant column at 0 (and keeps the division from ever evaluating
    # on it — DuckDB would produce inf and fail the BIGINT cast), the
    # q > maxq CASE is the same lane clamp (CASE, not LEAST: LEAST's
    # NULL handling differs across engines and would break NULL→0)
    qraw = (
        "CAST(floor((CAST({col} AS DOUBLE) - mn_{k})"
        f" * CAST({maxq} AS DOUBLE)"
        " / (mx_{k} - mn_{k})) AS BIGINT)"
    )
    q = (
        "CASE WHEN mx_{k} = mn_{k} THEN 0 ELSE COALESCE("
        "CASE WHEN " + qraw + f" > {maxq} THEN {maxq} ELSE " + qraw + " END"
        ", 0) END"
    )
    return f"""
WITH stats AS (
  SELECT CAST(min(c_acctbal) AS DOUBLE) AS mn_a, CAST(max(c_acctbal) AS DOUBLE) AS mx_a,
         CAST(min(c_nationkey) AS DOUBLE) AS mn_n, CAST(max(c_nationkey) AS DOUBLE) AS mx_n
  FROM customer
), quant AS (
  SELECT c_custkey,
         {q.format(col='c_acctbal', k='a')} AS qa,
         {q.format(col='c_nationkey', k='n')} AS qn
  FROM customer CROSS JOIN stats
)
SELECT c_custkey, CAST({zorderk_sql(['qa', 'qn'], _ZBITS)} AS BIGINT) AS z_key
FROM quant
"""


@query("zorder_key_customers", _zorder_sql())
def zorder_key_customers(spark: SparkSession, sf: str) -> DataFrame:
    """The Morton key a z-ordered customer layout clusters by: each of
    (c_acctbal, c_nationkey) quantized to [0, 65535] against the
    table's min/max (one aggregate, broadcast back — no collect), bits
    interleaved into one 64-bit key. Pure codegen'd column math — the
    quantization is pinned to sub→mul→div in DOUBLE with an exact
    floor, so DuckDB reproduces every bit (see operators/layout.py)."""
    from _data_engineering_pipeline_project_spark.operators.layout import (
        with_zorder_key,
    )

    c = table(spark, sf, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    return with_zorder_key(
        c, ["c_acctbal", "c_nationkey"], bits=_ZBITS, key_col="z_key"
    ).select("c_custkey", "z_key")
