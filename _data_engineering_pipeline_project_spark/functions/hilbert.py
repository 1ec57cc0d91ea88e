"""Hilbert curve index as pure Catalyst integer expressions.

The Hilbert curve is the Morton key's (``functions/zorder.py``)
better-locality sibling: consecutive curve positions are ALWAYS grid
neighbors (Morton jumps at quadrant seams), so Hilbert-clustered files
get tighter worst-case per-file key ranges — the reason Delta chose it
for liquid clustering. The classic xy→d transform is a per-bit loop of
conditional reflect/rotate steps; ``operators/sampling.py:
hilbert_value`` implements it as an Arrow-batched numpy UDF, which was
the right call until the r9 zorder measurement showed Arrow transfer
costs more than unrolled integer codegen for per-row maps.

This module holds the EXPRESSION form and the SQL twin — and the
expression form is the measured LOSER, kept as the executable
specification the tests pin parity against, NOT the hot path. The
r10 measurement (20M rows, min of 3): numpy UDF 1.41 s, staged
expression chain 16.96 s, values bit-identical. The reversal vs the
Morton key (where codegen beat the UDF 2-3×) is structural: Morton is
one branch-free shift/mask expression inside WholeStageCodegen;
Hilbert's 16 conditional-rotation rounds must be STAGED projections
(inlined, round r references round r−1's x and y ~3 times → 3^order
tree; Catalyst's CollapseProject correctly declines to merge them),
and a 16-deep projection chain falls out of whole-stage codegen
entirely (plan shows 0 WholeStageCodegen spans — every round runs
interpreted, row by row), while numpy runs 16 vectorized passes. This
sharpens the UDF-vs-expression boundary rule (docs/SCALE.md):
branch-free per-row bit math → expression; iterated DATA-DEPENDENT
control flow → Arrow UDF.

What the SQL twin (:func:`hilbert_sql_ctes`) buys regardless: the
Hilbert key is exact integer math, so the UDF write path is
oracle-checked bit-for-bit in DuckDB — the same promotion the z-order
key got in r9, without moving the hot path off numpy.

Round r (s = 2^(order−1−r)), from the standard iterative xy2d:

    rx = (x & s) > 0 ;  ry = (y & s) > 0
    d += s² · ((3·rx) XOR ry)
    if ry == 0:  x', y' = (rx ? s−1−y : y), (rx ? s−1−x : x)   # rotate
    else:        x', y' unchanged

Bit-equality with the numpy UDF is pinned by test (same transform,
same modulo-2^order input discipline: values are masked with % n, and
NULLs map to 0 exactly like the UDF's fillna(0)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_hilbert_key(
    df: DataFrame,
    col_a: Column | str,
    col_b: Column | str,
    order: int = 16,
    key_col: str = "hilbert_key",
) -> DataFrame:
    """Append the Hilbert distance of (col_a, col_b) — taken modulo
    2^order, NULL → 0 — as ``key_col``, via ``order`` staged pure-
    codegen projections. Intermediate ``__hx/__hy/__hd`` columns are
    dropped before returning."""
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    n = 1 << order
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    out = df.withColumns(
        {
            "__hx": F.pmod(F.coalesce(a.cast("long"), F.lit(0)), F.lit(n)),
            "__hy": F.pmod(F.coalesce(b.cast("long"), F.lit(0)), F.lit(n)),
            "__hd": F.lit(0).cast("long"),
        }
    )
    s = n >> 1
    while s > 0:
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.when((x.bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when((y.bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        out = out.withColumns(
            {
                "__hd": d
                + F.lit(s).cast("long")
                * F.lit(s)
                * (rx * 3).bitwiseXOR(ry).cast("long"),
                "__hx": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - y).otherwise(y),
                ).otherwise(x),
                "__hy": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - x).otherwise(x),
                ).otherwise(y),
            }
        )
        s >>= 1
    return out.withColumn(key_col, F.col("__hd")).drop(
        "__hx", "__hy", "__hd"
    )


def hilbert_sql_ctes(
    expr_a: str,
    expr_b: str,
    order: int = 16,
    source: str = "src",
    carry: str = "",
) -> str:
    """DuckDB CTE chain mirroring :func:`with_hilbert_key` round for
    round. ``carry`` names pass-through columns (comma-led, e.g.
    ``", c_custkey"``) that must already exist in ``source`` under
    their final names — they are re-selected verbatim in every round.
    The final CTE is ``h{order}`` with column ``d`` holding the key;
    compose as ``WITH {chain} SELECT ..., d AS hilbert_key FROM
    h{order}``."""
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    n = 1 << order
    ctes = [
        f"h0 AS (SELECT ((COALESCE(CAST({expr_a} AS BIGINT), 0) % {n})"
        f" + {n}) % {n} AS x,"
        f" ((COALESCE(CAST({expr_b} AS BIGINT), 0) % {n}) + {n}) % {n} AS y,"
        f" CAST(0 AS BIGINT) AS d{carry} FROM {source})"
    ]
    s = n >> 1
    r = 0
    while s > 0:
        prev = f"h{r}"
        r += 1
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"h{r} AS (SELECT "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - y"
            f" ELSE y END) ELSE x END AS x, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - x"
            f" ELSE x END) ELSE y END AS y, "
            f"d + CAST({s} AS BIGINT) * {s} * xor(3 * {rx}, {ry}) AS d"
            f"{carry} FROM {prev})"
        )
        s >>= 1
    return ",\n".join(ctes)
