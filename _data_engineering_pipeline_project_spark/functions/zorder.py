"""Z-order (Morton) curve index — multi-dimensional data layout.

At 100 TB the dominant query cost is the scan, and the dominant scan
optimization after partition pruning is FILE-LEVEL skipping on min/max
column statistics. Min/max skipping works only if the writer CLUSTERED
the data: sorting by one column destroys locality in every other.
Z-ordering interleaves the bits of several columns into one integer so
that a range-partitioned write on the z-value keeps EVERY interleaved
column's min/max tight per file — the layout trick Delta/Iceberg
OPTIMIZE ZORDER applies, here as a pure Catalyst expression usable with
plain ``repartitionByRange(z).sortWithinPartitions(z).write``.

All bit arithmetic is exact 64-bit integer math (shift/and/or), so the
DuckDB oracle of ``zorder_layout_orders`` reproduces values bit for
bit. No counterpart in the reference (single-node pandas has no layout
problem, project/etl2.py).

This module is the single Morton-key implementation: the write-path
helper ``operators/sampling.py:zorder_value`` delegates here at full
31-bit lanes (it was an Arrow-batched numpy UDF until the r9
measurement showed the 124-term codegen expression is 2-3.3× FASTER —
Arrow serialization costs more than the unrolled shift/mask terms; see
docs/SCALE.md), and ``operators/layout.py`` composes :func:`zorderk`
with min/max quantization for arbitrary numeric domains. Being plain
integer SQL, every form has a DuckDB twin (:func:`zorderk_sql`), which
is what lets the layout queries be oracle-checked rather than
pytest-only. Bit convention (k=2: x even, y odd) pinned by
``tests/test_ext7.py`` and the round-9 bijection property test.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorderk(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of ``k = len(cols)`` non-negative
    integer columns into a single z-value: bit i of column j lands at
    position ``i·k + j`` (for k=2 that is the classic x-even / y-odd
    convention). ``k·bits ≤ 62`` keeps everything in a signed 64-bit
    lane.

    The expression unrolls to ``k·bits`` shift-and-mask terms OR-ed via
    addition (the masked terms are disjoint, so ``+`` == ``|``) — fully
    inside whole-stage codegen, no UDF."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed 64-bit key")
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
                i * k + j,
            )
    return z


def zorderk_sql(exprs: list[str], bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL string (DuckDB oracle
    twin of :func:`zorderk` — same terms, same order, and the same
    ``k·bits ≤ 62`` guard: a mismatched caller must fail loudly here
    too, not silently overflow the oracle's BIGINT terms)."""
    k = len(exprs)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed 64-bit key")
    terms = [
        f"((({e}) >> {i}) & 1) * {1 << (i * k + j)}"
        for i in range(bits)
        for j, e in enumerate(exprs)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder2(x: Column, y: Column, bits: int = 16) -> Column:
    """Two-column form of :func:`zorderk` (x even bits, y odd)."""
    return zorderk([x, y], bits)


def zorder2_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """Two-column form of :func:`zorderk_sql`."""
    return zorderk_sql([x_expr, y_expr], bits)
