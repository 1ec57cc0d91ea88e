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

Relation to ``operators/sampling.py:zorder_value`` (the write-path
sibling): that form is an Arrow-batched numpy UDF spreading full 31-bit
lanes — the right physical shape at WRITE time, where the z-value is
computed once per row and a 124-term codegen expression would bloat the
task binary. THIS form is the pure-Catalyst expression for moderate bit
widths (≤16 per lane): no Python worker in the plan, and — being plain
integer SQL — it has a DuckDB twin (:func:`zorder2_sql`), which is what
lets the layout audit be oracle-checked rather than pytest-only. Same
bit convention (x even, y odd) in both, pinned by
``tests/test_ext7.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder2(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single z-value (x takes the even bit positions, y
    the odd). 2·bits ≤ 62 keeps everything in a signed 64-bit lane.

    The expression unrolls to ``2·bits`` shift-and-mask terms OR-ed via
    addition (the masked terms are disjoint, so ``+`` == ``|``) — fully
    inside whole-stage codegen, no UDF."""
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder2_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL string (DuckDB oracle
    twin of :func:`zorder2` — same terms, same order)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
