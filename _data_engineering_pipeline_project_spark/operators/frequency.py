"""Count-Min frequency sketch as a relation: build, estimate, merge.

Completes the engine's sketch family — membership (Bloom,
``membership.py``), distinct count (KMV, ``sketches.py``), quantiles
(binned histogram), and now FREQUENCY: "about how many times has this
key appeared?" answered from ``depth·width`` counters instead of a
key-cardinality-sized relation. The operational shape at 100 TB is the
Bloom tier's: the sketch is the cheap always-on answer (heavy-hitter
candidate screens, per-key rate limiting, join-skew pre-detection),
the exact groupBy is reserved for the candidates.

Representation — *a CM sketch as a relation*: ``(row_idx, col, cnt)``
with one row per NON-EMPTY counter cell. Building is one ``explode(
depth positions) → groupBy(row_idx, col) → count`` — fully
distributed, the shuffle bounded by ``min(n_rows·depth,
depth·width)``. Merging same-geometry sketches is ``union → sum`` (a
commutative monoid — the KMV/Bloom maintenance story applies
verbatim). Estimating is the textbook ``min`` over each key's depth
cells; absent cell = 0.

Hash math is the house exact-integer md5 discipline (the
``membership.py`` Kirsch-Mitzenmacher double hash, re-targeted at
``width`` instead of ``m_bits``):

    col_i = (h1 % width  +  i · (h2 % (width−1) + 1)) % width

so every counter placement — and therefore every collision, every
OVERESTIMATE — reproduces bit-for-bit in DuckDB; the registered audit
queries compare the sketch against exact counts and hash-match.

Guarantees (pinned by property test): estimate ≥ true count ALWAYS
(min of sums that each include the key's own contributions);
overestimate magnitude is a sizing outcome (≤ εN with probability
1−δ at width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉), never a correctness one.

Reference anchor: the reference counts violations with pandas
``value_counts`` over the full frame (project/data_quality_checker.py);
this is the scale form of the same frequency question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from _data_engineering_pipeline_project_spark.operators.membership import (
    _h1_h2,
)


def cm_positions(key: Column, width: int, depth: int) -> Column:
    """Array of the ``depth`` counter columns (in ``[0, width)``) the
    key increments/probes — Kirsch-Mitzenmacher double hashing on the
    exact md5 integer lanes (portable: the DuckDB twin reproduces
    every position)."""
    if width < 2:
        raise ValueError("width must be >= 2")
    if not 1 <= depth <= 16:
        raise ValueError("depth must be in [1, 16]")
    h1, h2 = _h1_h2(key)
    base = h1 % F.lit(width)
    stride = h2 % F.lit(width - 1) + F.lit(1)
    return F.array(
        *[(base + F.lit(i) * stride) % F.lit(width) for i in range(depth)]
    )


def _key_cells(df: DataFrame, key: Column, width: int, depth: int) -> DataFrame:
    """(carried columns…, row_idx, col) — one row per (input row,
    depth level). NULL keys are dropped (frequency of NULL is the
    exact groupBy's job; a NULL key would hash to NULL positions)."""
    return (
        df.select(key.alias("__k"))
        .filter(F.col("__k").isNotNull())
        .select(
            "__k",
            F.posexplode(
                cm_positions(F.col("__k"), width, depth)
            ).alias("row_idx", "col"),
        )
    )


def cm_build(
    df: DataFrame, key: Column, width: int = 1024, depth: int = 3
) -> DataFrame:
    """Build the cells relation ``(row_idx, col, cnt)``: one explode +
    one groupBy — the only shuffle, bounded by ``depth·width`` output
    rows regardless of input size. Empty cells are not materialized
    (estimate treats absent as zero)."""
    return (
        _key_cells(df, key, width, depth)
        .groupBy("row_idx", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*cells: DataFrame) -> DataFrame:
    """Merge same-geometry sketches: union → sum. Exactly equals the
    sketch of the concatenated inputs (cell-wise addition is a
    commutative monoid) — the incremental-maintenance property."""
    if not cells:
        raise ValueError("need at least one cells relation")
    out = cells[0]
    for c in cells[1:]:
        out = out.unionByName(c)
    return out.groupBy("row_idx", "col").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key: Column,
    width: int,
    depth: int,
    out_col: str = "cm_estimate",
) -> DataFrame:
    """Annotate the DISTINCT keys of ``keys`` with their CM estimate:
    explode each key's depth (row_idx, col) probes, ONE left join on
    the BROADCAST cells relation, take the MIN count over depth levels
    (absent cell = 0). The broadcast is pinned explicitly (r11 VERDICT
    #6): the cells side is ≤ depth·width rows BY CONSTRUCTION — a
    static bound, not a statistics estimate — so point-lookup serving
    must never degrade to a shuffle when AQE's stats are stale.
    Returns (key, estimate); estimate ≥ the key's true count in
    whatever the sketch was built over."""
    probes = _key_cells(keys, key, width, depth)
    return (
        probes.join(F.broadcast(cells), ["row_idx", "col"], "left")
        .groupBy("__k")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)
        )
        .withColumnRenamed("__k", "key")
    )


# --------------------------------------------------------------------------
# SQL twins (DuckDB) — mirror every arithmetic step above
# --------------------------------------------------------------------------
def cm_pos_sql(key_expr: str, width: int, depth: int) -> str:
    """DuckDB list of the depth columns for ``key_expr`` — the exact
    twin of :func:`cm_positions` (same md5 slices, same double-hash)."""
    h = f"md5(CAST({key_expr} AS VARCHAR))"
    h1 = f"CAST('0x' || substr({h}, 1, 15) AS BIGINT)"
    h2 = f"CAST('0x' || substr({h}, 17, 15) AS BIGINT)"
    idx = "[" + ", ".join(str(i) for i in range(depth)) + "]"
    return (
        f"list_transform({idx}, i -> "
        f"(({h1} % {width}) + i * (({h2} % {width - 1}) + 1)) % {width})"
    )
