"""Skew-mitigation join primitives.

The classic 100 TB failure mode of an equi-join is ONE hot key: every
row with that key lands in a single shuffle partition, and the stage is
as slow as its widest task no matter how many executors exist. AQE's
skew-join splitting handles the sort-merge case at runtime; this module
ships the explicit SALTED form for when the planner cannot help —
e.g. a hot build side that must replicate, or an aggregation-under-join
pattern where the skew is known ahead of time.

Shape: the fact side gains a deterministic per-row salt in [0, salts);
the dimension side explodes into ``salts`` replicas (one per salt
value); the join adds ``salt`` to the equi-key, so a hot key's rows
spread across ``salts`` partitions while every fact row still meets
exactly one replica of its dimension row. Results are BIT-IDENTICAL to
the unsalted join — verified by the oracle of
``salted_revenue_by_brand`` (plain-join SQL twin).

No counterpart in the reference (single-node pandas merges never skew,
project/etl2.py); this is pure Spark scale machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``fact_key == dim_key`` with an
    ``salts``-way salt on the shuffle key.

    The salt is a DETERMINISTIC function of the entire fact row
    (``xxhash64`` over all columns) — not ``rand()``/monotonic id, which
    would change across plan-subtree re-execution and break exactly the
    re-computation stability the engine guarantees everywhere else.
    Identical duplicate rows share a salt; that only narrows the spread
    when the hot key's rows are literal duplicates, in which case the
    right fix is dedup, not salting.

    Cost model: the dimension side is scanned once and exploded
    ``salts``× (rows, not bytes of the fact table) — cheap for any
    dimension that fits a shuffle, and the fact side never replicates.
    ``how`` supports ``inner`` and ``left`` (each fact row still meets
    exactly one replica of its matching dim row, so outer semantics are
    preserved; ``right``/``full`` would emit one unmatched row PER
    REPLICA and are rejected)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salts)
    ).cast("int")
    f = fact.withColumn("__salt_f", salt)
    d = dim.withColumn(
        "__salt_d",
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )
    out = f.join(
        d,
        (F.col(fact_key) == F.col(dim_key))
        & (F.col("__salt_f") == F.col("__salt_d")),
        how,
    )
    return out.drop("__salt_f", "__salt_d")
