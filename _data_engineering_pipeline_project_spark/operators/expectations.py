"""Declarative data-expectation suites evaluated in ONE table scan.

The reference's quality checker runs each validation as its own pandas
pass over the table (data_quality_checker.py: one function = one scan =
one report line). At 100 TB that is one full-table read *per check*.
This operator inverts the shape: a suite is a list of named boolean
predicates, and the whole suite compiles to a single aggregate — every
violation counter is a ``sum(case when ...)`` inside one
partial-aggregated scan, then the one-row result is unpivoted to the
familiar one-row-per-expectation report. N checks cost exactly one scan
regardless of N.

Scale notes:
- The scan aggregates map-side (partial aggregation) to a single row per
  partition; the shuffle moves #partitions rows, not data.
- ``unique`` expectations need a distinct count, which is the one
  genuinely shuffling term; it rides the same aggregate (Spark plans
  expand + two-phase agg) instead of a second job.
- The unpivot (``stack``) runs on the one-row aggregate — driver-scale,
  free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named row-level predicate that should hold for every row, or a
    table-level uniqueness contract.

    ``violated`` is a boolean Column that is true where the contract is
    BROKEN (so ``col IS NULL`` for a not-null expectation)."""

    name: str
    violated: Column | None = None  # row-level: count rows where true
    unique_cols: tuple[str, ...] = ()  # table-level: duplicate count


def not_null(name: str, col: str) -> Expectation:
    return Expectation(name, F.col(col).isNull())


def in_set(name: str, col: str, allowed: list) -> Expectation:
    # NULL is handled by a separate not_null expectation; NOT IN over
    # NULL would be null (not counted), matching SQL CASE semantics.
    return Expectation(name, ~F.col(col).isin(allowed))


def in_range(name: str, col: str, lo, hi) -> Expectation:
    c = F.col(col)
    return Expectation(name, (c < F.lit(lo)) | (c > F.lit(hi)))


def positive(name: str, col: str) -> Expectation:
    return Expectation(name, F.col(col) <= F.lit(0))


def unique(name: str, *cols: str) -> Expectation:
    return Expectation(name, None, tuple(cols))


def matches(name: str, col: str, pattern: str) -> Expectation:
    return Expectation(name, ~F.col(col).rlike(pattern))


def run_expectations(df: DataFrame, specs: list[Expectation]) -> DataFrame:
    """Evaluate the suite in one scan.

    Returns one row per expectation:
    ``(expectation string, n_rows bigint, n_violations bigint,
    passed boolean)``.
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, e in enumerate(specs):
        if e.unique_cols:
            # duplicates = rows - distinct keys (NULL keys: countDistinct
            # skips all-null tuples, same as COUNT(DISTINCT ...) in SQL;
            # pair with not_null expectations for PK semantics)
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.countDistinct(*[F.col(c) for c in e.unique_cols])
                ).alias(f"__e{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(e.violated, F.lit(1)).otherwise(F.lit(0))).alias(
                    f"__e{i}"
                )
            )
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{e.name.replace(chr(39), '')}', __e{i}" for i, e in enumerate(specs)
    )
    report = one.selectExpr(
        "__n_rows", f"stack({len(specs)}, {pairs}) as (expectation, n_violations)"
    )
    return report.select(
        "expectation",
        F.col("__n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
