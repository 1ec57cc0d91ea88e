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

from _data_engineering_pipeline_project_spark.functions.localrel import local_df


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


def profile_table(
    df: DataFrame,
    numeric_cols: "list[str]" = (),
    timestamp_cols: "list[str]" = (),
    other_cols: "list[str]" = (),
) -> DataFrame:
    """One-pass column profiler: for every listed column — null count,
    exact distinct count, and typed min/max (doubles for numeric
    columns, native timestamps for time columns; no lossy
    value→string formatting, which differs between engines).

    Like ``run_expectations``, the whole profile is ONE aggregate over
    ONE scan (Spark plans the N distinct-counts as an expand + two-phase
    agg — still a single pass over the data); the per-column report rows
    come from unpivoting the single aggregate row. At 100 TB swap the
    exact distincts for ``approx_count_distinct`` — same shape, no
    expand multiplier.

    Output: (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_ts, max_ts).
    """
    cols = (
        [(c, "num") for c in numeric_cols]
        + [(c, "ts") for c in timestamp_cols]
        + [(c, "other") for c in other_cols]
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, (c, kind) in enumerate(cols):
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nul{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dis{i}"))
        if kind == "num":
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max{i}"))
        elif kind == "ts":
            # normalize TIMESTAMP_NTZ -> TIMESTAMP so the unpivot's NULL
            # slots (typed TIMESTAMP) unify; session tz is pinned UTC by
            # catalog.table, making the cast value-preserving
            aggs.append(F.min(F.col(c)).cast("timestamp").alias(f"__tmin{i}"))
            aggs.append(F.max(F.col(c)).cast("timestamp").alias(f"__tmax{i}"))
    one = df.agg(*aggs)
    parts = []
    for i, (c, kind) in enumerate(cols):
        mn = f"__min{i}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx = f"__max{i}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        tmn = f"__tmin{i}" if kind == "ts" else "CAST(NULL AS TIMESTAMP)"
        tmx = f"__tmax{i}" if kind == "ts" else "CAST(NULL AS TIMESTAMP)"
        parts.append(
            f"'{c}', __nul{i}, __dis{i}, {mn}, {mx}, {tmn}, {tmx}"
        )
    report = one.selectExpr(
        "__n_rows",
        f"stack({len(cols)}, {', '.join(parts)}) as "
        "(column, n_nulls, n_distinct, min_num, max_num, min_ts, max_ts)",
    )
    return report.select(
        "column",
        F.col("__n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_num",
        "max_num",
        "min_ts",
        "max_ts",
    )


def suggest_expectations(
    df: DataFrame,
    numeric_cols: "list[str]" = (),
    string_cols: "list[str]" = (),
    enum_threshold: int = 10,
) -> DataFrame:
    """Constraint DISCOVERY — the generator whose output
    ``run_expectations`` consumes: profile the listed columns and emit
    the constraints the data currently satisfies, as a relation
    ``(column, suggestion, lo, hi, allowed)``:

    - ``not_null``      — the column has zero nulls;
    - ``unique``        — distinct count equals row count (and no
      nulls): a primary-key candidate, the same evidence the IND audit
      (queries_ext8.py) uses for FK discovery on the other side;
    - ``in_range``      — numeric observed [min, max] (typed DOUBLE
      columns, never value→string formatting); only emitted when the
      column has at least one NON-NULL value — an all-NULL column
      would suggest ``[NULL, NULL]``, which promotes to a vacuous
      always-pass contract (code-review r10);
    - ``in_set``        — string columns at or under ``enum_threshold``
      distinct values, the sorted value list as ``array<string>``
      (a comma-joined string is lossy the moment a value contains a
      comma — code-review r10; ``in_set`` takes the list directly).

    Suggestions are EVIDENCE, not truth — the operator names what held
    on this snapshot so a human promotes it to a contract; that is how
    expectation suites get written at 100 TB (nobody eyeballs the
    table).

    Plan — TWO bounded scans, never an unbounded buffer: scan 1 is the
    profile aggregate (map-side partials; distinct counts ride the
    expand+two-phase agg, NO value collection — a high-cardinality
    string column costs a count, not a corpus-sized collect_set in one
    agg buffer, the hazard the one-scan form had); its one row decides
    which string columns qualify as enums, and scan 2 collects sorted
    value sets ONLY for qualifying columns, so every collection buffer
    is ≤ enum_threshold values by construction. Scan 2 is skipped
    entirely when nothing qualifies. The suggestion relation itself is
    bounded (≤ 3 rows per audited column) and is assembled from the
    two collected profile rows.

    SNAPSHOT CAVEAT (advice r10): two scans see two snapshots. On an
    input that can change between them (a streaming landing dir, a
    concurrent overwrite) a column that profiled under
    ``enum_threshold`` in scan 1 may collect a larger or different
    value set in scan 2, so the emitted ``in_set`` evidence may
    describe no single snapshot. Callers that need true snapshot
    semantics should pass a pinned frame (``df.cache()`` +
    materialize, or read a table version); the registered query runs
    over static parquet, where the two scans are one snapshot."""
    spark = df.sparkSession
    cols = [(c, "num") for c in numeric_cols] + [
        (c, "str") for c in string_cols
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (c, kind) in enumerate(cols):
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nul{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dis{i}"))
        if kind == "num":
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max{i}"))
    prof = df.agg(*aggs).collect()[0]

    enum_cols = [
        (i, c)
        for i, (c, kind) in enumerate(cols)
        if kind == "str" and 0 < prof[f"__dis{i}"] <= enum_threshold
    ]
    sets: dict = {}
    if enum_cols:
        srow = df.agg(
            *[
                F.array_sort(F.collect_set(F.col(c))).alias(f"__set{i}")
                for i, c in enum_cols
            ]
        ).collect()[0]
        sets = {c: list(srow[f"__set{i}"]) for i, c in enum_cols}

    n = prof["__n"]
    rows = []
    for i, (c, kind) in enumerate(cols):
        nul, dis = prof[f"__nul{i}"], prof[f"__dis{i}"]
        if nul == 0:
            rows.append((c, "not_null", None, None, None))
        if nul == 0 and dis == n:
            rows.append((c, "unique", None, None, None))
        if kind == "num" and nul < n:
            rows.append(
                (c, "in_range", prof[f"__min{i}"], prof[f"__max{i}"], None)
            )
        if kind == "str" and c in sets:
            rows.append((c, "in_set", None, None, sets[c]))
    return local_df(
        spark,
        rows,
        "column string, suggestion string, lo double, hi double, "
        "allowed array<string>",
    )
