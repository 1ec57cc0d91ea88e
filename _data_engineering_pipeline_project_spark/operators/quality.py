"""Data-quality check operators — the reference's "query library".

Each check from the reference's ``DataQualityChecker`` (reference
project/data_quality_checker.py) becomes a pure function
``DataFrame → CheckResult(violations, cleaned)``. Nothing mutates in
place, nothing is eager: both outputs are lazy plans sharing the scan, so
Catalyst prunes columns / pushes predicates into the source and a caller
that only counts violations never pays for the cleaned side.

Scale notes (100 TB stance):
- PK checks shuffle once on the key (window or agg); FK checks are
  semi/anti joins that AQE turns into broadcast joins when the parent is
  a dimension table.
- Null-count / existence checks are single-pass hash aggregates with
  map-side partial aggregation — one shuffle of one row per partition.
- Row-level predicate checks (negatives, date inversion, chronology,
  regex) are shuffle-free codegen'd filters.

Reference-bug policy (SURVEY.md §2i): the engine implements the evident
intent, not the bugs — e.g. latitude AND longitude are both excluded from
the negative-value check (the reference excludes ``["longitude",
"longitude"]``, dq:332), the dtype-mapping loop bug (dq:57) is not
replicated, and checks run exactly once (not twice as in dq:392-411).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from _data_engineering_pipeline_project_spark.functions.expressions import (
    EMOJI_PATTERN,
    any_null,
    chronology_violation_expr,
    keep_first,
)
from _data_engineering_pipeline_project_spark.schema import SchemaRegistry, TableSchema


@dataclass
class CheckResult:
    """Outcome of one check: flagged rows + the cleaned table.

    ``violations`` carries the offending rows (plus an ``issue`` column
    where the check distinguishes causes); ``cleaned`` is the input with
    offending rows removed — or the input unchanged for report-only checks
    (the reference keeps rows for Q5-Q9, dropping only on PK/FK checks).
    """

    name: str
    violations: DataFrame
    cleaned: DataFrame


def validate_primary_keys(
    df: DataFrame, pk: list[str], order_by: list[str] | None = None
) -> CheckResult:
    """Q1 — NULL-in-PK rows dropped; duplicate-PK rows dropped keep-first.

    Reference: ``validate_primary_keys`` (dq:95-129). Composite PKs
    supported. The reference's keep-first depends on file order; the
    engine requires a deterministic ``order_by`` tie-break (defaults to
    the remaining columns) so results are reproducible across runs and
    partitionings — mandatory at scale and for oracle parity.
    """
    null_mask = any_null(pk)
    null_viol = df.filter(null_mask).withColumn("issue", F.lit("null_pk"))
    non_null = df.filter(~null_mask)
    order_by = order_by or [c for c in df.columns if c not in pk] or pk
    kept, dups = keep_first(non_null, pk, order_by)
    dup_viol = dups.withColumn("issue", F.lit("duplicate_pk"))
    return CheckResult("primary_key", null_viol.unionByName(dup_viol), kept)


def validate_foreign_keys(
    child: DataFrame,
    fk: list[str],
    parent: DataFrame,
    parent_key: list[str],
) -> CheckResult:
    """Q2 — FK values absent from the parent are dropped; NULL FKs kept.

    Reference: ``validate_foreign_keys`` (dq:131-164) — pandas ``isin``
    against the parent's FIRST column (dq:140,151). The engine fixes the
    first-column assumption (uses the declared parent key) and scales the
    membership test as anti/semi joins: Catalyst broadcasts the parent
    when it is dimension-sized, otherwise AQE picks a shuffled hash join.
    NULL-FK rows are kept, matching the reference's explicit
    ``~isnull()`` guard (dq:151).
    """
    parent_keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(parent_key, fk)]
    ).dropDuplicates()
    null_fk = any_null(fk)
    with_fk = child.filter(~null_fk)
    orphans = with_fk.join(parent_keys, on=fk, how="left_anti").withColumn(
        "issue", F.lit("orphan_fk")
    )
    kept = child.filter(null_fk).unionByName(
        with_fk.join(parent_keys, on=fk, how="left_semi")
    )
    return CheckResult("foreign_key", orphans, kept)


def validate_column_types(
    df: DataFrame, declared: TableSchema
) -> list[dict[str, str]]:
    """Q3 — inferred vs declared type reconciliation (metadata-only).

    Reference: ``validate_column_data_types`` (dq:166-193) including the
    FLOAT-satisfies-INTEGER relaxation (dq:184-186; pandas reads nullable
    ints as float64 — Spark parquet reads can surface the same widening).
    Driver-side schema comparison: zero data scanned. The reference's
    dtype-mapping indentation bug (dq:57: only the last table mapped) is
    intentionally not replicated.
    """
    declared_by_name = {f.name: f.dataType for f in declared.struct.fields}
    actual_by_name = {f.name: f.dataType for f in df.schema.fields}
    issues: list[dict[str, str]] = []
    for name, want in declared_by_name.items():
        have = actual_by_name.get(name)
        if have is None:
            issues.append(
                {"column": name, "issue": "missing_column", "expected": want.simpleString(), "actual": ""}
            )
            continue
        if have == want:
            continue
        numeric_ok = isinstance(want, T.NumericType) and isinstance(have, T.NumericType)
        if numeric_ok:
            continue  # FLOAT-for-INTEGER style relaxation
        ts_family = (T.TimestampType, T.TimestampNTZType, T.DateType)
        if isinstance(want, ts_family) and isinstance(have, ts_family):
            continue  # parquet NTZ vs session-TZ timestamps are compatible
        issues.append(
            {
                "column": name,
                "issue": "type_mismatch",
                "expected": want.simpleString(),
                "actual": have.simpleString(),
            }
        )
    return issues


def check_nulls(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Q5 — per-column null counts in a single pass.

    Reference: ``check_nulls`` (dq:226-239), a pandas ``isnull().sum()``.
    Engine: one hash aggregate with map-side partials — for a 100 TB table
    this shuffles one row per partition, nothing else. Returns long format
    ``(column, null_count)`` so the report shape is stable however many
    columns the table has.
    """
    cols = cols or df.columns
    # coalesce: sum over ZERO rows is NULL, but a null-count REPORT of
    # an empty table must read 0 (pandas isnull().sum() semantics; the
    # adversarial sweep pins it). Mirrored in the oracle SQL twin.
    aggs = [
        F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (column, null_count)".format(
        n=len(cols), args=", ".join(f"'{c}', `{c}`" for c in cols)
    )
    return wide.selectExpr(stack_expr)


def detect_required_nulls(df: DataFrame, required: list[str]) -> CheckResult:
    """Q6 — rows with ANY required attribute NULL are flagged (kept).

    Reference: ``detect_missing_product_dimensions`` (dq:244-268) over the
    products table's 6 dimension columns; generalized to any required set.
    Shuffle-free filter.
    """
    viol = df.filter(any_null(required)).withColumn("issue", F.lit("missing_required"))
    return CheckResult("required_nulls", viol, df)


def check_date_inversion(
    df: DataFrame, earlier: str, later: str
) -> CheckResult:
    """Q7 — rows where ``earlier`` is after ``later`` (both non-null).

    Reference: ``check_review_dates`` (dq:270-293) — review creation after
    answer. ``to_timestamp``-coerced parsing happens at the source layer;
    here both are already timestamps. Shuffle-free filter.
    """
    viol = (
        df.filter(
            F.col(earlier).isNotNull()
            & F.col(later).isNotNull()
            & (F.col(earlier) > F.col(later))
        ).withColumn("issue", F.lit(f"{earlier} > {later}"))
    )
    return CheckResult("date_inversion", viol, df)


def check_chronological_order(df: DataFrame, ts_cols: list[str]) -> CheckResult:
    """Q8 — lifecycle timestamps must be non-decreasing, skipping nulls.

    Reference: ``check_chronological_order`` (dq:295-328) — an ``iterrows``
    loop comparing each timestamp to the previous *non-null* one and
    collecting '<prev> > <cur>' pair strings. Engine: the same semantics as
    one pure column expression (see ``chronology_violation_expr``) —
    per-row, shuffle-free, codegen'd.
    """
    with_issues = df.withColumn("issues", chronology_violation_expr(ts_cols))
    viol = (
        with_issues.filter(F.size("issues") > 0)
        .withColumn("issue", F.array_join("issues", "; "))
        .drop("issues")
    )
    return CheckResult("chronological_order", viol, df)


def detect_negative_values(
    df: DataFrame,
    numeric_cols: list[str] | None = None,
    exclude: tuple[str, ...] = ("longitude", "latitude"),
) -> CheckResult:
    """Q9 — negative values in numeric columns are flagged (rows kept).

    Reference: ``detect_negative_values`` (dq:330-347). The reference's
    exclude list is ``["longitude", "longitude"]`` (dq:332) — a duplicate
    literal that leaves latitude checked, flagging every southern-
    hemisphere coordinate; the engine implements the evident intent and
    excludes both. Emits one violation row per (row, offending column),
    matching the reference's per-column error records.
    """
    if numeric_cols is None:
        numeric_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)
        ]
    cols = [c for c in numeric_cols if not any(x in c.lower() for x in exclude)]
    if not cols:
        empty = df.filter(F.lit(False)).withColumn(
            "issue", F.lit(None).cast("string")
        )
        return CheckResult("negative_values", empty, df)
    parts = [
        df.filter(F.col(c) < 0).withColumn("issue", F.lit(f"negative:{c}"))
        for c in cols
    ]
    viol = parts[0]
    for p in parts[1:]:
        viol = viol.unionByName(p)
    return CheckResult("negative_values", viol, df)


def detect_pattern_columns(
    df: DataFrame, pattern: str = EMOJI_PATTERN, cols: list[str] | None = None
) -> DataFrame:
    """Q4 — which string columns contain any value matching ``pattern``.

    Reference: ``detect_emoji_columns`` (dq:197-223) — a per-column pandas
    ``apply(regex).any()``. Engine: ONE aggregate pass computing
    ``max(rlike)`` per column simultaneously (the reference scans the
    table once per column). Returns ``(column, has_match)``.
    """
    cols = cols or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    if not cols:
        from _data_engineering_pipeline_project_spark.functions.localrel import (
            local_df,
        )

        return local_df(
            df.sparkSession, [], "column string, has_match boolean"
        )
    aggs = [
        F.max(F.coalesce(F.col(c).rlike(pattern), F.lit(False))).alias(c) for c in cols
    ]
    wide = df.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (column, has_match)".format(
        n=len(cols), args=", ".join(f"'{c}', `{c}`" for c in cols)
    )
    return wide.selectExpr(stack_expr)


def check_value_range(
    df: DataFrame, col: str, lo: float | None = None, hi: float | None = None
) -> CheckResult:
    """Generic range-constraint check (engine extension of Q9's shape):
    rows with ``col`` outside [lo, hi] flagged, rows kept. Shuffle-free.
    """
    pred = F.lit(False)
    if lo is not None:
        pred = pred | (F.col(col) < F.lit(lo))
    if hi is not None:
        pred = pred | (F.col(col) > F.lit(hi))
    viol = df.filter(pred).withColumn("issue", F.lit(f"out_of_range:{col}"))
    return CheckResult("value_range", viol, df)


@dataclass
class QualityChecker:
    """Pipeline orchestrator over a catalog of tables + schema registry.

    Replaces the reference's ``run_all_checks`` / ``run_business_rules`` /
    ``get_cleaned_data_dict`` triple (dq:351-411), which runs every check
    twice and mutates tables in place. The engine runs each check ONCE,
    threading cleaned outputs forward, and returns violations as lazy
    DataFrames for the error sink.
    """

    registry: SchemaRegistry
    results: list[CheckResult] = field(default_factory=list)
    type_issues: dict[str, list[dict[str, str]]] = field(default_factory=dict)

    def run(self, tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
        cleaned: dict[str, DataFrame] = dict(tables)
        # parents first so FK checks see cleaned parents
        for name in self.registry.load_order():
            if name not in cleaned:
                continue
            schema = self.registry[name]
            df = cleaned[name]
            self.type_issues[name] = validate_column_types(df, schema)
            if schema.primary_key:
                res = validate_primary_keys(df, list(schema.primary_key))
                self._log(name, res)
                df = res.cleaned
            for fk in schema.foreign_keys:
                if fk.ref_table not in cleaned:
                    continue
                res = validate_foreign_keys(
                    df, list(fk.columns), cleaned[fk.ref_table], list(fk.ref_columns)
                )
                self._log(name, res)
                df = res.cleaned
            if schema.required:
                self._log(name, detect_required_nulls(df, list(schema.required)))
            res = detect_negative_values(df, schema.numeric_columns())
            self._log(name, res)
            cleaned[name] = df
        return cleaned

    def _log(self, table: str, res: CheckResult) -> None:
        self.results.append(
            CheckResult(f"{table}.{res.name}", res.violations, res.cleaned)
        )

    def violations_union(self) -> DataFrame | None:
        """All violations as one DataFrame ``(table_check, issue, row_json)``
        — the scalable form of the reference's per-(table, issue) error-CSV
        sink (dq:63-72): partition by check name at write time instead of
        one tiny file append per error row.
        """
        parts = []
        for r in self.results:
            v = r.violations
            parts.append(
                v.select(
                    F.lit(r.name).alias("check"),
                    F.col("issue"),
                    F.to_json(F.struct(*[c for c in v.columns if c != "issue"])).alias(
                        "row_json"
                    ),
                )
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
