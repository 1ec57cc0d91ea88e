"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right, on, left_ts, right_ts)``: for every left row,
attach the single most recent right row with ``right_ts <= left_ts`` for
the same key (the classic point-in-time lookup: trades→quotes,
event→latest-profile-version).

Implementation is the union-tag-window pattern, all built-ins:
union both sides tagged, sort within key by (ts, side-tag), and propagate
the last seen right row with ``last(..., ignorenulls=True)`` over the
running window. One shuffle on the key — same cost as a regular join —
versus ``pd.merge_asof`` inside ``applyInPandas`` which forces per-group
pandas materialization. Skewed keys are handled by AQE like any other
window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key
    (``direction="backward"``, the default), or the EARLIEST right row
    with right_ts >= left_ts (``direction="forward"`` — the
    next-event-after lookup: click→next deploy, trade→next quote refresh).
    Forward is the same union-tag-window plan with the ordering reversed;
    the cost envelope is identical (one shuffle on the key).

    Ties on the timestamp prefer the right row (a right row AT the left
    timestamp is visible to it). Right-side ties at the same right_ts are
    broken deterministically by the largest payload ordering.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *right_cols]
            ) + ">"
        ).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {left.schema[c].dataType.simpleString()}" for c in left.columns
            ) + ">"
        ).alias("__l"),
        F.struct(
            F.col(right_ts), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # __side=0 (right) sorts before __side=1 (left) at equal ts → a right
    # row at exactly left_ts is already visible; forward scans time
    # descending so "last right seen" is the nearest FUTURE right row
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__last_r.{right_ts}").alias(f"{right_ts}{suffix}"))
    out_cols.extend(
        F.col(f"__last_r.{c}").alias(f"{c}{suffix}") for c in right_cols
    )
    return matched.filter(F.col("__side") == 1).select(*out_cols)
