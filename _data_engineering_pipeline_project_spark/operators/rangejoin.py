"""Time-window range join — bucketized equi-join, not a nested loop.

``range_join_within(left, right, on, left_ts, right_ts, max_gap)``: pairs
(l, r) with the same key where ``left_ts <= right_ts <= left_ts+max_gap``.

Spark plans a raw inequality join as BroadcastNestedLoopJoin (quadratic).
The engine instead floors both sides to ``max_gap``-width buckets and
equi-joins on (key, bucket), with the left side exploded into its bucket
and the successor (a right row within the gap lives in one of the two),
then applies the exact range filter. This turns an O(n·m) nested loop into
a hash join shuffling each row at most twice — the standard interval-join
decomposition used by stream processors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner range join: same key, right_ts in [left_ts, left_ts+gap]."""
    gap = F.lit(max_gap_seconds)
    # floor, not cast: cast truncates toward zero, which mis-buckets
    # pre-1970 (negative-epoch) timestamps
    l_bucket = F.floor(F.unix_timestamp(F.col(left_ts)) / max_gap_seconds).cast("long")
    r_bucket = F.floor(F.unix_timestamp(F.col(right_ts)) / max_gap_seconds).cast("long")

    l_cols = [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    r_cols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]

    l_exp = left.select(
        *l_cols,
        *[F.col(c).alias(f"__k_{c}") for c in on],
        F.explode(F.array(l_bucket, l_bucket + 1)).alias("__bucket"),
    )
    r_tag = right.select(
        *r_cols,
        *[F.col(c).alias(f"__k_{c}") for c in on],
        r_bucket.alias("__bucket"),
    )
    joined = l_exp.join(r_tag, [*[f"__k_{c}" for c in on], "__bucket"])
    lt = F.col(f"{left_prefix}{left_ts}")
    rt = F.col(f"{right_prefix}{right_ts}")
    return (
        joined.filter((rt >= lt) & (rt <= lt + F.make_interval(secs=gap)))
        .drop("__bucket", *[f"__k_{c}" for c in on])
    )
