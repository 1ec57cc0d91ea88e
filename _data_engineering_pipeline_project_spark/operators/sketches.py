"""Deterministic mergeable sketches: KMV (k-minimum-values) distinct
counting.

Spark's built-in ``approx_count_distinct`` is HyperLogLog++ — fast but
its estimate is engine-specific (register layout + bias tables), so it
can only be rows-only-checked. KMV is the sketch whose estimate is a
pure function of the data: keep the k smallest distinct hash values;
estimate = (k-1) / u_k with u_k the k-th smallest hash mapped into
[0, 1). Any engine hashing with the same function produces the SAME
estimate — which makes it DuckDB-oracle-able, and (like all
order-statistic sketches) exactly mergeable: the k smallest of a union
is computable from the k smallest of each part, so partial sketches
combine associatively across partitions/nodes/days.

Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations" (SIGMOD'07) is the public reference for the estimator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-derived 60-bit hash, uniform on [0, 2^60) — same construction the
# MinHash/LSH operators use; DuckDB reproduces it with
# CAST('0x' || substr(md5(v), 1, 15) AS BIGINT)
_HASH_SPACE = float(1 << 60)


def _hash60(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    partial_per_partition: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate via a KMV sketch.

    Scale shape: with ``partial_per_partition`` (the default), each input
    partition first reduces to at most k smallest distinct hashes per
    group via an Arrow-batched pass — the shuffle then moves
    O(k · partitions · groups) rows instead of every distinct value,
    which is the point of a sketch on a 1000-executor cluster. Because
    k-smallest is exactly mergeable, the partial pass does NOT change
    the result: the merged k smallest equal the global k smallest, so
    the estimate is identical with the flag off (the oracle twin
    computes the global form in SQL).

    Groups with fewer than k distinct values report their EXACT count
    (the sketch is lossless below k). Returns
    (group, n_kmv, est_distinct) with est = (k-1)/u_k rounded to 4.
    """
    hashed = df.select(
        F.col(group_col).alias("g"), _hash60(F.col(value_col)).alias("h")
    )

    if partial_per_partition:
        out_schema = "g string, h long"

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # one partition = many Arrow batches; fold them into a
            # bounded per-group k-smallest state before emitting
            state: dict = {}
            for pdf in batches:
                for g, grp in pdf.groupby("g", dropna=False):
                    hs = grp["h"].drop_duplicates()
                    prev = state.get(g)
                    merged = (
                        pd.concat([prev, hs]) if prev is not None else hs
                    )
                    state[g] = (
                        merged.drop_duplicates().nsmallest(k).reset_index(
                            drop=True
                        )
                    )
            if state:
                yield pd.concat(
                    [pd.DataFrame({"g": g, "h": hs}) for g, hs in state.items()],
                    ignore_index=True,
                )

        hashed = hashed.mapInPandas(partial, out_schema)

    # merge: global k smallest distinct per group (one shuffle on g; the
    # row_number window rides the same partitioning)
    distinct = hashed.distinct()
    w = Window.partitionBy("g").orderBy("h")
    topk = distinct.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return topk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_kmv"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(
                (F.lit(k - 1) * _HASH_SPACE) / F.max("h").cast("double")
            ),
            4,
        ).alias("est_distinct"),
    ).select(F.col("g").alias(group_col), "n_kmv", "est_distinct")
