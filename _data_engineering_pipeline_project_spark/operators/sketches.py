"""Deterministic mergeable sketches — one per classic estimation
problem: KMV (distinct counts), fixed-bin histograms (quantiles),
Count-Min (frequencies).

Spark's built-ins (``approx_count_distinct`` = HyperLogLog++,
``percentile_approx`` = KLL-ish) are engine-specific, so their
estimates can only be rows-only-checked. Each sketch here is instead a
PURE FUNCTION of the data (md5-derived hashing, no RNG, no bias
tables): any engine reproduces the exact estimate — which makes them
DuckDB-oracle-able — and each merges exactly (k-smallest of a union
from k-smallest of parts; bin counts add; CM counters add), so partial
sketches combine associatively across partitions, nodes, and days
(time-merge is what streaming/sketchmaint.py builds on).

Public references: Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations" (SIGMOD'07) for KMV; Cormode &
Muthukrishnan, "An Improved Data Stream Summary: The Count-Min Sketch
and its Applications" (J. Algorithms 2005).
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
    # single source of truth for the cross-engine-portable construction
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        md5_hash60,
    )

    return md5_hash60(col.cast("string"))


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
    # group cast to string so the Arrow partial's declared schema
    # ("g string") holds for non-string group columns too
    hashed = df.select(
        F.col(group_col).cast("string").alias("g"),
        _hash60(F.col(value_col)).alias("h"),
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


def binned_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple = (0.5, 0.9, 0.99),
    bins: int = 256,
) -> DataFrame:
    """Mergeable approximate quantiles via fixed equi-width binning —
    the histogram-sketch answer to "p99 per group over 100 TB".

    Spark's ``percentile_approx`` (KLL-ish) and exact sort-based
    percentiles are either engine-specific or need a per-group sort;
    a fixed binning is the simplest mergeable quantile sketch: bin
    counts add associatively across partitions/nodes/days, error is
    bounded by (max-min)/bins, and the estimate is a pure function of
    the data — reproducible by the SQL oracle bit-for-bit.

    Plan: one (min, max, n) aggregate per group (broadcast back), one
    (group, bin) count aggregate, a per-group running sum over ≤
    ``bins`` rows, then linear interpolation inside the target bin at
    rank p·n. Two shuffles total, both keyed by group(+bin) — no sort
    of the values themselves. Constant groups (width 0) report the
    constant for every p.
    """
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v")
    )
    stats = vals.groupBy("g").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    binned = (
        vals.join(F.broadcast(stats), "g")
        .select(
            "g",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("v") - F.col("lo")) / width),
                    F.lit(bins - 1),
                )
            )
            .cast("int")
            .alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_below", F.col("cum") - F.col("cnt")
    )
    pr = F.array(*[F.lit(float(p)) for p in probs])
    targets = stats.select(
        "g", "lo", "hi", "n", F.explode(pr).alias("p")
    ).withColumn("target", F.col("p") * F.col("n"))
    # smallest bin whose cumulative count reaches the target rank
    hit = (
        targets.join(cum, "g")
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("g", "p", "lo", "hi", "target")
        .agg(
            F.min_by(
                F.struct(F.col("bin"), F.col("cnt"), F.col("cum_below")),
                F.col("bin"),
            ).alias("b")
        )
        .select(
            "g",
            "p",
            "lo",
            "hi",
            "target",
            F.col("b.bin").alias("bin"),
            F.col("b.cnt").cast("double").alias("cnt_d"),
            F.col("b.cum_below").cast("double").alias("cum_below_d"),
        )
    )
    width2 = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo")
        + width2
        * (
            F.col("bin")
            + F.greatest(
                (F.col("target") - F.col("cum_below_d")) / F.col("cnt_d"),
                F.lit(0.0),
            )
        )
    )
    return hit.select(
        F.col("g").alias(group_col),
        F.col("p"),
        F.round(est, 6).alias("quantile_est"),
    )


def cm_sketch_counters(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch counter table (j, bucket, cnt): ``depth``
    independent md5-derived hash rows of ``width`` buckets each. The
    counters are plain additive group-by counts — mergeable across
    partitions, nodes, and days like every counter matrix — and the
    whole sketch is depth×width rows regardless of input size.
    """
    rows = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("item")
    )
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    keyed = rows.select("item", j).select(
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("j"), F.col("item"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("bucket"),
    )
    return keyed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    items: DataFrame,
    counters: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the Count-Min counters: est(item) = min over the
    ``depth`` rows of the counter its hashes land in (CM never
    underestimates; collisions only inflate). The counter table is
    depth×width rows — broadcast to the probe side."""
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    probes = items.select(
        F.col(item_col), F.col(item_col).cast("string").alias("__s")
    ).select(
        item_col,
        j,
        F.col("__s").alias("__s"),
    ).select(
        item_col,
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("j"), F.col("__s"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_est"))
    )
