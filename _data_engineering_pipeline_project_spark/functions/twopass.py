"""Bucketed two-pass prefix aggregation — exact global-order cumulative
sums and row ranks WITHOUT a single-partition sort.

The classic scale trap in prefix-style analytics (Pareto cuts, ECDFs,
rank-sum tests, quantile scoring) is ``Window.orderBy(...)`` with no
partition key: Spark moves every row to one partition and sorts it on a
single core. This module ships the standard two-phase scan instead:

1. **Bin** rows into ``buckets`` ranges with a bucket id that is a
   MONOTONE function of the leading order column (fixed-width over the
   observed [min, max], one fully-parallel pass). Monotone + equal-value
   → same-bucket means per-bucket ordering by the full sort key is
   globally consistent, and the binning is deterministic (no sampling —
   re-computation of the frame can never disagree with itself, unlike
   ``repartitionByRange`` whose reservoir-sampled boundaries are not
   guaranteed stable across plan-subtree re-execution).
2. **Local pass**: cumulative sums / row_number per bucket — a
   hash-partitioned window, so the sort shards across the cluster with
   |rows| / buckets rows per task.
3. **Stitch**: per-bucket totals (≤ ``buckets`` rows) are paired with a
   triangular self-join (≤ buckets² comparisons, broadcast) to form
   each bucket's exclusive prefix offset; offsets broadcast-join back
   and local + offset = exact global value.

Worst case (all rows share one leading value) degrades to the single
sort it replaces — never worse; typical case is embarrassingly
parallel. Fixed-width binning is skew-sensitive on pathological
leading-column distributions; pass ``equi_depth=True`` to derive the
bucket boundaries from a one-shot driver-side ``approxQuantile`` of
the leading key instead — the boundaries are embedded as LITERALS in
the plan (still deterministic across plan-subtree re-execution, unlike
``repartitionByRange``'s per-execution reservoir sample) and only ever
change performance, never results, because correctness needs only
monotonicity.

NULL / NaN leading keys: a NULL key buckets to 0 (matching Spark's
ascending nulls-first window ordering this primitive replaces) and a
NaN double buckets to the LAST bucket (Spark orders NaN after every
other value); NaN is likewise excluded from the [min, max] envelope so
it cannot poison the span arithmetic.

No counterpart in the reference (pandas cumsum over an in-memory frame,
``project/etl2.py``-style); this is the Spark-native scale form that the
global-window envelope queries cite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucketed_cumulative"]


def bucketed_cumulative(
    df: DataFrame,
    order_cols: list[str],
    sums: dict[str, str] | None = None,
    rank_col: str | None = None,
    count_col: str | None = None,
    prev_maxes: dict[str, str] | None = None,
    buckets: int = 32,
    equi_depth: bool = False,
) -> DataFrame:
    """Add exact global-order prefix columns to ``df`` without a
    single-partition WindowExec.

    Parameters
    ----------
    order_cols : ascending sort key; the LEADING column must be numeric
        (int / bigint / decimal / double) or string (binary collation) —
        it drives the monotone bucket binning. NULL and NaN leading keys
        are handled (NULL bins first, NaN last, matching Spark's window
        ordering). For a descending numeric leading key, pass its
        negation (exact for int/decimal).
    sums : {source_col: output_col} inclusive prefix sums over the
        global order.
    rank_col : optional output column for the global 1-based
        row_number over the order.
    count_col : optional output column holding the total row count
        (handy for rank/total ratios downstream).
    equi_depth : derive bucket boundaries from a one-shot driver-side
        ``approxQuantile`` over the leading key instead of fixed-width
        [min, max] splitting. Costs one extra eager scan at plan-build
        time, but keeps per-bucket row counts balanced under skewed
        leading-key distributions (e.g. 99% of keys in a narrow range
        plus far outliers, which collapses fixed-width binning into one
        bucket). Boundaries are embedded as plan literals, so the
        binning stays deterministic across plan-subtree re-execution.
        Performance-only: any monotone binning yields identical results.
    prev_maxes : {source_col: output_col} EXCLUSIVE prefix maxima
        (running max over strictly-preceding rows; NULL on each
        bucket-global first row) — max is associative, so the same
        local-pass + prior-bucket-offset stitch applies, combined with
        ``greatest`` instead of ``+``.
    """
    sums = sums or {}
    prev_maxes = prev_maxes or {}
    lead = order_cols[0]

    # numeric projection of the leading key for binning. Numerics cast
    # to double (monotone; collisions only merge buckets). Strings use
    # the first 7 bytes as a big-endian integer, ZERO-PADDED to fixed
    # width — padding is what keeps the projection monotone under
    # binary collation ("b" must outrank "aaa"); ties beyond 7 bytes
    # simply share a bucket, which bucketing tolerates by construction.
    from pyspark.sql.types import StringType

    if isinstance(df.schema[lead].dataType, StringType):
        # coalesce NULL → "": both sort first ascending (nulls-first ==
        # empty-string-first), so they share bucket 0 and the true
        # column still breaks the tie inside the bucket
        key_expr = F.conv(
            F.hex(
                F.rpad(
                    F.coalesce(F.col(lead), F.lit("")).cast("binary"),
                    7,
                    bytes(1),
                )
            ),
            16,
            10,
        ).cast("double")
    else:
        key_expr = F.col(lead).cast("double")

    # NULL keys must bucket FIRST (Spark's ascending window ordering is
    # nulls-first) and NaN doubles must bucket LAST (Spark orders NaN
    # after every other value) — and NaN must stay out of the [min, max]
    # envelope, where it would poison the span arithmetic. The string
    # projection above never produces NULL (coalesced) or NaN (≤2^56
    # integer), so these guards only ever fire on numeric leading keys.
    finite_key = F.when(~F.isnan(key_expr), key_expr)

    if equi_depth:
        # one eager driver-side quantile scan; the boundaries become
        # LITERALS in the plan, so (unlike repartitionByRange's
        # per-execution reservoir sample) re-computation of the frame
        # can never disagree with itself. Duplicated quantiles collapse
        # — heavy values merge buckets, which bucketing tolerates.
        probs = [i / buckets for i in range(1, buckets)]
        bounds = sorted(
            set(
                df.select(finite_key.alias("_tp_k"))
                .where(F.col("_tp_k").isNotNull())
                .approxQuantile("_tp_k", probs, 0.001)
            )
            if probs
            else []
        )
        core = F.lit(0)
        for b in bounds:
            # Σ [key >= boundary] — monotone non-decreasing in the key,
            # equal keys always share a bucket
            core = core + (key_expr >= F.lit(float(b))).cast("int")
        bkt = (
            F.when(key_expr.isNull(), F.lit(0))
            .when(F.isnan(key_expr), F.lit(len(bounds)))
            .otherwise(core)
        )
        binned = df.withColumn("_tp_bkt", bkt)
    else:
        # pass 0: key-space envelope (fully parallel min/max), broadcast
        # so the bucket id is a map-side expression
        env = df.agg(
            F.min(finite_key).alias("_tp_lo"),
            F.max(finite_key).alias("_tp_hi"),
        )
        span = F.col("_tp_hi") - F.col("_tp_lo")
        # monotone non-decreasing in the leading key (IEEE subtract/
        # divide/multiply by a positive constant preserve order); equal
        # keys always share a bucket, so full-key ordering inside a
        # bucket is globally consistent. A degenerate span (empty/
        # all-NULL input → NULL; single value → 0; ±Infinity endpoints
        # → Infinity/NaN) collapses to one bucket: the degraded-to-one-
        # sort worst case, never a correctness change.
        degenerate = (
            span.isNull()
            | (span <= 0)
            | F.isnan(span)
            | (span == F.lit(float("inf")))
        )
        bkt = (
            F.when(key_expr.isNull(), F.lit(0))
            .when(F.isnan(key_expr), F.lit(buckets - 1))
            .when(degenerate, F.lit(0))
            .otherwise(
                F.least(
                    F.floor((key_expr - F.col("_tp_lo")) / span * buckets),
                    F.lit(buckets - 1),
                )
            )
        )
        binned = (
            df.crossJoin(F.broadcast(env))
            .withColumn("_tp_bkt", bkt)
            .drop("_tp_lo", "_tp_hi")
        )

    # pass 1: per-bucket local prefix values (hash-partitioned window —
    # the sort shards across buckets)
    ordering: list[Column] = [F.col(c) for c in order_cols]
    w_cum = (
        Window.partitionBy("_tp_bkt")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = binned
    for src, dst in sums.items():
        out = out.withColumn(dst, F.sum(src).over(w_cum))
    if prev_maxes:
        w_prev = (
            Window.partitionBy("_tp_bkt")
            .orderBy(*ordering)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        for src, dst in prev_maxes.items():
            out = out.withColumn(dst, F.max(src).over(w_prev))
    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            F.row_number().over(
                Window.partitionBy("_tp_bkt").orderBy(*ordering)
            ),
        )

    # pass 2: per-bucket totals (≤ `buckets` rows) → exclusive prefix
    # offsets via a triangular self-join (≤ buckets² pairs, broadcast,
    # no WindowExec anywhere)
    tot_aggs = [
        F.sum(src).alias(f"_tp_t_{dst}") for src, dst in sums.items()
    ]
    tot_aggs.extend(
        F.max(src).alias(f"_tp_t_{dst}") for src, dst in prev_maxes.items()
    )
    tot_aggs.append(F.count(F.lit(1)).alias("_tp_t_cnt"))
    tot = binned.groupBy("_tp_bkt").agg(*tot_aggs)
    off_aggs = [
        F.coalesce(F.sum(F.col(f"b._tp_t_{dst}")), F.lit(0)).alias(
            f"_tp_o_{dst}"
        )
        for dst in sums.values()
    ]
    off_aggs.extend(
        # no coalesce: bucket 0 has NO prior-bucket max, and that NULL
        # is meaningful (the bucket-global first row's exclusive max)
        F.max(F.col(f"b._tp_t_{dst}")).alias(f"_tp_o_{dst}")
        for dst in prev_maxes.values()
    )
    off_aggs.append(
        F.coalesce(F.sum(F.col("b._tp_t_cnt")), F.lit(0)).alias("_tp_o_cnt")
    )
    off = (
        tot.alias("a")
        .join(tot.alias("b"), F.col("b._tp_bkt") < F.col("a._tp_bkt"), "left")
        .groupBy(F.col("a._tp_bkt").alias("_tp_bkt"))
        .agg(*off_aggs)
    )

    out = out.join(F.broadcast(off), "_tp_bkt")
    for dst in sums.values():
        out = out.withColumn(dst, F.col(dst) + F.col(f"_tp_o_{dst}")).drop(
            f"_tp_o_{dst}"
        )
    for dst in prev_maxes.values():
        # greatest() is null-skipping, so (local NULL, offset x) → x,
        # (local y, offset NULL) → y, (NULL, NULL) → NULL — exactly the
        # exclusive-prefix-max semantics across the bucket boundary
        out = out.withColumn(
            dst, F.greatest(F.col(dst), F.col(f"_tp_o_{dst}"))
        ).drop(f"_tp_o_{dst}")
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col(rank_col) + F.col("_tp_o_cnt")).cast("bigint")
        )
    if count_col is not None:
        n = tot.agg(F.sum("_tp_t_cnt").cast("bigint").alias(count_col))
        out = out.crossJoin(F.broadcast(n))
    return out.drop("_tp_bkt", "_tp_o_cnt")
