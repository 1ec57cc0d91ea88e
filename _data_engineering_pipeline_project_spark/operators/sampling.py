"""Deterministic sampling + storage maintenance.

Training-data pipelines need REPRODUCIBLE samples: ``df.sample()`` is
seed-and-partitioning dependent, so re-running on re-partitioned data
changes the sample. ``hash_sample`` instead keys the decision on a stable
content hash of the key column — the same rows are selected on any
cluster, any partitioning, any engine (the DuckDB oracle reproduces it
with the same md5 arithmetic).

``compact_parquet`` is the small-files maintenance pass: micro-batch
sinks accumulate per-trigger files; compaction rewrites a directory into
size-targeted partitions so downstream scans stop paying per-file open
costs (the classic 100 TB 'millions of tiny files' failure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators.dedup import md5_hash60


def hash_bucket(col: Column | str, buckets: int = 10_000) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string form."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash60(c.cast("string")) % buckets


def hash_sample(
    df: DataFrame, key_col: str, rate: float, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose hash bucket < rate·buckets — deterministic,
    partitioning-independent, and stable across engines. Also gives
    CONSISTENT sampling: the 1% sample is a subset of the 10% sample."""
    keep = int(round(rate * buckets))
    return df.filter(hash_bucket(key_col, buckets) < keep)


def bottom_k_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """FIXED-SIZE uniform sample: the ``k`` rows with the smallest
    ``(md5(key), key)`` — the bottom-k (KMV) sampling scheme. Under
    the hash-as-random-oracle model this is a uniform
    without-replacement sample, but unlike ``rand()``-based reservoir
    sampling it is DETERMINISTIC (same input → same sample, any
    engine, any partitioning — oracle-checkable), CONSISTENT (the
    bottom-k is a subset of the bottom-2k; samples taken at different
    times agree on shared keys), and a MONOID (bottom-k of a union =
    bottom-k of the per-part bottom-k's — what makes it incrementally
    maintainable, ``streaming/samplemaint.py``, and
    embarrassingly mergeable across 100 TB partitions).

    Plan shape: ``ORDER BY h LIMIT k`` compiles to
    TakeOrderedAndProject — each task keeps a k-row heap and only
    k rows per partition reach the driver merge; no full sort, no
    shuffle of the data. ``rate``-based :func:`hash_sample` is the
    sibling for proportional samples; bottom-k is the fixed-BUDGET
    form (eval sets, spot-check panels, seed corpora).

    Contract: NULL keys are EXCLUDED (md5(NULL) is NULL, which Spark's
    ascending sort would otherwise place FIRST — NULL-keyed rows would
    silently fill the sample). Determinism requires ``key_col`` to be
    unique per row: duplicate keys tie on (h, key) and the choice
    among their payload rows is partition-order-dependent — sample by
    a key, not by a repeated attribute."""
    h = F.md5(F.col(key_col).cast("string"))
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__h", h)
        .orderBy("__h", key_col)
        .limit(k)
        .drop("__h")
    )


def bottom_k_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Stratified fixed-size sample: the bottom-``k``-by-hash rows
    WITHIN each group — a balanced per-stratum panel (k docs per
    language, k events per type) with all of :func:`bottom_k_sample`'s
    determinism (and the same NULL-key exclusion / unique-key
    contract). One window per group partition; at scale this is a
    single shuffle on ``group_col`` with the same k-row-heap
    economics inside each partition."""
    from pyspark.sql import Window

    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~target-size files; returns the
    output file count. Uses the source's on-disk size to pick the
    partition count (AQE coalesce handles the final merge)."""
    import os

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.repartition(n).write.mode("overwrite").parquet(dest_dir)
    return len(
        [
            f
            for dp, _, fs in os.walk(dest_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
    )


def write_clustered(
    df: DataFrame,
    dest_dir: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Data-skipping layout: repartition by range on ``cluster_cols`` and
    sort within each file, so parquet row-group min/max stats become
    SELECTIVE — a filter on the cluster column then skips whole row
    groups/files at scan time, the poor-man's Z-order (exact for 1-D
    clustering; multi-D keys get lexicographic locality).

    At 100 TB this is the difference between "pushed filter evaluated on
    every row group" and "row group never read": pushdown alone doesn't
    help when every file spans the whole key range (uniform writes give
    every row group min=global-min, max=global-max)."""
    parts = [F.col(c) for c in cluster_cols]
    w = df.repartitionByRange(*( [n_files] if n_files else [] ), *parts)
    w.sortWithinPartitions(*parts).write.mode("overwrite").parquet(dest_dir)


def zorder_value(col_a: Column | str, col_b: Column | str) -> Column:
    """Morton (Z-order) interleave of two NON-NEGATIVE int columns into
    one sort key: bit i of each input lands at bits 2i / 2i+1 of the
    output, so sorting by it gives locality in BOTH dimensions at once —
    the multi-column generalization of 1-D range clustering
    (``write_clustered``). Inputs are used modulo 2^31; rank-transform
    skewed/large domains first. NULLs map to lane 0.

    Pure-codegen implementation (``functions/zorder.py:zorderk`` at
    full 31-bit lanes). This replaced an Arrow-batched numpy
    bit-spreading UDF whose docstring ASSUMED the 124-term expression
    would bloat codegen past the UDF's cost — measured r9 (20M rows,
    local[32]): codegen 0.41 s vs Arrow UDF 0.81 s, bit-identical keys.
    Arrow serialization costs more than the unrolled shift/mask terms,
    and the write job now contains no Python worker at all."""
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk,
    )

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    mask = F.lit(0x7FFFFFFF)
    return zorderk(
        [
            F.coalesce(a.cast("long"), F.lit(0)).bitwiseAND(mask),
            F.coalesce(b.cast("long"), F.lit(0)).bitwiseAND(mask),
        ],
        31,
    )


def write_zordered(
    df: DataFrame,
    dest_dir: str,
    col_a: str,
    col_b: str,
    n_files: int | None = None,
) -> None:
    """Z-order clustered write: range-partition + sort by the Morton key
    of (col_a, col_b), then drop it. Each output file covers a compact
    rectangle-ish region of the 2-D key space, so row-group min/max
    stats are selective for predicates on EITHER column — 1-D clustering
    can only serve one of them."""
    z = df.withColumn("__z", zorder_value(col_a, col_b))
    parts = [F.col("__z")]
    w = z.repartitionByRange(*([n_files] if n_files else []), *parts)
    (
        w.sortWithinPartitions(*parts)
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dest_dir)
    )


def hilbert_value(col_a: Column | str, col_b: Column | str, order: int = 16) -> Column:
    """Hilbert curve distance of two NON-NEGATIVE int columns (used modulo
    2^order): like the Morton key (``zorder_value``) but with strictly
    better locality — consecutive curve positions are always grid
    neighbors (Morton jumps at quadrant seams), so clustered files get
    tighter worst-case key ranges. Vectorized numpy xy2d transform; cost
    is ``order`` masked passes per batch at WRITE time only."""
    from pyspark.sql.types import LongType

    n = 1 << order

    @F.pandas_udf(LongType())
    def _hilbert(a: pd.Series, b: pd.Series) -> pd.Series:
        x = a.fillna(0).to_numpy(dtype=np.int64) % n
        y = b.fillna(0).to_numpy(dtype=np.int64) % n
        d = np.zeros_like(x)
        s = n >> 1
        while s > 0:
            rx = np.where((x & s) > 0, 1, 0)
            ry = np.where((y & s) > 0, 1, 0)
            d += s * s * ((3 * rx) ^ ry)
            flip = (ry == 0) & (rx == 1)
            xf = np.where(flip, s - 1 - x, x)
            yf = np.where(flip, s - 1 - y, y)
            swap = ry == 0
            x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
            s >>= 1
        return pd.Series(d)

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    return _hilbert(a, b)


def write_hilbert(
    df: DataFrame,
    dest_dir: str,
    col_a: str,
    col_b: str,
    n_files: int | None = None,
    order: int = 16,
) -> None:
    """Hilbert-clustered write — same mechanics as ``write_zordered``
    with the Hilbert distance as the sort key."""
    h = df.withColumn("__h", hilbert_value(col_a, col_b, order))
    parts = [F.col("__h")]
    w = h.repartitionByRange(*([n_files] if n_files else []), *parts)
    (
        w.sortWithinPartitions(*parts)
        .drop("__h")
        .write.mode("overwrite")
        .parquet(dest_dir)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 50,
    id_col: str = "doc_id",
    round_digits: int = 12,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis,
    IPL 2006): each row draws key = u^(1/w) with u uniform in (0,1);
    the k largest keys are a weight-proportional sample. The uniform is
    md5-derived (seedless, engine-portable — the same construction as
    ``hash_sample``), so the sample is DETERMINISTIC and reproducible by
    the SQL oracle; the top-k cut is ``orderBy().limit()`` (TakeOrdered:
    per-partition heaps, one tiny merge — no global sort or window of
    the full table). Keys are rounded before ranking (pow() may differ
    in the last ulp across engines) with the id as tiebreak.

    Rows with NULL or non-positive weight are excluded (their inclusion
    probability is undefined)."""
    h = md5_hash60(F.col(id_col).cast("string")).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float((1 << 60) + 1))  # (0, 1]
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), round_digits)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select(F.col(id_col), F.col(weight_col), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    buckets: int = 1 << 30,
) -> DataFrame:
    """Temperature-based stratum rebalancing — the multilingual mixture
    step of multilingual-LM pipelines (sampling rate ∝ p^alpha flattens
    the language distribution; alpha=0.5 is a common published setting,
    e.g. the multilingual-BERT exponent-smoothing recipe).

    Per-stratum keep rate r_s = (n_min / n_s)^(1-alpha), which normalizes
    the rarest stratum to keep everything. For the default alpha=0.5 the
    rate is computed as ``sqrt(n_min / n_s)``: bigint-over-bigint double
    division then IEEE sqrt are both correctly rounded, so the rate — and
    therefore every keep/drop decision against the md5 uniform — is
    bit-identical in any engine (the hash_sample portability contract).
    Other alphas go through ``pow`` whose last ulp is libm-dependent;
    fine in production, but cross-engine tests should stick to 0.5.

    Scale shape: the stratum census is one tiny aggregate (|strata| rows,
    map-side combined); it joins back as a broadcast, so the corpus is
    never shuffled — keep/drop is a scan-side filter exactly like
    hash_sample."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min))
    ratio = F.col("n_min") * F.lit(1.0) / F.col("n_s")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    rates = rates.select(strata_col, rate.alias("keep_rate"))
    u = hash_bucket(key_col, buckets) * F.lit(1.0) / F.lit(float(buckets))
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("__u", u)
        .filter(F.col("__u") < F.col("keep_rate"))
        .drop("__u")
    )


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: DataFrame,
    buckets: int = 1 << 30,
) -> DataFrame:
    """Largest feasible subsample whose stratum proportions match a
    TARGET mixture — the domain-mixture step of pretraining pipelines
    (e.g. rebalance web/books/code to design weights).

    ``weights`` is a tiny (stratum, weight) frame; proportions need not
    be normalized. The scaling constant K = min_s(n_s / w_s) is the
    largest total for which no stratum is oversampled; stratum keep rate
    is (w_s * K) / n_s — the rarest-relative-to-target stratum keeps
    everything, all others downsample exactly to the mixture.

    Determinism contract (matches temperature_resample): every rate is a
    chain of identical IEEE divisions/multiplications over exact bigint
    counts and exact weight doubles, and the keep decision is the md5
    uniform — so any engine materializes the same sample. Census and
    rates are broadcast; the corpus never shuffles."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    joined = counts.join(weights, strata_col)
    # zero-weight strata are excluded from K (min ignores nulls) and get
    # rate 0 — dropped entirely, not a divide-by-zero under ANSI mode
    k = joined.agg(
        F.min(
            F.when(F.col("weight") > 0, F.col("n_s") / F.col("weight"))
        ).alias("K")
    )
    rates = joined.crossJoin(F.broadcast(k)).select(
        strata_col,
        F.when(
            F.col("weight") > 0,
            (F.col("weight") * F.col("K")) / F.col("n_s"),
        )
        .otherwise(F.lit(0.0))
        .alias("keep_rate"),
    )
    u = hash_bucket(key_col, buckets) * F.lit(1.0) / F.lit(float(buckets))
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("__u", u)
        .filter(F.col("__u") < F.col("keep_rate"))
        .drop("__u")
    )


def dsir_importance_scores(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    fp_scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed unigram
    bucket features, add-one-smoothed bucket likelihoods under the
    TARGET token distribution (rows matching ``target_pred``) vs the
    RAW corpus, per-document importance = Σ log-likelihood-ratio over
    its tokens. Documents scoring high "look like the target" — the
    standard cheap proxy for quality/domain selection at pre-training
    scale.

    Determinism/parity design (the house fixed-point rule): each
    bucket's log-ratio is rounded onto a 10^-6 fixed-point lane BEFORE
    the per-document sum, so the doc score is an EXACT long sum —
    commutative, association-free, bit-identical across engines — and
    last-ulp ln() differences (JVM vs libm) are absorbed by the
    rounding. Scale shape: one groupBy(bucket) pair of counts
    (``buckets``-bounded), the ≤``buckets``-row ratio table broadcast
    into the token relation, one per-doc sum — no window, no
    all-pairs, nothing corpus²; at 100 TB the only corpus-sized pass
    is the tokenize.

    Returns (id, n_tokens, score_fp, dsir_score) for every document
    with ≥1 token; callers rank/threshold on the exact ``score_fp``."""
    from _data_engineering_pipeline_project_spark.operators import (
        textstats as TS,
    )

    toks = docs.select(
        F.col(id_col),
        target_pred.alias("__tgt"),
        F.explode(TS.tokens(text_col)).alias("term"),
    ).filter(F.length("term") > 0)
    toks = toks.withColumn("b", md5_hash60(F.col("term")) % buckets)
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        toks.filter(F.col("__tgt"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).alias("R"),
        F.count(F.when(F.col("__tgt"), F.lit(1))).alias("T"),
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        / (F.col("T") + buckets)
                    )
                    - F.log((F.col("cr") + 1) / (F.col("R") + buckets))
                )
                * fp_scale
            )
            .cast("long")
            .alias("lr_fp"),
        )
    )
    return (
        toks.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_fp").alias("score_fp"),
        )
        .select(
            id_col,
            "n_tokens",
            "score_fp",
            F.round(F.col("score_fp") / F.lit(float(fp_scale)), 6).alias(
                "dsir_score"
            ),
        )
    )
