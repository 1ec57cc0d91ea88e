"""Z-order (Morton-curve) clustered writes — the data-LAYOUT lever for
100 TB read paths.

Parquet readers skip whole row groups whose column min/max statistics
exclude a pushed-down predicate, but statistics only help if values are
CLUSTERED: a round-robin-written table has every file spanning the full
value range of every column, so nothing is ever skipped. Sorting by one
column fixes pruning for that column only. Interleaving the bits of k
quantized columns into one Morton key and range-partitioning + sorting
by it gives every file a narrow span in EVERY keyed dimension
(a contiguous z-range covering fraction p of the curve spans ~p^(1/k)
of each dimension), so multi-dimensional point/range predicates prune
files and row groups without any index structure — the same layout
trick as Delta's OPTIMIZE ZORDER BY and Iceberg's z-order rewrite,
expressed with nothing but built-in expressions:

- quantization and bit-interleave are pure codegen'd column math
  (no UDF);
- the ONLY shuffle is the ``repartitionByRange`` the clustered write
  needs anyway (plus Spark's small range-boundary sampling job);
- at 100 TB this runs as a one-off layout job (or per-partition
  compaction step, cf. streaming/compactmaint.py) whose cost is one
  full shuffle, repaid on every subsequent selective scan.

Everything here is deterministic (min/max stats + integer bit ops on
an IEEE-pinned quantization), so the z-key computation itself is
oracle-checkable in DuckDB bit-for-bit (queries_ext9.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantized(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Map ``col`` from ``[mn, mx]`` onto integer ``[0, 2^bits - 1]``:
    ``floor((col - mn) * (2^bits - 1) / (mx - mn))`` computed in DOUBLE
    (sub → mul → div, an order any SQL engine reproduces bit-for-bit;
    the intermediate magnitude stays far under 2^53, so the floor is
    exact). A zero span (constant column) maps everything to 0."""
    maxq = F.lit(float((1 << bits) - 1))
    span = mx.cast("double") - mn.cast("double")
    q = F.floor((col.cast("double") - mn.cast("double")) * maxq / span)
    return F.when(span == 0, F.lit(0)).otherwise(q).cast("long")


def interleave_bits(qcols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(qcols)`` already-quantized integer
    columns, ``bits`` bits each (``len(qcols) * bits`` must fit a
    signed 64-bit key, i.e. ≤ 63). Bit j of column c lands at position
    ``j * len(qcols) + c`` — one flat OR of shift/mask terms, fully
    inside whole-stage codegen."""
    n = len(qcols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 64-bit key")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qcols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "z_key"
) -> DataFrame:
    """``df`` plus a Morton key over ``cols`` (numeric). Column min/max
    come from one aggregate broadcast-cross-joined back (a declared
    plan — no driver collect), then quantize + interleave are pure
    per-row column math."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    j = df.crossJoin(F.broadcast(stats))
    qs = [
        quantized(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    return j.withColumn(key_col, interleave_bits(qs, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of ``cols``:
    ``repartitionByRange`` on the key (contiguous, balanced z-ranges
    per file — Spark samples the key for boundaries, the one extra
    small job a clustered write costs) + ``sortWithinPartitions`` so
    row groups WITHIN a file are clustered too (row-group-level skips,
    not just file-level). The key column itself is dropped before the
    write — the layout, not the value, is the product."""
    keyed = with_zorder_key(df, cols, bits, "__z")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stat_spans(spark, path: str, col: str) -> list[float]:
    """Per-file normalized min/max span of ``col`` from parquet FOOTER
    metadata only (the same statistics a reader's row-group pruning
    consults) — the layout-quality audit: a z-ordered table shows
    per-file spans ≪ 1, a round-robin table ~1.0. Driver-side pyarrow
    footer reads, bounded by the file count (an audit tool, not a
    query operator)."""
    import pyarrow.parquet as pq

    df = spark.read.parquet(path)
    files = [f.replace("file:", "") for f in df.inputFiles()]
    mins, maxs, spans = [], [], []
    per_file = []
    for f in files:
        md = pq.read_metadata(f)
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                if cc.path_in_schema != col or cc.statistics is None:
                    continue
                st = cc.statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None:
            per_file.append((float(fmin), float(fmax)))
            mins.append(float(fmin))
            maxs.append(float(fmax))
    lo, hi = min(mins), max(maxs)
    width = (hi - lo) or 1.0
    return [(b - a) / width for a, b in per_file]
