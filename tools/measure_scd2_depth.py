"""SCD2 version-depth scaling measurement (VERDICT r8 next #4).

SCALE.md already shows scd2 flat at 100× FACTS; this tool measures the
other axis — a DEEP VERSION CHAIN (many committed merges) — for the
three depth-sensitive operations:

- **merge tick**: claim O(snapshot + batch), INDEPENDENT of depth —
  ``Scd2Table.merge`` reads only ``current()`` (one snapshot dir), never
  the chain. A fixed batch into a 1-deep vs D-deep table must be flat.
- **point-in-time probe** (``as_of_timestamp``): reads ``history()``,
  which unions every per-version delta dir above the compaction base —
  O(archived rows + #delta dirs of listing). Inherent to an audit
  trail, measured honestly; the mitigation is the next row.
- **probe after vacuum compaction**: ``vacuum_versions`` folds the
  deltas into one ``history_base`` dir — same archived ROWS, one scan
  relation instead of D. The probe should drop back near the shallow
  cost (rows dominate, per-dir listing overhead gone).

Usage: python tools/measure_scd2_depth.py [depth] [n_keys]
(defaults: depth 50, n_keys 50_000; each batch updates 2% of keys)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 50
N_KEYS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
CHURN = max(1, N_KEYS // 50)  # 2% of keys change per batch
T0 = datetime(2024, 1, 1)


def batch(spark, version: int):
    """Source snapshot for merge #version: keys 0..N-1, a rotating 2%
    slice carries a value stamped with the version (guaranteed change)."""
    lo = (version * CHURN) % N_KEYS
    hi = lo + CHURN
    k = F.col("id")
    in_slice = (k >= lo) & (k < hi)
    return spark.range(N_KEYS).select(
        k.alias("k"),
        F.when(in_slice, F.lit(f"v{version}"))
        .otherwise(F.lit("base"))
        .alias("val"),
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def build_table(spark, root: str, depth: int):
    from _data_engineering_pipeline_project_spark.operators.scd2 import Scd2Table

    t = Scd2Table(spark, os.path.join(root, f"scd2_d{depth}"), ["k"])
    for v in range(depth):
        t.merge(batch(spark, v), T0 + timedelta(days=v))
    return t


def main():
    from _data_engineering_pipeline_project_spark.operators.scd2 import (
        vacuum_versions,
    )
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("scd2-depth", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="scd2depth_")
    res: dict[str, float] = {}

    # warm-up: absorb the one-time codegen/Janino compile tax on a
    # throwaway table so the depth-1 tick isn't charged for it
    warm = build_table(spark, os.path.join(root, "warm"), 1)
    warm.merge(batch(spark, 1), T0 + timedelta(days=1))
    warm.as_of_timestamp(T0 + timedelta(hours=1)).count()

    for depth in (1, DEPTH):
        t = build_table(spark, root, depth)
        # merge tick at this depth: one more fixed-churn batch
        dt, _ = timed(
            lambda: t.merge(
                batch(spark, depth), T0 + timedelta(days=depth)
            )
        )
        res[f"merge tick at depth {depth}"] = dt
        probe_ts = T0 + timedelta(days=max(0, depth // 2), hours=1)
        dt, n = timed(lambda: t.as_of_timestamp(probe_ts).count())
        res[f"as_of probe at depth {depth} ({n} rows)"] = dt
        if depth == DEPTH:
            dt, removed = timed(lambda: vacuum_versions(t, keep_last=2))
            res[f"vacuum (compact {depth + 1} deltas)"] = dt
            dt, n = timed(lambda: t.as_of_timestamp(probe_ts).count())
            res[f"as_of probe after vacuum ({n} rows)"] = dt
            dt, _ = timed(
                lambda: t.merge(
                    batch(spark, depth + 1),
                    T0 + timedelta(days=depth + 1),
                )
            )
            res[f"merge tick after vacuum"] = dt

    width = max(len(k) for k in res)
    for k, v in res.items():
        print(f"{k:<{width}}  {v:7.2f} s")


if __name__ == "__main__":
    main()
