"""100× scale-cadence measurement for the streaming maintainers
(docs/SCALE.md round-8 protocol).

The batch-query 100× sweep (tools/measure_scaleup.py) covers the
registered queries; this tool covers the three maintenance loops whose
crash-safe protocols are correctness-tested but whose per-tick cost
shape had no measured evidence (VERDICT r7 task #6):

- **CompactionMaintainer.run_once** — claim: per tick O(current
  generation + landing rows). Measured two ways: landing volume 1× vs
  100× (fold cost slope), and a FIXED small landing folded into a 100×
  current generation (the full-rewrite cost a real deployment bounds by
  partitioning generations — recorded honestly, not hidden).
- **IvfIndexMaintainer.ingest / compact_hot_lists / search** — claim:
  ingest is O(batch) INDEPENDENT of index size (same fixed batch into a
  1× vs 100× index), hot-list compaction is O(hot lists' rows), search
  cost follows probed-list volume.
- **DedupMaintainer.accept_batch** — claim: O(batch + seen-state scan).
  The seen state is a parquet fingerprint set that the batch anti-joins;
  a fixed batch against 1× vs 100× seen state measures that scan slope
  (at deployment scale the seen store would be bucketed by fingerprint
  to keep the anti-join shuffle-free — the measured slope is the
  un-bucketed worst case).

Usage:  python tools/measure_maintainers_scale.py [factor]
(default factor 100; pass 10 for a quick smoke)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def rows_df(spark, n, seed_offset=0):
    """Synthetic fact rows with two clusterable int columns."""
    return spark.range(n).select(
        (F.col("id") + seed_offset).alias("k"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1 << 20))).alias("a"),
        (F.pmod(F.col("id") * 40503 + 7, F.lit(1 << 20))).alias("b"),
    )


def docs_df(spark, n, seed_offset=0):
    """Synthetic documents; content deterministic in (id + offset) so
    disjoint offsets produce disjoint fingerprints."""
    i = F.col("id") + seed_offset
    return spark.range(n).select(
        i.alias("doc_id"),
        F.concat(
            F.lit("w"), (i % 977).cast("string"),
            F.lit(" x"), (i % 9973).cast("string"),
            F.lit(" y"), i.cast("string"),
        ).alias("text"),
    )


def vecs_df(spark, n, dim, seed_offset=0):
    i = F.col("id") + seed_offset
    return spark.range(n).select(
        i.alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(i * 31 + j * 17 + 3, F.lit(1000)) / 500.0 - 1.0
            ),
        ).cast("array<float>").alias("embedding"),
    )


def bench_compaction(spark, root):
    from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
        CompactionMaintainer,
    )

    res = {}
    for label, n_files, rows_per_file in (
        ("1x", 16, 2_000),
        (f"{FACTOR}x", 16, 2_000 * FACTOR),
    ):
        d = os.path.join(root, f"compact_{label}")
        landing, table = os.path.join(d, "landing"), os.path.join(d, "tbl")
        os.makedirs(landing)
        for f in range(n_files):
            rows_df(spark, rows_per_file, f * rows_per_file).coalesce(
                1
            ).write.mode("append").parquet(landing)
        m = CompactionMaintainer(landing, table, ["a", "b"], min_files=8)
        dt, out = timed(lambda: m.run_once(spark))
        res[f"tick landing {label} ({n_files}f x {rows_per_file}r)"] = (
            dt,
            out["rows"],
        )
    # fixed small landing folded into the big current generation: the
    # full-rewrite slope (cost follows the generation, by design)
    d = os.path.join(root, f"compact_{FACTOR}x")
    landing = os.path.join(d, "landing")
    for f in range(8):
        rows_df(spark, 2_000, 10**9 + f * 2_000).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    m = CompactionMaintainer(
        landing, os.path.join(d, "tbl"), ["a", "b"], min_files=8
    )
    dt, out = timed(lambda: m.run_once(spark))
    res[f"tick small landing into {FACTOR}x gen"] = (dt, out["rows"])
    return res


def bench_ivf(spark, root):
    from _data_engineering_pipeline_project_spark.streaming.annmaint import (
        IvfIndexMaintainer,
    )

    dim, batch_n = 16, 20_000
    res = {}
    for label, index_n in (("1x", 20_000), (f"{FACTOR}x", 20_000 * FACTOR)):
        d = os.path.join(root, f"ivf_{label}")
        m = IvfIndexMaintainer(d, dim=dim, num_centroids=8)
        seed = vecs_df(spark, index_n, dim)
        m.fit(seed.limit(4_000))
        m.ingest(seed)  # index body at this scale
        dt, _ = timed(
            lambda: m.ingest(vecs_df(spark, batch_n, dim, 10**9))
        )
        res[f"ingest fixed {batch_n} batch, index {label} ({index_n})"] = (
            dt,
            index_n + batch_n,
        )
        dt, out = timed(lambda: m.compact_hot_lists(spark, min_files=2))
        res[f"compact_hot_lists, index {label}"] = (
            dt,
            sum(o.get("rows", 0) for o in out.values()),
        )
        q = vecs_df(spark, 16, dim, 5 * 10**8)
        dt, _ = timed(
            lambda: m.search(q, k=5, nprobe=2).count()
        )
        res[f"search 16 queries, index {label}"] = (dt, index_n + batch_n)
    return res


def bench_dedup(spark, root):
    from _data_engineering_pipeline_project_spark.streaming.dedupmaint import (
        DedupMaintainer,
    )

    batch_n = 5_000
    res = {}
    for label, seen_n in (("1x", 5_000), (f"{FACTOR}x", 5_000 * FACTOR)):
        d = os.path.join(root, f"dedup_{label}")
        m = DedupMaintainer(spark, d)
        m.accept_batch(docs_df(spark, seen_n), batch_id=0)  # seen state
        dt, _ = timed(
            lambda: m.accept_batch(
                docs_df(spark, batch_n, 10**9), batch_id=1
            )
        )
        res[f"accept fixed {batch_n} batch, seen {label} ({seen_n})"] = (
            dt,
            seen_n + batch_n,
        )
    return res


def main():
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("maintainer-scale")
    root = tempfile.mkdtemp(prefix="maintscale_")
    try:
        print(f"# maintainer scale cadence, factor {FACTOR}", flush=True)
        for name, fn in (
            ("compaction", bench_compaction),
            ("ivf", bench_ivf),
            ("dedup", bench_dedup),
        ):
            for k, (dt, rows) in fn(spark, root).items():
                print(f"{name}: {k}: {dt:.2f}s (state/rows {rows})",
                      flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
