"""Round-12 scale measurements (docs/SCALE.md protocol):

1. **IvfOpqIndexMaintainer tick flatness** — the composed maintained
   IVF-OPQ index (VERDICT r11 #1): a FIXED 10k-row batch ticked into a
   20k-row index vs a 200k-row index. Claim: tick cost is O(batch)
   — rotate + encode + assign + append, never touching history — so
   the two times should match (FLAT at 10× state). Serve cost is NOT
   flat by design (candidates ≈ corpus·nprobe/C); both are recorded.

2. **Maintained heavy-hitter screen economics** (VERDICT r11 #5) —
   the per-TICK question a deployed monitor asks: "which of this
   batch's keys are now heavy over ALL history?" The maintained path
   answers from the sketch (merge O(batch), probe the batch's keys
   against broadcast depth·width cells — NO history scan); the
   sketch-free alternative re-aggregates the full accumulated history
   every tick. A fixed 20k-row batch is screened against 1× vs
   FACTOR× history: the sketch path should be FLAT, the rescan path
   grows with history. (The screen()-equality and superset guarantees
   are correctness-pinned in tests/test_round12.py; this measures the
   cost shape only. Honesty note: a width sized ≪ distinct keys makes
   every key a candidate — the cm_error_summary audit is the sizing
   gate; here width=65536 over ~200k keys keeps εN ≈ 85 ≪ the 500
   heavy threshold.)

Usage: python tools/measure_ivfopq_maint.py [factor]   (default 10)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def vecs_df(spark, n, dim=64, offset=0):
    """Deterministic synthetic embeddings (no all-zero rows)."""
    j = F.sequence(F.lit(1), F.lit(dim))
    return spark.range(n).select(
        (F.col("id") + offset + 1).alias("vec_id"),
        F.transform(
            j,
            lambda jj: F.sin(
                (F.col("id") + offset + 3).cast("double") * jj * 0.37
            ),
        ).alias("embedding"),
    )


def bench_ivfopq(spark, root):
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    d, m, sub, ksub, C = 64, 16, 2, 64, 8
    base_n, batch_n = 20_000, 10_000
    grow_chunk = 200_000  # state growth arrives as ingest ticks
    out = {}
    for tag, n in (("1x", base_n), (f"{FACTOR}x", base_n * FACTOR)):
        path = os.path.join(root, f"ivfopq_{tag}")
        mnt = IvfOpqIndexMaintainer(spark, path, num_centroids=C)
        # bootstrap trains on the same base seed at BOTH scales (frozen
        # quantizers are seed-derived by design); the big index GROWS
        # through ingest ticks — exactly how a deployed index reaches
        # 100x state, and it keeps the measured quantity "tick cost vs
        # INDEX SIZE" (a 2M-row re-train would measure bootstrap cost,
        # and OOM'd the default heap — r13)
        t_boot, _ = timed(
            lambda: mnt.bootstrap(
                vecs_df(spark, base_n), dim=d, m=m, sub_dim=sub, ksub=ksub
            )
        )
        bid = 0
        grown = base_n
        while grown < n:
            step = min(grow_chunk, n - grown)
            mnt.merge_batch(
                vecs_df(spark, step, offset=grown + 7), batch_id=bid
            )
            grown += step
            bid += 1
        batch = vecs_df(spark, batch_n, offset=n + 17)
        t_tick, _ = timed(lambda: mnt.merge_batch(batch, batch_id=bid))
        queries = vecs_df(spark, 10)
        t_serve, cnt = timed(lambda: mnt.topk(queries, k=5).count())
        out[tag] = {
            "index_rows": n,
            "bootstrap_s": t_boot,
            "tick_10k_s": t_tick,
            "serve_10q_s": t_serve,
            "serve_rows": cnt,
        }
        print(f"ivfopq {tag}: {out[tag]}", flush=True)
    return out


def keys_df(spark, n, n_keys, offset=0):
    """Skewed keys: 4 hot keys own 20% of rows, uniform tail."""
    return spark.range(n).select(
        F.when(
            (F.col("id") + offset) % 5 == 0,
            F.concat(F.lit("hot_"), (F.col("id") + offset) % 4),
        )
        .otherwise(
            F.concat(F.lit("tail_"), (F.col("id") + offset) % F.lit(n_keys))
        )
        .alias("k")
    )


def bench_screen(spark, root):
    from _data_engineering_pipeline_project_spark.streaming.cmmaint import (
        CountMinMaintainer,
    )

    batch_n, heavy_thr = 20_000, 500
    out = {}
    for tag, hist_n in (("1x", 200_000), (f"{FACTOR}x", 200_000 * FACTOR)):
        n_keys = hist_n // 10
        # history lands on disk: the rescan side must pay real scan
        # I/O, exactly what a deployed no-sketch loop pays per tick
        hist_path = os.path.join(root, f"hist_{tag}")
        keys_df(spark, hist_n, n_keys).write.mode("overwrite").parquet(
            hist_path
        )
        hist = spark.read.parquet(hist_path)
        base = os.path.join(root, f"cm_screen_{tag}")
        mnt = CountMinMaintainer(spark, base, width=1 << 16, depth=3)
        mnt.merge_batch(hist, batch_id=0)  # the accumulated past
        batch = keys_df(spark, batch_n, n_keys, offset=hist_n + 1)

        def sketch_tick():
            mnt.merge_batch(batch, batch_id=1)
            return (
                mnt.estimate(batch, "k")
                .filter(F.col("cm_estimate") >= heavy_thr)
                .count()
            )

        t_sketch, n_cand = timed(sketch_tick)
        t_exact, n_heavy = timed(
            lambda: hist.unionByName(batch)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= heavy_thr)
            .count()
        )
        out[tag] = {
            "history_rows": hist_n,
            "sketch_tick_plus_probe_s": t_sketch,
            "sketch_candidates": n_cand,
            "exact_history_rescan_s": t_exact,
            "exact_heavy": n_heavy,
        }
        print(f"screen {tag}: {out[tag]}", flush=True)
    return out


def main():
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("measure-ivfopq", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="measure_ivfopq_")
    try:
        r1 = bench_ivfopq(spark, root)
        r2 = bench_screen(spark, root)
        print({"ivfopq": r1, "screen": r2})
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
