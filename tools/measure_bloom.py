"""Measure the Bloom membership tier at scale-up key counts.

The claim (operators/membership.py): for ingest-time "have we seen
this key?", the Bloom words relation answers "definitely new" for the
vast majority of a probe batch from state ~orders of magnitude smaller
than the exact seen-key relation, with the exact verify join reserved
for the Bloom-positive sliver — and the composition returns EXACTLY
the plain semi-join's rows.

Reports, per corpus size: build wall, words size vs corpus size,
fill ratio, then for a 500k probe batch (1% true overlap):
  exact_s      — plain left_semi probe×corpus (the baseline join)
  annotate_s   — bloom probe only (the "definitely new" decision)
  prefilter_s  — bloom probe → filter → exact verify (same rows as
                 exact, asserted)

Usage: python tools/measure_bloom.py [n_keys ...]  (default 500k, 5M)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def synth_keys(spark, n: int, prefix: str):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.md5(F.concat(F.lit(prefix), F.col("id").cast("string"))).alias("k")
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [500_000, 5_000_000]
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators import (
        membership as M,
    )
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("measure_bloom")
    out = []
    for n in sizes:
        # ~16 bits/key (k=3): predicted fill 1-e^(-3/16) ~ 17%, fp ~0.6%
        m_bits = 16 * n
        corpus = synth_keys(spark, n, "corpus:")
        t0 = time.monotonic()
        words = M.bloom_build(corpus, F.col("k"), m_bits, 3)
        words = words.cache()
        n_words = words.count()
        build_s = round(time.monotonic() - t0, 2)
        fill = words.agg(
            F.sum(F.bit_count("word")).alias("bits")
        ).collect()[0]["bits"] / m_bits

        # probe batch: 500k rows, 1% drawn from the corpus key space
        n_probe = 500_000
        n_hit = n_probe // 100
        probe = synth_keys(spark, n_probe - n_hit, "new:").unionByName(
            synth_keys(spark, n_hit, "corpus:")
        )

        t0 = time.monotonic()
        exact_rows = probe.join(
            corpus.withColumnRenamed("k", "ck"),
            F.col("k") == F.col("ck"),
            "left_semi",
        ).count()
        exact_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        flagged = M.bloom_probe(words, probe, F.col("k"), m_bits, 3)
        n_candidates = flagged.filter(F.col("bloom_member")).count()
        annotate_s = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        cand = (
            M.bloom_probe(words, probe, F.col("k"), m_bits, 3)
            .filter(F.col("bloom_member"))
            .drop("bloom_member")
        )
        pre_rows = cand.join(
            corpus.withColumnRenamed("k", "ck"),
            F.col("k") == F.col("ck"),
            "left_semi",
        ).count()
        prefilter_s = round(time.monotonic() - t0, 2)
        words.unpersist()
        assert pre_rows == exact_rows == n_hit, (pre_rows, exact_rows)

        # state economics: the words artifact vs the exact key relation
        # on disk (what a 100 TB ingest ships to every probe job)
        import os
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="bloom_state_")
        try:
            M.save_bloom_index(corpus, F.col("k"), f"{tmp}/idx", m_bits, 3)
            corpus.write.mode("overwrite").parquet(f"{tmp}/keys")

            def du(path: str) -> int:
                return sum(
                    os.path.getsize(os.path.join(d, f))
                    for d, _, fs in os.walk(path)
                    for f in fs
                )

            words_bytes = du(f"{tmp}/idx/words")
            keys_bytes = du(f"{tmp}/keys")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        out.append(
            {
                "n_keys": n,
                "m_bits": m_bits,
                "n_words": n_words,
                "words_vs_keys": round(n_words / n, 4),
                "fill_ratio": round(fill, 4),
                "build_s": build_s,
                "probe_batch": n_probe,
                "n_candidates": n_candidates,
                "fp_rate": round(
                    (n_candidates - n_hit) / (n_probe - n_hit), 6
                ),
                "exact_s": exact_s,
                "annotate_s": annotate_s,
                "prefilter_s": prefilter_s,
                "words_bytes": words_bytes,
                "keys_bytes": keys_bytes,
                "state_ratio": round(keys_bytes / words_bytes, 2),
                "verify_input_reduction": round(n_probe / n_candidates, 1),
            }
        )
        print(json.dumps(out[-1]))
    print(json.dumps({"rows": out}))


if __name__ == "__main__":
    main()
