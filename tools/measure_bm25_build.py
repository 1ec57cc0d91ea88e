"""Measure the BM25 index build: corpus-cache shape (r9) vs
spill-to-parquet shape (r10), at the SCALE.md 5M-doc protocol.

The r9 build `.cache()`d the corpus-sized postings relation so its
three consumers (boundary sampling, clustered write, dictionary) shared
one tokenize — correct, but a MEMORY_AND_DISK cache of the postings
doubles transient executor storage at 100 TB. The r10 build spills the
relation to a parquet temp once and lets the two downstream jobs
re-read columnar output instead. This tool times both on the same
synthetic corpus and verifies the artifacts serve identical scores.

Usage: python tools/measure_bm25_build.py [n_docs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def synth_docs(spark, n: int):
    """Deterministic synthetic corpus: ~15-24 tokens/doc from a 50k
    vocabulary with a skewed (hash-arithmetic) term distribution —
    pure expressions, no Python worker, so generation doesn't pollute
    the build timing."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(15) + (F.col("id") % 10)),
                lambda i: F.concat(
                    F.lit("w"),
                    (
                        F.pmod(F.hash(F.col("id") * i + i), F.lit(50000))
                        * F.pmod(F.hash(i), F.lit(7))
                        % 50000
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def build_cached(docs, path: str, num_files: int) -> None:
    """The r9 shape, preserved here for the comparison: cache the
    corpus-sized tf relation for the build's duration."""
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators import textstats as TS
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        _token_relation,
    )

    spark = docs.sparkSession
    toks = _token_relation(docs, "text", "doc_id")
    dl = docs.select(F.col("doc_id"), TS.token_count("text").alias("dl")).cache()
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dl, "doc_id")
        .cache()
    )
    try:
        (
            tf.repartitionByRange(num_files, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(f"{path}/postings")
        )
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).write.mode(
            "overwrite"
        ).parquet(f"{path}/dictionary")
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
        spark.createDataFrame(
            [("doc_id", "text", "dl-in-postings-v2")],
            "id_col string, text_col string, format string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    finally:
        tf.unpersist()
        dl.unpersist()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_scores_from_index,
        load_bm25_index,
        save_bm25_index,
    )
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("measure_bm25_build")
    docs = synth_docs(spark, n)
    tmp = tempfile.mkdtemp(prefix="bm25_build_")
    out = {"n_docs": n}
    try:
        t0 = time.monotonic()
        build_cached(docs, f"{tmp}/cached", 32)
        out["build_cached_s"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        save_bm25_index(docs, f"{tmp}/spilled", num_files=32)
        out["build_spilled_s"] = round(time.monotonic() - t0, 2)

        terms = ["w17", "w4242"]
        a = sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_scores_from_index(
                load_bm25_index(spark, f"{tmp}/cached"), terms
            ).collect()
        )
        t0 = time.monotonic()
        b = sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_scores_from_index(
                load_bm25_index(spark, f"{tmp}/spilled"), terms
            ).collect()
        )
        out["serve_spilled_s"] = round(time.monotonic() - t0, 2)
        out["scores_identical"] = a == b and len(a) > 0
        out["scored_docs"] = len(b)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
