"""Key-offset scale-up measurement (docs/SCALE.md protocol).

Replicates chosen fact tables N× with key offsets (PK/FK semantics
preserved) into a temp dir, then times selected queries at 1× vs N×
and prints the wall-clock ratio — the per-query scale-shape check the
SCALE.md measurements use. Usage:

    python tools/measure_scaleup.py [--factor N] <query> [<query> ...]

Default factor is 10 (the round-1..5 protocol); --factor 100 replays
sf0.1's facts at ~sf10 (lineitem 60M rows) for the deeper slope check.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTS = {
    # table -> key columns to offset per replica (PK and the FKs that
    # reference replicated PKs)
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "supplier", "part"]


def _mutate(t: str, df):
    """Per-replica content perturbation for corpus tables: replica 0 is
    byte-identical to the source (so 1× results still hold), later
    replicas get a deterministic content shift. Without this,
    N× replication would make every document/vector an EXACT N-way
    duplicate — near-dup pair output would grow as N², measuring the
    data's degeneracy, not the engine's scaling. For documents the
    shift must touch EVERY token, not just append a suffix: a 3-shingle
    Jaccard between a document and its suffix-perturbed replica is
    ~0.99, so suffixing still yields N² NEAR-dup pairs (measured: the
    100× minhash run built a ~25M-pair candidate set and died in an
    AQE broadcast). Tagging every token drops cross-replica Jaccard to
    ~0 while keeping within-replica dup structure identical to 1×."""
    if t == "documents":
        return df.withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(
                        F.lit("$1r"), F.col("_rep").cast("string")
                    ),
                )
            ),
        )
    if t == "embeddings":
        # deterministic per-(replica, element) SIGN FLIPS: norm is
        # preserved exactly and a balanced-random flip pattern drives
        # cross-replica cosine to ~0. The first attempt (shift element
        # 0 by 0.01·rep) left replicas at cosine ≈ 0.9999 — every
        # vector became a 100-way near-dup, pair output went quadratic
        # in the factor, and the LSH dup-pair run OOM'd measuring the
        # data's degeneracy rather than the engine's slope.
        elem_t = dict(df.dtypes)["embedding"]
        return df.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: x
                    * (
                        1
                        - 2 * (F.abs(F.hash(F.col("_rep"), i)) % 2)
                    ).cast("double"),
                ).cast(elem_t)
            ),
        )
    return df


def build_replicated(spark, out_dir: str, factor: int = 10) -> None:
    for t, keys in FACTS.items():
        src = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        offs = {k: src.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        # one crossJoin against a factor-row replica index instead of
        # factor chained unions — the plan stays O(1) in `factor`, so
        # --factor 100 doesn't pay a 100-branch analysis/codegen cost
        reps = F.broadcast(
            spark.range(factor).select(F.col("id").alias("_rep"))
        )
        out = src.crossJoin(reps)
        for k, off in offs.items():
            out = out.withColumn(k, F.col(k) + F.col("_rep") * F.lit(off))
        out = _mutate(t, out)
        out.drop("_rep").repartition(
            max(32, factor * src.rdd.getNumPartitions() // 4)
        ).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in DIMS:
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )


def main() -> None:
    import __spark_entry__ as entry
    from _data_engineering_pipeline_project_spark.session import get_spark

    argv = sys.argv[1:]
    factor = 10
    if argv and argv[0] == "--factor":
        factor = int(argv[1])
        argv = argv[2:]
    names = argv
    spark = get_spark("scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    rep_dir = tempfile.mkdtemp(prefix=f"repl{factor}_")
    try:
        t0 = time.time()
        build_replicated(spark, rep_dir, factor)
        print(
            f"replicated {factor}x in {time.time() - t0:.1f}s -> {rep_dir}"
        )
        for name in names:
            fn = qs[name]
            fn(spark, SF_DIR).count()  # warm
            t0 = time.time()
            fn(spark, SF_DIR).count()
            base = time.time() - t0
            fn(spark, rep_dir).count()  # warm
            t0 = time.time()
            fn(spark, rep_dir).count()
            big = time.time() - t0
            print(
                f"{name}: 1x={base:.2f}s {factor}x={big:.2f}s "
                f"ratio={big / max(base, 1e-9):.2f}x"
            )
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
