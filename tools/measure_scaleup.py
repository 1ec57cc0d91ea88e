"""Key-offset scale-up measurement (docs/SCALE.md protocol).

Replicates chosen fact tables N× with key offsets (PK/FK semantics
preserved) into a temp dir, then times selected queries at 1× vs N×
and prints the wall-clock ratio — the per-query scale-shape check the
SCALE.md measurements use. Usage:

    python tools/measure_scaleup.py [--factor N] [--dims] <query> [<query> ...]

Default factor is 10 (the round-1..5 protocol); --factor 100 replays
sf0.1's facts at ~sf10 (lineitem 60M rows) for the deeper slope check.
``--dims`` grows part/supplier instead of the facts (the
entity-resolution scale axis — see DIM_FACTS).
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

# --dims mode: grow the DIMENSION axis instead (part/supplier replicated
# with key offsets; facts copied unreplicated). This is the scale axis
# the entity-resolution family lives on (Fellegi-Sunter, blocking
# audit, fuzzy name pairs run ON the part table); fact-FK-consuming
# queries are NOT meaningful here (replicated dim rows are referenced
# by no fact). Text fields get a per-replica tag for the same
# anti-degeneracy reason documents do: untagged replicas would be
# exact cross-replica matches and every block would fuse 100 replicas
# into one quadratic candidate set — the data's degeneracy, not the
# engine's slope.
DIM_FACTS = {
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}


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
    if t == "part":
        # tag every blocking-relevant text field (name tokens, brand,
        # type) so blocks never span replicas; replica 0 byte-identical
        tag = F.concat(F.lit("r"), F.col("_rep").cast("string"))
        for c in ("p_name", "p_brand", "p_type"):
            df = df.withColumn(
                c,
                F.when(F.col("_rep") == 0, F.col(c)).otherwise(
                    F.regexp_replace(
                        F.col(c), F.lit(r"(\S+)"), F.concat(F.lit("$1"), tag)
                    )
                ),
            )
        return df
    if t == "supplier":
        tag = F.concat(F.lit("r"), F.col("_rep").cast("string"))
        return df.withColumn(
            "s_name",
            F.when(F.col("_rep") == 0, F.col("s_name")).otherwise(
                F.concat(F.col("s_name"), tag)
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


def build_replicated(
    spark, out_dir: str, factor: int = 10, dims_mode: bool = False
) -> None:
    facts = DIM_FACTS if dims_mode else FACTS
    copied = (
        [*FACTS, "region", "nation"]
        if dims_mode
        else DIMS
    )
    for t, keys in facts.items():
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
    for t in copied:
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
    dims_mode = False
    if argv and argv[0] == "--factor":
        factor = int(argv[1])
        argv = argv[2:]
    if argv and argv[0] == "--dims":
        dims_mode = True
        argv = argv[1:]
    names = argv
    spark = get_spark("scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    rep_dir = tempfile.mkdtemp(prefix=f"repl{factor}_")
    try:
        t0 = time.time()
        build_replicated(spark, rep_dir, factor, dims_mode)
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
