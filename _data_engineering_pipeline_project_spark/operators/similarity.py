"""Similarity search over embedding columns (array<float>).

Two paths:
- **brute-force top-k** — broadcast the query set, score every corpus
  vector with a codegen'd cosine (functions/vectors.py), reduce with a
  per-query row_number window. Exact; scales linearly (one scan, one
  shuffle of corpus×|Q| scored rows partitioned by query).
- **random-hyperplane LSH (IVF-style bucketing)** — deterministic
  hyperplanes derived from md5 bits; vectors bucketed by sign pattern;
  search only the query's bucket. Approximate; the 100 TB path — the
  candidate set per query is ~corpus/2^bits, independent of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.functions.vectors import (
    cosine_similarity,
)


def topk_cosine_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Ranking ties are broken by neighbor id; the similarity is rounded to 6
    digits BEFORE ranking so both engines rank identical values (double
    accumulation order can differ in the last ulp across engines).
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = (
        corpus.alias("c")
        .join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col(vec_col), F.col("__qvec")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rnk")
    )


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) with cosine ≥ threshold.
    Brute-force verification form — the LSH-bucketed variant below is the
    scale path (bucket first, compare within buckets only)."""
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(
                cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplanes(dim: int, num_planes: int):
    """Deterministic ±1 hyperplane matrix from md5 of (plane, dim) —
    reproducible on any engine/cluster with no RNG state."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return np.array(
        [
            [1.0 if h60(f"plane:{p}:dim:{j}") % 2 == 0 else -1.0 for j in range(dim)]
            for p in range(num_planes)
        ]
    )


def lsh_bucket(vec_col, dim: int, num_planes: int = 8):
    """Sign-pattern bucket id in [0, 2^num_planes).

    Vectorized pandas UDF: the matrix of hyperplane dots per Arrow batch is
    one BLAS matmul — the pure-expression form (num_planes × dim literal
    folds) bloats codegen into multi-MB task binaries and dominates compile
    time. The planes matrix is a tiny closure constant shipped per task.
    """
    from pyspark.sql.types import IntegerType

    planes = hyperplanes(dim, num_planes)  # (p, dim)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @F.pandas_udf(IntegerType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series(np.array([], dtype=np.int32))
        dots = mat @ planes.T  # (n, p)
        return pd.Series(((dots >= 0) @ weights).astype(np.int32))

    return _bucket(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket equi-join, exact cosine
    within the bucket. Recall measured against brute force in tests."""
    c = corpus.withColumn("__bucket", lsh_bucket(vec_col, dim, num_planes))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
    ).withColumn("__bucket", lsh_bucket("__qvec", dim, num_planes))
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col(vec_col), F.col("__qvec")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rnk")
    )
