"""Unit tests for the round-5 extension wave: skew-salted join
(operators/skew.py), z-order layout (functions/zorder.py), and the
registered ext7 queries' plan-level scale contracts. Oracle-level value
checks run through the driver gate; these pin the operator semantics
and the physical shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.functions.zorder import (
    zorder2,
    zorder2_sql,
)
from _data_engineering_pipeline_project_spark.operators.skew import salted_join


def test_salted_join_left_semantics(spark):
    """Left join through the salt: the unmatched fact row (k=3) must
    appear EXACTLY ONCE with nulls — not once per dimension replica.
    (The inner-equivalence case lives in test_scale_ops.py; the ext7
    query's oracle re-proves it value-for-value on real tables.)"""
    fact = spark.createDataFrame([(1, 10), (3, 30)], "k int, v int")
    dim = spark.createDataFrame([(1, "a")], "k int, name string")
    got = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(fact, dim, on=["k"], buckets=4, how="left")
        .select("k", "v", "name")
        .collect()
    )
    assert got == [(1, 10, "a"), (3, 30, None)]


def test_salted_join_spreads_hot_key(spark):
    """The scale point: a single hot key's rows must land in MULTIPLE
    salt lanes (≥4 of 8 distinct salts across 64 distinct rows), or the
    transform isn't splitting the skew at all — same salt expression as
    operators/skew.py:salted_join."""
    fact = spark.createDataFrame([(1, i) for i in range(64)], "k int, v int")
    salt = F.pmod(
        F.hash(*[F.col(c) for c in fact.columns], F.monotonically_increasing_id()),
        F.lit(8),
    )
    n_lanes = fact.select(salt.alias("s")).distinct().count()
    assert n_lanes >= 4, n_lanes


def test_salted_join_spreads_byte_identical_duplicates(spark):
    """The degenerate hot key salting exists for (VERDICT r6 #6): every
    row of the hot key is a BYTE-IDENTICAL duplicate (sentinel/default
    rows), so a content-only salt puts all of them in ONE bucket. The
    ordinal-mixed salt must spread them across ≥ buckets/2 lanes while
    leaving join semantics untouched (row multiplicity preserved)."""
    buckets = 8
    fact = spark.createDataFrame([(1, 0)] * 64, "k int, v int")
    salt = F.pmod(
        F.hash(*[F.col(c) for c in fact.columns], F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    n_lanes = fact.select(salt.alias("s")).distinct().count()
    assert n_lanes >= buckets // 2, n_lanes
    # multiplicity: each of the 64 identical left rows matches once
    dim = spark.createDataFrame([(1, "a")], "k int, name string")
    out = salted_join(fact, dim, on=["k"], buckets=buckets).collect()
    assert len(out) == 64 and all(r["name"] == "a" for r in out)


def test_zorder2_interleave_exact(spark):
    """Bit-interleave ground truth: z(x, y) with x in even positions.
    Python-computed expected values for a handful of points."""

    def z_ref(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder2(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == z_ref(x, y), (x, y)
    # SQL twin produces the same values through DuckDB-free evaluation
    sql_expr = zorder2_sql("x", "y", 8)
    got_sql = {
        (r["x"], r["y"]): r["z"]
        for r in df.selectExpr("x", "y", f"{sql_expr} as z").collect()
    }
    assert got_sql == got


def test_zorder2_locality(spark):
    """The property layout clustering rests on: a z-range covers a
    BOUNDED rectangle in both lanes. Check the coarse-bucket spans on a
    full 16x16 grid: every (z >> 4) bucket must span ≤ 4 values in each
    lane (perfect 4x4 tiles)."""
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x int, y int")
    spans = (
        df.select("x", "y", zorder2(F.col("x"), F.col("y"), 4).alias("z"))
        .groupBy(F.shiftright(F.col("z"), 4).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(spans) == 16
    for r in spans:
        assert r["n"] == 16 and r["sx"] <= 3 and r["sy"] <= 3, tuple(r)


def test_epoch_shuffle_is_permutation_and_decorrelated(spark, tmp_path):
    """Each epoch's positions are a permutation of 1..n; two epochs must
    not be the identical permutation (seeded hashes differ)."""
    from _data_engineering_pipeline_project_spark.queries_ext7 import (
        deterministic_epoch_shuffle_documents,
    )

    out = deterministic_epoch_shuffle_documents(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(out)
    p0 = sorted(r["pos_epoch0"] for r in out)
    p1 = sorted(r["pos_epoch1"] for r in out)
    assert p0 == list(range(1, n + 1)) and p1 == list(range(1, n + 1))
    assert any(r["pos_epoch0"] != r["pos_epoch1"] for r in out)


def test_semantic_decontamination_flags_planted_leak(spark):
    """A corpus vector IDENTICAL to a benchmark vector must be flagged
    with cosine 1.0 against that benchmark id — the planted-leak case
    the operator exists for (the sf oracles only see near-random
    similarities)."""
    from _data_engineering_pipeline_project_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    emb = table(spark, sf, "embeddings")
    # vec 29 is in the benchmark split (29 % 29 == 0); plant its vector
    # under a corpus id (id 30 -> corpus split)
    bench_vec = emb.filter(F.col("vec_id") == 29).first()
    planted = spark.createDataFrame(
        [(10_001, bench_vec["embedding"], 0)],
        emb.schema,
    )
    # run the same pipeline inline on the augmented frame
    union = emb.unionByName(planted)
    e = union.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bench = e.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("bench_id"), F.col("e").alias("be")
    )
    corpus = e.filter(F.col("vec_id") % 29 != 0)
    from _data_engineering_pipeline_project_spark.functions.vectors import (
        dot_unrolled,
    )

    cos_fp = F.floor(
        dot_unrolled("e", "be", 64)
        / (
            F.sqrt(dot_unrolled("e", "e", 64))
            * F.sqrt(dot_unrolled("be", "be", 64))
        )
        * 1000000
    ).cast("bigint")
    best = (
        corpus.crossJoin(F.broadcast(bench))
        .select("vec_id", "bench_id", cos_fp.alias("c"))
        .groupBy("vec_id")
        .agg(F.max("c").alias("m"), F.max_by("bench_id", "c").alias("nb"))
        .filter(F.col("m") >= 999999)
        .collect()
    )
    hits = {r["vec_id"]: (r["nb"], r["m"]) for r in best}
    assert 10_001 in hits and hits[10_001][0] == 29
    assert hits[10_001][1] >= 999999  # cosine 1.0 up to fixed-point floor


def test_lsh_recall_audit_sample_fraction(spark):
    """The audit's 100 TB contract is now a PARAMETER (VERDICT r6 task
    #5): at sample_fraction=0.5 the audit runs over the deterministic
    hash-sampled half of the corpus — truth-pair count can only shrink
    (sampled docs ⊂ full docs ⇒ sampled pairs ⊂ full pairs), candidate
    count can only shrink, and the metrics stay well-formed. At 1.0 the
    plan is the registered oracle-checked form."""
    from _data_engineering_pipeline_project_spark.queries_ext8 import (
        lsh_recall_audit,
    )

    sf = "/root/testdata/sf0.001"
    full = lsh_recall_audit(spark, sf, sample_fraction=1.0).collect()[0]
    half = lsh_recall_audit(spark, sf, sample_fraction=0.5).collect()[0]
    assert half["n_truth"] <= full["n_truth"]
    assert half["n_candidates"] <= full["n_candidates"]
    assert half["n_hit"] <= half["n_truth"]
    if half["n_truth"]:
        assert 0.0 <= half["recall"] <= 1.0
    if half["n_candidates"]:
        assert 0.0 <= half["precision"] <= 1.0
    # subset property of the sampled TRUTH pairs: every sampled truth
    # pair must also be a full-corpus truth pair (pair similarity is a
    # pure pairwise function — sampling docs only subsets the universe)
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators import dedup as D
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        hash_sample,
    )

    docs = table(spark, sf, "documents")
    full_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    samp_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(
            hash_sample(docs, "doc_id", 0.5), threshold=0.3
        ).collect()
    }
    assert samp_pairs <= full_pairs


def test_semdecon_ivf_no_forced_broadcast(spark):
    """The IVF decontamination path (VERDICT r6 task #4) must not FORCE
    any broadcast that scales with corpus or bench: with the planner's
    size-based broadcasting disabled, the only BroadcastExchanges left
    are the two explicit 8-row centroid-table hints (corpus assignment
    + bench probing); the (assigned ⋈ probes) candidate join plans as a
    shuffle join. The brute path under the same config still broadcasts
    its bench side — the hint the gate exists to avoid at scale."""
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext8 import (
        semantic_decontamination_ivf,
    )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = semantic_decontamination_ivf(spark, "/root/testdata/sf0.001")
        plan = explain_str(df)
        # formatted explain lists every node twice (tree + detail);
        # count distinct node ids. Exactly the two centroid broadcasts:
        import re

        n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange", plan))
        assert n_bcast == 2, plan
        # the candidate equi-join shuffles (no forced broadcast side)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_semdecon_ivf_flags_subset_of_brute(spark):
    """IVF candidates are a subset of all (corpus, bench) pairs, so the
    probed path can only under-flag, never over-flag: every IVF-flagged
    vector is brute-flagged, and its probed max cosine never exceeds
    the exact max."""
    from _data_engineering_pipeline_project_spark.queries_ext8 import (
        semantic_decontamination_embeddings,
        semantic_decontamination_ivf,
    )

    sf = "/root/testdata/sf0.001"
    brute = {
        r["vec_id"]: r["max_cosine"]
        for r in semantic_decontamination_embeddings(spark, sf).collect()
    }
    ivf = {
        r["vec_id"]: r["max_cosine"]
        for r in semantic_decontamination_ivf(spark, sf).collect()
    }
    assert ivf, "IVF path flagged nothing at sf0.001 — test is vacuous"
    for vid, cos in ivf.items():
        assert vid in brute and cos <= brute[vid] + 1e-9


def test_length_bucketed_batches_invariants(spark):
    """Batch-shaping semantics beyond the oracle hash: every batch
    holds ≤ BATCH_SIZE docs, all docs in a batch share the power-of-two
    length bucket (so padding waste is bounded by 2× within any batch),
    and every document appears exactly once."""
    import _data_engineering_pipeline_project_spark.queries_ext8 as q8

    sf = "/root/testdata/sf0.001"
    out = q8.length_bucketed_batches_documents(spark, sf).collect()
    from collections import defaultdict

    batches = defaultdict(list)
    for r in out:
        batches[(r["len_bucket"], r["batch_in_bucket"])].append(r)
    assert len({r["doc_id"] for r in out}) == len(out)
    for (bucket, _), members in batches.items():
        assert len(members) <= q8._BATCH_SIZE
        for m in members:
            assert m["len_bucket"] == bucket
            assert (1 << bucket) <= max(m["n_tokens"], 1) < (1 << (bucket + 1))


def test_semdecon_auto_dispatches_on_derived_gate(spark):
    """ADVICE r7 #3 follow-through: the registered exact form is
    gate-free, and the size dispatch lives in
    semantic_decontamination_auto — which must route to the IVF path
    when the conf-derived bench gate is 0 (broadcast disabled) and to
    the exact broadcast path at the engine default."""
    from _data_engineering_pipeline_project_spark.queries_ext8 import (
        semantic_decontamination_auto,
        semantic_decontamination_embeddings,
        semantic_decontamination_ivf,
        _semdecon_bench_broadcast_max,
    )

    sf = "/root/testdata/sf0.001"
    key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(key)
    try:
        assert _semdecon_bench_broadcast_max(spark) > 0
        exact = {
            (r["vec_id"], r["max_cosine"])
            for r in semantic_decontamination_auto(spark, sf).collect()
        }
        want_exact = {
            (r["vec_id"], r["max_cosine"])
            for r in semantic_decontamination_embeddings(spark, sf).collect()
        }
        assert exact == want_exact  # small bench -> exact path
        spark.conf.set(key, "-1")  # broadcast disabled -> gate 0
        assert _semdecon_bench_broadcast_max(spark) == 0
        probed = {
            (r["vec_id"], r["max_cosine"])
            for r in semantic_decontamination_auto(spark, sf).collect()
        }
        want_probed = {
            (r["vec_id"], r["max_cosine"])
            for r in semantic_decontamination_ivf(spark, sf).collect()
        }
        assert probed == want_probed  # over-gate bench -> IVF path
    finally:
        spark.conf.set(key, saved)


def test_shingle_table_memo_shared_per_session(spark):
    """The corpus shingle table is tokenized ONCE per (session, sf):
    the memo hands back the same pinned frame to every consumer (the
    MinHash pipeline and the full-corpus LSH recall audit)."""
    from _data_engineering_pipeline_project_spark.queries_ext import (
        shingle_table_shared,
    )

    sf = "/root/testdata/sf0.001"
    a = shingle_table_shared(spark, sf)
    b = shingle_table_shared(spark, sf)
    assert a is b
    # pinned: survives a cache purge (the bench loop clears caches
    # between queries) without recomputing — still the same frame
    spark.catalog.clearCache()
    assert shingle_table_shared(spark, sf) is a
    assert a.count() > 0
