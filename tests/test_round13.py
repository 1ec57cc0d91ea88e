"""Round 13: the VERDICT r12 brief — hybrid retrieval served from
maintained indexes, the frozen hot-shingle cap, the blue/green index
swap, and the composed all-maintainer drain."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

_TERMS = ("table", "value", "fast")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _doc_rows(ids):
    """Deterministic synthetic docs with varying tf of the query bag
    and varying lengths (so bm25's idf / length-norm both matter)."""
    out = []
    for i in ids:
        words = []
        words += ["table"] * (i % 4)
        words += ["value"] * (i % 3)
        words += ["fast"] * (i % 5)
        words += [f"filler{i}w{j}" for j in range(i % 7 + 1)]
        out.append((i, " ".join(words)))
    return out


def _emb_batch(spark, ids, d=16):
    rows = [
        (i, [math.sin(0.37 * i * (j + 1)) for j in range(d)]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ---------------------------------------------------------------------------
# VERDICT r12 #1: hybrid retrieval served from maintained indexes
# ---------------------------------------------------------------------------
def test_bm25_maintained_per_term_matches_direct(spark, tmp_path):
    """Per-term contributions served from a maintained BM25 index equal
    the direct path (``bm25_per_term_contrib``) BIT-FOR-BIT over every
    tick split — tf/df/dl are exact longs either way and avgdl is the
    same long-sum / long-count division, so the doubles coincide."""
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_per_term_contrib,
        bm25_per_term_contrib_from_index,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    rows = _doc_rows(range(1, 46))
    union = _docs(spark, rows)
    mnt = Bm25Maintainer(spark, str(tmp_path / "bm25"))
    for i in range(3):
        mnt.merge_batch(
            _docs(spark, [r for r in rows if r[0] % 3 == i]), batch_id=i
        )

    got = {
        tuple(r)
        for r in bm25_per_term_contrib_from_index(
            mnt.serve_index(), list(_TERMS)
        ).collect()
    }
    want = {
        tuple(r)
        for r in bm25_per_term_contrib(union, list(_TERMS)).collect()
    }
    assert got == want and len(want) > 20


def test_hybrid_maintained_fusion_ticks_equal_one_shot(spark, tmp_path):
    """The maintained hybrid (lexical from Bm25Maintainer + semantic
    from IvfOpqIndexMaintainer, RRF-fused) equals the one-shot fusion
    over the same frozen vector index BIT-FOR-BIT, for any lexical
    tick split — the serving face of VERDICT r12 #1. The one-shot
    reference recomputes the lexical side with the DIRECT per-term
    path (the ``hybrid_search_rrf`` arithmetic) and fuses the same
    maintained semantic top-k; the ivfopq maintained==one-shot leg is
    pinned separately (test_round12)."""
    from pyspark.sql import Window

    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_per_term_contrib,
    )
    from _data_engineering_pipeline_project_spark.queries_ext13 import (
        _hybrid_from_indexes,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    ids = list(range(1, 61))
    rows = _doc_rows(ids)
    union_docs = _docs(spark, rows)
    d, m, sub, ksub, C, nprobe = 16, 4, 2, 8, 4, 2

    # ONE frozen vector index (bootstrap + 2 ticks — maintained)
    vmnt = IvfOpqIndexMaintainer(
        spark, str(tmp_path / "ivfopq"), num_centroids=C
    )
    vmnt.bootstrap(
        _emb_batch(spark, range(1, 41), d=d), dim=d, m=m, sub_dim=sub,
        ksub=ksub,
    )
    vmnt.merge_batch(_emb_batch(spark, range(41, 51), d=d), batch_id=0)
    vmnt.merge_batch(_emb_batch(spark, range(51, 61), d=d), batch_id=1)
    sem = vmnt.topk(
        _emb_batch(spark, [1], d=d), k=20, nprobe=nprobe
    ).persist()

    def maintained_hybrid(n_ticks, name):
        mnt = Bm25Maintainer(spark, str(tmp_path / name))
        for i in range(n_ticks):
            mnt.merge_batch(
                _docs(spark, [r for r in rows if r[0] % n_ticks == i]),
                batch_id=i,
            )
        return sorted(
            tuple(r)
            for r in _hybrid_from_indexes(
                mnt.serve_index(), sem, _TERMS
            ).collect()
        )

    got_1 = maintained_hybrid(1, "bm25_one")
    got_3 = maintained_hybrid(3, "bm25_three")
    assert got_1 == got_3  # lexical tick split invisible, bit-for-bit

    # one-shot reference: DIRECT lexical path + same semantic relation
    per_term = bm25_per_term_contrib(union_docs, list(_TERMS))
    agg = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("contrib"))), F.lit(0.0)
        ).alias(f"__c{i}")
        for i, t in enumerate(_TERMS)
    ]
    bm = per_term.groupBy("doc_id").agg(*agg)
    total = F.col("__c0")
    for i in range(1, len(_TERMS)):
        total = total + F.col(f"__c{i}")
    bm = bm.select("doc_id", F.round(total, 4).alias("bm25"))
    w_lex = Window.orderBy(F.desc("bm25"), "doc_id")
    lex = (
        bm.orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
        .withColumn("r_lex", F.row_number().over(w_lex).cast("int"))
        .select("doc_id", "r_lex")
    )
    sem_r = sem.select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rnk").cast("int").alias("r_sem"),
    )
    fused = lex.join(sem_r, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_sem",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("r_sem")), F.lit(0.0)
            ),
            8,
        ).alias("rrf"),
    )
    w_f = Window.orderBy(F.desc("rrf"), "doc_id")
    want = sorted(
        tuple(r)
        for r in fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
        .withColumn("rnk", F.row_number().over(w_f).cast("int"))
        .collect()
    )
    assert got_3 == want and len(want) == 10
    # both sides contributed: some row fused lexical AND semantic ranks
    assert any(r[1] is not None and r[2] is not None for r in want)
    sem.unpersist()


# ---------------------------------------------------------------------------
# VERDICT r12 #2: frozen hot-shingle cap for the maintained near-dup index
# ---------------------------------------------------------------------------
def test_neardup_maintainer_frozen_hot_shingle_cap(spark, tmp_path):
    """Capped maintained == capped one-shot with the same frozen list,
    BIT-FOR-BIT — the 100 TB boilerplate guard (VERDICT r12 #2). A
    planted boilerplate sentence shared by EVERY document creates hot
    shingles; the frozen drop-list removes them from signatures,
    candidates, and verification alike, so unrelated docs stop
    colliding while true near-dups stay connected through their rarer
    shingles. Freeze-before-first-tick and geometry guards fail
    loudly."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    boiler = (
        "this website uses cookies to improve your experience please "
        "accept our terms of service and privacy policy before reading"
    )

    def doc(i, body):
        return (i, f"{boiler} {body}")

    rows = [
        doc(1, "alpha beta gamma delta epsilon zeta eta theta"),
        doc(2, "alpha beta gamma delta epsilon zeta eta iota"),  # ~dup of 1
        doc(3, "completely different words one two three four five six"),
        doc(4, "unrelated content seven eight nine ten eleven twelve"),
        doc(5, "another standalone text about parquet row group stats"),
        doc(6, "alpha beta gamma delta epsilon zeta eta kappa"),  # ~dup of 1
    ]
    union = _docs(spark, rows)
    cap = 3

    base = str(tmp_path / "ndm_capped")
    mnt = NearDupIndexMaintainer(spark, base, max_shingle_df=cap)
    # guard: capped ticks require the frozen list first
    with pytest.raises(ValueError, match="bootstrap_hot_shingles"):
        mnt.merge_batch(union, batch_id=0)
    n_hot = mnt.bootstrap_hot_shingles(union)
    assert n_hot > 0  # the boilerplate actually froze a drop-list
    with pytest.raises(ValueError, match="already frozen"):
        mnt.bootstrap_hot_shingles(union)

    b1 = _docs(spark, rows[:2])
    b2 = _docs(spark, rows[2:4])
    b3 = _docs(spark, rows[4:])
    for i, b in enumerate((b1, b2, b3)):
        mnt.merge_batch(b, batch_id=i)

    want = {
        tuple(r)
        for r in minhash_near_dup_pairs(
            union, threshold=0.3, max_shingle_df=cap
        ).collect()
    }
    got = {tuple(r) for r in mnt.pairs().collect()}
    assert got == want
    # true near-dups survive the cap (group {1,2,6} pairs present)
    assert any(a == 1 and b == 2 for a, b, _ in got)
    # the cap changed the result vs uncapped (boilerplate had been
    # pairing unrelated docs / inflating jaccards)
    uncapped = {
        tuple(r)
        for r in minhash_near_dup_pairs(union, threshold=0.3).collect()
    }
    assert got != uncapped

    # reopen with the SAME cap: same served pairs; different cap: loud
    m2 = NearDupIndexMaintainer(spark, base, max_shingle_df=cap)
    assert {tuple(r) for r in m2.pairs().collect()} == want
    with pytest.raises(ValueError, match="geometry mismatch"):
        NearDupIndexMaintainer(spark, base)
    with pytest.raises(ValueError, match="geometry mismatch"):
        NearDupIndexMaintainer(spark, base, max_shingle_df=cap + 1)

    # freeze-after-ticks guard (fresh uncapped-looking state with ticks)
    base2 = str(tmp_path / "ndm_late")
    m3 = NearDupIndexMaintainer(spark, base2, max_shingle_df=cap)
    m4 = NearDupIndexMaintainer(spark, str(tmp_path / "ndm_plain"))
    m4.merge_batch(b1, batch_id=0)
    m3.bootstrap_hot_shingles(union)
    m3.merge_batch(b1, batch_id=0)
    with pytest.raises(ValueError, match="already has ingested"):
        m3.bootstrap_hot_shingles(union)
    # uncapped maintainer rejects a freeze attempt
    with pytest.raises(ValueError, match="opened uncapped"):
        m4.bootstrap_hot_shingles(union)


# ---------------------------------------------------------------------------
# VERDICT r12 #3: blue/green index swap executes the re-bootstrap decision
# ---------------------------------------------------------------------------
def test_bluegreen_swap_crash_floor_and_gc(spark, tmp_path):
    """Pointer mechanics: a crash mid-build leaves the old generation
    serving and a debris dir a later swap never adopts; a rebuilt index
    below the recall floor ABORTS the flip loudly; an empty audit panel
    is a monitoring failure, not evidence; decision False is a recorded
    no-op; gc removes debris but never the serving generation; hostile
    pointers fail loudly."""
    import json
    import os

    from _data_engineering_pipeline_project_spark.streaming.bluegreen import (
        BlueGreenIndex,
    )

    base = str(tmp_path / "bg")
    bg = BlueGreenIndex(base)
    with pytest.raises(ValueError, match="no serving generation"):
        bg.serving_dir()

    def build(tag):
        def fn(gen_dir):
            os.makedirs(gen_dir, exist_ok=True)
            with open(os.path.join(gen_dir, "payload"), "w") as fh:
                fh.write(tag)
        return fn

    r0 = bg.swap(True, build("g0"))
    assert r0["swapped"] and bg.serving_dir().endswith("gen_0")

    # crash mid-build: pointer unmoved, gen_1 is debris
    def crashing(gen_dir):
        os.makedirs(gen_dir, exist_ok=True)
        with open(os.path.join(gen_dir, "payload"), "w") as fh:
            fh.write("partial")
        raise RuntimeError("executor lost")

    with pytest.raises(RuntimeError, match="executor lost"):
        bg.swap(True, crashing)
    assert bg.serving_dir().endswith("gen_0")
    assert os.path.isdir(os.path.join(base, "gen_1"))  # debris

    # next attempt allocates gen_2 — the debris dir is never adopted
    r2 = bg.swap(True, build("g2"))
    assert r2["serving_gen"] == 2 and bg.serving_dir().endswith("gen_2")
    with open(os.path.join(bg.serving_dir(), "payload")) as fh:
        assert fh.read() == "g2"

    # decision False: recorded no-op
    rno = bg.swap(False, build("never"))
    assert rno["swapped"] is False and bg.serving_dir().endswith("gen_2")

    # recall floor: rebuilt gen_3 audits below the floor -> abort, loud
    low_panel = spark.createDataFrame(
        [(i, 0.4) for i in range(5)], "query_id int, recall double"
    )
    with pytest.raises(ValueError, match="below the floor"):
        bg.swap(
            True, build("g3"), audit_fn=lambda d: low_panel, min_recall=0.9
        )
    assert bg.serving_dir().endswith("gen_2")

    # empty panel: monitoring failure, refuse to flip
    empty = low_panel.filter(F.col("recall") > 1.0)
    with pytest.raises(ValueError, match="no rows"):
        bg.swap(True, build("g4"), audit_fn=lambda d: empty, min_recall=0.1)
    assert bg.serving_dir().endswith("gen_2")

    # min_recall without an audit_fn is a caller bug
    with pytest.raises(ValueError, match="no audit_fn"):
        bg.swap(True, build("g5"), min_recall=0.5)

    # gc with the grace window: fresh debris is indistinguishable from
    # an in-flight build, so nothing is removed yet
    assert bg.gc(keep_previous=1) == []
    # gc past the grace window (grace 0 = operator asserts no swap is
    # running): debris (1, 3, 4) removed; serving gen_2 + previous
    # gen_0 kept
    removed = bg.gc(keep_previous=1, grace_seconds=0)
    assert "gen_1" in removed and "gen_3" in removed and "gen_4" in removed
    assert os.path.isdir(os.path.join(base, "gen_2"))
    assert os.path.isdir(os.path.join(base, "gen_0"))

    # reopen recovers; hostile pointers fail loudly
    bg2 = BlueGreenIndex(base)
    assert bg2.serving_dir().endswith("gen_2")
    with open(os.path.join(base, "_SERVING"), "w") as fh:
        fh.write("{truncated")
    with pytest.raises(ValueError, match="corrupt"):
        BlueGreenIndex(base)
    orphan_base = str(tmp_path / "orphan")
    os.makedirs(os.path.join(orphan_base, "gen_0"))
    with pytest.raises(ValueError, match="no _SERVING pointer"):
        BlueGreenIndex(orphan_base)


def test_bluegreen_planted_drift_end_to_end(spark, tmp_path):
    """The full loop the policy operator promised (VERDICT r12 #3):
    planted drift -> rebootstrap_decision True -> blue/green swap
    re-bootstraps the IVF-OPQ index over the accumulated corpus,
    verifies recall on the panel, and atomically repoints serving —
    recall restored (new >= old on the same panel), old generation
    intact until gc."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        topk_cosine_bruteforce,
    )
    from _data_engineering_pipeline_project_spark.streaming.bluegreen import (
        BlueGreenIndex,
    )
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.policy import (
        rebootstrap_decision,
    )
    import os

    d, m, sub, ksub, C, nprobe, k = 16, 4, 2, 8, 4, 2, 5

    def emb(ids, shift=0.0):
        rows = [
            (
                i,
                [
                    math.sin(0.37 * i * (j + 1)) + (shift if j == 2 else 0.0)
                    for j in range(d)
                ],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    corpus_a = emb(range(1, 81))
    drifted = emb(range(81, 201), shift=2.5)
    union = corpus_a.unionByName(drifted)
    panel_ids = [81, 95, 110, 140, 180]  # queries from the drifted mass
    panel = emb(panel_ids, shift=2.5)

    def build_over(corpus):
        def fn(gen_dir):
            mnt = IvfOpqIndexMaintainer(
                spark, os.path.join(gen_dir, "index"), num_centroids=C
            )
            mnt.bootstrap(corpus, dim=d, m=m, sub_dim=sub, ksub=ksub)
        return fn

    def audit(gen_dir):
        mnt = IvfOpqIndexMaintainer(
            spark, os.path.join(gen_dir, "index"), num_centroids=C
        )
        approx = mnt.topk(panel, k=k, nprobe=nprobe).select(
            "query_id", "neighbor_id"
        )
        exact = topk_cosine_bruteforce(union, panel, k=k, dim=d).select(
            "query_id", "neighbor_id"
        )
        hits = (
            approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        qs = exact.select("query_id").distinct()
        return qs.join(hits, "query_id", "left").select(
            "query_id",
            (F.coalesce("hits", F.lit(0)) / F.lit(float(k))).alias("recall"),
        )

    bg = BlueGreenIndex(str(tmp_path / "bg_ivfopq"))
    # gen_0: bootstrapped over the pre-drift corpus, then ticked with
    # the drifted batch (frozen rotation/centroids from A quantize the
    # new mass with the old geometry — the staleness drift measures)
    bg.swap(True, build_over(corpus_a))
    old_mnt = IvfOpqIndexMaintainer(
        spark,
        os.path.join(bg.serving_dir(), "index"),
        num_centroids=C,
    )
    old_mnt.merge_batch(drifted, batch_id=0)
    old_recalls = [
        r["recall"] for r in audit(bg.serving_dir()).collect()
    ]
    old_mean = sum(old_recalls) / len(old_recalls)

    # the monitoring loop: planted drift trips the decision
    dm = DriftMaintainer(spark, str(tmp_path / "drift"))
    dm.merge_batch(corpus_a, batch_id=0)
    dm.mark_baseline()
    dm.merge_batch(drifted, batch_id=1)
    decision = rebootstrap_decision(
        spark,
        dm.drift_report(top=8),
        artifacts={"ivfopq": bg.serving_dir()},
    )
    assert decision.collect()[0]["decision"] is True

    # execute: rebuild over the accumulated corpus, verify, flip
    report = bg.swap(
        decision, build_over(union), audit_fn=audit, min_recall=0.3
    )
    assert report["swapped"] and bg.serving_dir().endswith("gen_1")
    assert report["mean_recall"] >= 0.3
    assert report["mean_recall"] >= old_mean  # recall restored
    # blue survives until gc
    assert os.path.isdir(os.path.join(str(tmp_path / "bg_ivfopq"), "gen_0"))


# ---------------------------------------------------------------------------
# rag_retrieval_maintained == rag_retrieval_pipeline (served from state)
# ---------------------------------------------------------------------------
def test_rag_maintained_equals_recompute_pipeline(spark):
    """The maintained-lexical RAG serving path returns the IDENTICAL
    relation to the per-call recompute (chunk BM25 stats are the
    maintainer's monoids; the semantic side is the same exact-integer
    plan) — which is exactly why the registered oracle is the one-shot
    twin verbatim."""
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        rag_retrieval_pipeline,
    )
    from _data_engineering_pipeline_project_spark.queries_ext13 import (
        rag_retrieval_maintained,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in rag_retrieval_maintained(spark, sf).collect())
    want = sorted(tuple(r) for r in rag_retrieval_pipeline(spark, sf).collect())
    assert got == want and len(want) == 10


# ---------------------------------------------------------------------------
# VERDICT r12 #8 (stretch): ANALYZE on maintained state informs planning
# ---------------------------------------------------------------------------
def test_analyze_maintained_state_flips_serving_join_to_broadcast(
    spark, tmp_path
):
    """Compacted maintainer parquet registered in the catalog +
    ANALYZE TABLE = real statistics driving the serving plan: the
    compacted cluster-members relation joins a large fact with NO
    broadcast hint and the optimizer picks BroadcastHashJoin from the
    recorded row count — the maintained-state extension of
    test_table_statistics_inform_planning. At 100 TB this is how a
    periodically-compacted index table keeps getting the right join
    strategy as it grows (stats refresh on the compaction cadence,
    hints in none of the query code)."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        broadcast_join_count,
    )
    from _data_engineering_pipeline_project_spark.streaming.clustermaint import (
        ClusterMaintainer,
    )

    base = str(tmp_path / "cc")
    mnt = ClusterMaintainer(spark, base)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 2)], "doc_a long, doc_b long"
    )
    mnt.merge_batch(pairs, batch_id=0)
    mnt.compact()  # one base generation, aliases folded in
    members_dir = os.path.join(base, "members_base_v1")
    assert os.path.isdir(members_dir)

    spark.sql("DROP TABLE IF EXISTS cc_members_stats")
    spark.sql(
        "CREATE TABLE cc_members_stats (id BIGINT, root0 BIGINT) "
        f"USING parquet LOCATION '{members_dir}'"
    )
    try:
        spark.sql(
            "ANALYZE TABLE cc_members_stats COMPUTE STATISTICS "
            "FOR ALL COLUMNS"
        )
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED cc_members_stats"
            ).collect()
        }
        assert "Statistics" in desc and "rows" in desc["Statistics"]

        fact = spark.range(200000).selectExpr("id % 90 as id", "id as v")
        j = (
            fact.join(spark.table("cc_members_stats"), "id")
            .groupBy("root0")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert broadcast_join_count(j) >= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS cc_members_stats")


# ---------------------------------------------------------------------------
# r13 wave 2: maintained covariance statistics -> no-scan re-training
# ---------------------------------------------------------------------------
def test_covariance_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """model()/covariance_pairs() from maintained DECIMAL sums equal
    ``pca_fit(union, method='gram')`` BIT-FOR-BIT over any tick split
    (exact integer monoids, identical final IEEE sequences);
    redelivery is a no-op, geometry and hostile pointers fail loudly,
    a fresh handle recovers."""
    import json

    from _data_engineering_pipeline_project_spark.operators.pca import (
        covariance_pairs,
        pca_fit,
    )
    from _data_engineering_pipeline_project_spark.streaming.covmaint import (
        CovarianceMaintainer,
    )

    d = 12
    b1 = _emb_batch(spark, range(1, 41), d=d)
    b2 = _emb_batch(spark, range(41, 71), d=d)
    b3 = _emb_batch(spark, range(71, 101), d=d)
    union = b1.unionByName(b2).unionByName(b3)

    base = str(tmp_path / "cov")
    mnt = CovarianceMaintainer(spark, base, dim=d)
    with pytest.raises(ValueError, match="no batches merged"):
        mnt.sums()
    for i, b in enumerate((b1, b2, b3)):
        mnt.merge_batch(b, batch_id=i)
    mnt.merge_batch(b2, batch_id=1)  # redelivery: no-op (sums not idempotent)

    want = pca_fit(union, dim=d, method="gram")
    got = mnt.model()
    assert got == want  # exact float equality, every field

    want_cov = sorted(
        tuple(r)
        for r in covariance_pairs(union, method="gram", dim=d).collect()
    )
    got_cov = sorted(tuple(r) for r in mnt.covariance_pairs().collect())
    assert got_cov == want_cov

    # reopen: same model; geometry guard; hostile pointer
    m2 = CovarianceMaintainer(spark, base, dim=d)
    assert m2.model() == want
    with pytest.raises(ValueError, match="geometry mismatch"):
        CovarianceMaintainer(spark, base, dim=d + 1)
    with pytest.raises(ValueError, match="geometry mismatch"):
        CovarianceMaintainer(spark, base, dim=d, vec_col="other")
    ptr = os.path.join(base, "_CURRENT")
    good = open(ptr).read()
    with open(ptr, "w") as fh:
        fh.write("{broken")
    with pytest.raises(ValueError, match="corrupt"):
        CovarianceMaintainer(spark, base, dim=d)
    os.remove(ptr)
    with pytest.raises(ValueError, match="cannot be safely adopted"):
        CovarianceMaintainer(spark, base, dim=d)
    with open(ptr, "w") as fh:
        fh.write(good)
    assert CovarianceMaintainer(spark, base, dim=d).version == 3
    # foreign format refused
    meta = json.loads(good)
    meta["format"] = "something-else"
    with open(ptr, "w") as fh:
        fh.write(json.dumps(meta))
    with pytest.raises(ValueError, match="format"):
        CovarianceMaintainer(spark, base, dim=d)


def test_rebootstrap_from_maintained_stats_no_corpus_scan(spark, tmp_path):
    """The no-scan re-training arc (the missing half of the blue/green
    loop): an OPQ model allocated from the MAINTAINED covariance sums
    equals the corpus-scan model exactly, so a re-bootstrap swap can
    train from standing state and touch the corpus only to re-encode —
    the served IVF-OPQ top-k under either model is bit-identical."""
    from _data_engineering_pipeline_project_spark.operators.pca import (
        opq_allocate,
        pca_fit,
    )
    from _data_engineering_pipeline_project_spark.streaming.bluegreen import (
        BlueGreenIndex,
    )
    from _data_engineering_pipeline_project_spark.streaming.covmaint import (
        CovarianceMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    d, m, sub, ksub, C, nprobe = 16, 4, 2, 8, 4, 2
    b1 = _emb_batch(spark, range(1, 61), d=d)
    b2 = _emb_batch(spark, range(61, 121), d=d)
    union = b1.unionByName(b2)

    cov = CovarianceMaintainer(spark, str(tmp_path / "cov"), dim=d)
    cov.merge_batch(b1, batch_id=0)
    cov.merge_batch(b2, batch_id=1)

    model_scan = opq_allocate(pca_fit(union, dim=d, method="gram"), m, sub)
    model_maint = opq_allocate(cov.model(), m, sub)
    assert model_maint == model_scan  # training WITHOUT the corpus scan

    def build_with(model):
        def fn(gen_dir):
            mnt = IvfOpqIndexMaintainer(
                spark, os.path.join(gen_dir, "index"), num_centroids=C
            )
            mnt.bootstrap(
                union, dim=d, m=m, sub_dim=sub, ksub=ksub, model=model
            )
        return fn

    bg = BlueGreenIndex(str(tmp_path / "bg"))
    bg.swap(True, build_with(model_maint))
    served = IvfOpqIndexMaintainer(
        spark, os.path.join(bg.serving_dir(), "index"), num_centroids=C
    )
    ref_dir = str(tmp_path / "ref")
    ref = IvfOpqIndexMaintainer(
        spark, os.path.join(ref_dir, "index"), num_centroids=C
    )
    ref.bootstrap(union, dim=d, m=m, sub_dim=sub, ksub=ksub, model=model_scan)

    q = _emb_batch(spark, [1, 5, 9], d=d)
    got = sorted(
        tuple(r) for r in served.topk(q, k=4, nprobe=nprobe).collect()
    )
    want = sorted(
        tuple(r) for r in ref.topk(q, k=4, nprobe=nprobe).collect()
    )
    assert got == want and len(got) == 12


# ---------------------------------------------------------------------------
# review r13 regression: first-tick crash replays instead of bricking
# ---------------------------------------------------------------------------
def test_first_tick_crash_replays_cleanly(spark, tmp_path):
    """The lineage discipline lands stage dirs from the START of a
    tick; the eager v0 pointer makes a crash inside a FRESH
    maintainer's first tick an ordinary replay (orphan dirs not in the
    manifest are overwritten), not a bricked base_dir — while truly
    foreign state (committed dirs, no pointer at all) still fails
    loudly."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from _data_engineering_pipeline_project_spark.operators.pca import (
        pca_fit,
    )
    from _data_engineering_pipeline_project_spark.streaming.covmaint import (
        CovarianceMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog alpha"),
            (2, "the quick brown fox jumps over the lazy dog beta"),
            (3, "completely different words one two three four five"),
        ],
    )

    # --- near-dup: simulate a crash mid-first-tick ---------------------
    base = str(tmp_path / "ndm_crash")
    mnt = NearDupIndexMaintainer(spark, base)
    assert os.path.exists(os.path.join(base, "_CURRENT"))  # eager v0
    # stage dirs landed, pointer never advanced (the crash window)
    docs.write.mode("overwrite").parquet(os.path.join(base, "docs_b0"))
    docs.selectExpr("doc_id", "1 as band", "2 as sig").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "bands_b0"))
    # restart: recover + replay the batch — no orphan refusal
    m2 = NearDupIndexMaintainer(spark, base)
    m2.merge_batch(docs, batch_id=0)
    want = {
        tuple(r)
        for r in minhash_near_dup_pairs(docs, threshold=0.3).collect()
    }
    assert {tuple(r) for r in m2.pairs().collect()} == want

    # foreign state (no pointer ever) still refuses adoption
    foreign = str(tmp_path / "ndm_foreign")
    os.makedirs(foreign)
    docs.write.mode("overwrite").parquet(os.path.join(foreign, "docs_b0"))
    with pytest.raises(ValueError, match="cannot be safely adopted"):
        NearDupIndexMaintainer(spark, foreign)

    # --- covariance: crash after sums_v1 write, before commit ----------
    d = 8
    emb = _emb_batch(spark, range(1, 31), d=d)
    cbase = str(tmp_path / "cov_crash")
    cm = CovarianceMaintainer(spark, cbase, dim=d)
    assert os.path.exists(os.path.join(cbase, "_CURRENT"))  # eager v0
    emb.limit(5).selectExpr(
        "'n' as kind", "0 as idx", "CAST(1 AS DECIMAL(38,0)) as val"
    ).write.mode("overwrite").parquet(os.path.join(cbase, "sums_v1"))
    c2 = CovarianceMaintainer(spark, cbase, dim=d)  # recovers at v0
    c2.merge_batch(emb, batch_id=0)  # replay overwrites the orphan
    assert c2.model() == pca_fit(emb, dim=d, method="gram")


# ---------------------------------------------------------------------------
# DSIR importance resampling (r13 wave 3)
# ---------------------------------------------------------------------------
def test_dsir_scores_separate_target_like_documents(spark):
    """Documents drawn from the target vocabulary score strictly higher
    than off-target documents (the selection property DSIR exists
    for), a doc of mixed vocabulary lands between, and the fixed-point
    score is an exact long (partitioning-independent: repartitioned
    input yields identical rows)."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        dsir_importance_scores,
    )

    tgt_words = "alpha beta gamma delta epsilon zeta".split()
    off_words = "uno dos tres cuatro cinco seis".split()
    rows = []
    for i in range(10):  # target-domain docs (flagged)
        rows.append((i, " ".join(tgt_words * 3), True))
    for i in range(10, 16):  # candidates: target-like vocabulary
        rows.append((i, " ".join(tgt_words * 2), False))
    for i in range(16, 22):  # candidates: off-target vocabulary
        rows.append((i, " ".join(off_words * 2), False))
    rows.append((30, " ".join(tgt_words + off_words), False))  # mixed
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_tgt boolean"
    )

    out = {
        r["doc_id"]: (r["score_fp"], r["n_tokens"])
        for r in dsir_importance_scores(
            docs, F.col("is_tgt"), buckets=64
        ).collect()
    }
    like = min(out[i][0] for i in range(10, 16))
    off = max(out[i][0] for i in range(16, 22))
    assert like > out[30][0] > off  # target-like > mixed > off-target
    assert out[10][1] == 12 and out[30][1] == 12  # token counts exact

    # partitioning independence: exact long sums, identical rows
    out2 = {
        r["doc_id"]: (r["score_fp"], r["n_tokens"])
        for r in dsir_importance_scores(
            docs.repartition(7), F.col("is_tgt"), buckets=64
        ).collect()
    }
    assert out == out2
