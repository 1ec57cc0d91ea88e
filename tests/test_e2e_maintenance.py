"""End-to-end MAINTENANCE composition: a stream of small micro-batch
files flows through the compaction maintainer (clustered generations,
atomic pointer) while an incremental rollup (aggmaint monoid merges)
tracks the same data batch-by-batch — and at every checkpoint the
incremental state must equal a from-scratch recompute over
``read_current``. This pins the contract the individual maintainer
tests can't: the pieces COMPOSE (compaction never loses or duplicates
rows under the rollup, the rollup never depends on file layout)."""

from __future__ import annotations

import os

from _data_engineering_pipeline_project_spark.streaming.aggmaint import (
    merge_rollup,
    partial_agg,
)
from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
    CompactionMaintainer,
)


def _append_batch(spark, landing, rows):
    import shutil
    import uuid

    df = spark.createDataFrame(rows, "user_id long, v long")
    tmp = os.path.join(landing, f"_tmp_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(landing, exist_ok=True)
    os.replace(
        os.path.join(tmp, part),
        os.path.join(landing, f"{uuid.uuid4().hex}.parquet"),
    )
    shutil.rmtree(tmp)


def _rollup_rows(df):
    return {
        r["user_id"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in df.collect()
    }


def test_compaction_and_rollup_compose(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table_dir = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing, table_dir, ["user_id"], min_files=4,
        target_rows_per_file=50,
    )

    rollup = None
    total_rows = 0
    for b in range(12):
        # batch b: users b%5, (b+1)%5, (b+2)%5 with distinct values
        rows = [(int((b + j) % 5), int(b * 10 + j)) for j in range(3)]
        total_rows += len(rows)
        _append_batch(spark, landing, rows)
        # incremental rollup sees EVERY batch exactly once, regardless
        # of when compaction folds the files
        batch_df = spark.createDataFrame(rows, "user_id long, v long")
        rollup = merge_rollup(
            partial_agg(batch_df, ["user_id"], "v"), rollup, ["user_id"]
        )
        if b % 4 == 3:
            out = m.run_once(spark)
            assert out["compacted"], out
            # checkpoint: incremental state == from-scratch recompute
            # over what the table serves (generation ∪ landing)
            served = m.read_current(spark)
            assert served.count() == total_rows
            truth = partial_agg(served, ["user_id"], "v")
            assert _rollup_rows(rollup) == _rollup_rows(truth)
        # rollup stays queryable mid-stream too
        assert rollup.count() <= 5

    # final state: three compactions consumed all 12 files
    assert m.current_version() == 3
    assert len(os.listdir(landing)) == 0
    served = m.read_current(spark)
    assert served.count() == total_rows
    assert _rollup_rows(rollup) == _rollup_rows(
        partial_agg(served, ["user_id"], "v")
    )


# ---------------------------------------------------------------------------
# VERDICT r12 #4: one ingest loop, all maintainers (FanoutDrain)
# ---------------------------------------------------------------------------
def test_fanout_drain_ticks_all_maintainers_and_replays_safely(
    spark, tmp_path
):
    """ONE availableNow stream drains into seven maintainers behind one
    foreachBatch (single source scan per micro-batch, batch persisted
    once) — and a crash BETWEEN two maintainers' commits replays
    safely: the failed micro-batch does not advance the checkpoint, the
    restart redelivers the same batch_id, already-committed maintainers
    no-op on their watermarks, and the post-crash maintainers fold it
    for the first time. Final state of EVERY maintainer equals its
    clean twin (no loss, no double count)."""
    import math
    import os

    import pytest
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.cmmaint import (
        CountMinMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.compose import (
        FanoutDrain,
    )
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.samplemaint import (
        SampleMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.semdedupmaint import (
        SemDeDupMaintainer,
    )

    d = 8
    schema = (
        "doc_id long, text string, embedding array<double>, lang string"
    )

    def vec(i):
        return [math.sin(0.37 * i * (j + 1)) for j in range(d)]

    def doc_rows(ids):
        rows = []
        for i in ids:
            if i % 6 == 1:  # near-dup family spanning files
                text = (
                    "the quick brown fox jumps over the lazy dog near "
                    f"the warm fire variant {i}"
                )
            else:
                text = f"standalone document {i} " + " ".join(
                    f"tok{i}x{j}" for j in range(8)
                )
            rows.append((i, text, vec(i), "en" if i % 2 else "de"))
        return rows

    file1, file2 = doc_rows(range(1, 7)), doc_rows(range(7, 13))
    union = spark.createDataFrame(file1 + file2, schema)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land(rows, name):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(tmp, part), os.path.join(landing, f"{name}.parquet")
        )

    emb_union = union.select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    seed = spark.createDataFrame(
        [(1000 + i, vec(1000 + i)) for i in range(24)],
        "vec_id long, embedding array<double>",
    )

    def build(tag):
        ndm = NearDupIndexMaintainer(spark, str(tmp_path / f"{tag}_ndm"))
        sdd = SemDeDupMaintainer(
            spark, str(tmp_path / f"{tag}_sdd"), num_centroids=4,
            threshold=0.4, dim=d,
        )
        sdd.bootstrap(emb_union)  # frozen centroids — one global step
        cm = CountMinMaintainer(
            spark, str(tmp_path / f"{tag}_cm"), width=64, depth=3
        )
        drift = DriftMaintainer(spark, str(tmp_path / f"{tag}_drift"))
        panel = SampleMaintainer(
            spark, str(tmp_path / f"{tag}_panel"), key_col="doc_id", k=3,
            group_col="lang",
        )
        ivf = IvfOpqIndexMaintainer(
            spark, str(tmp_path / f"{tag}_ivf"), num_centroids=2
        )
        ivf.bootstrap(seed, dim=d, m=2, sub_dim=2, ksub=4)
        bm = Bm25Maintainer(spark, str(tmp_path / f"{tag}_bm25"))
        return ndm, sdd, cm, drift, panel, ivf, bm

    ndm, sdd, cm, drift, panel, ivf, bm = build("live")
    routes = [
        ("neardup", ndm, lambda b: b.select("doc_id", "text")),
        (
            "semdedup",
            sdd,
            lambda b: b.select(F.col("doc_id").alias("vec_id"), "embedding"),
        ),
        ("cm_lang", cm, lambda b: b.select("lang")),
        ("drift", drift, lambda b: b.select("embedding")),
        ("panel", panel, lambda b: b.select("lang", "doc_id")),
        (
            "ivfopq",
            ivf,
            lambda b: b.select(F.col("doc_id").alias("vec_id"), "embedding"),
        ),
        ("bm25", bm, lambda b: b.select("doc_id", "text")),
    ]
    drain = FanoutDrain(routes)
    with pytest.raises(ValueError, match="duplicate route names"):
        FanoutDrain([routes[0], routes[0]])
    ckpt = str(tmp_path / "ckpt")

    # batch 0: first file through every maintainer
    land(file1, "f1")
    drain.run_available_now(spark, landing, schema, ckpt)

    # batch 1: CRASH between commits — routes before 'panel' commit,
    # panel raises, the micro-batch fails, checkpoint does not advance
    land(file2, "f2")
    orig_merge = panel.merge_batch
    panel.merge_batch = lambda df, bid: (_ for _ in ()).throw(
        RuntimeError("injected crash between maintainer commits")
    )
    with pytest.raises(Exception, match="injected crash"):
        drain.run_available_now(spark, landing, schema, ckpt)
    panel.merge_batch = orig_merge
    # restart: the SAME batch id replays; neardup/semdedup/cm/drift
    # no-op on their watermarks, panel/ivfopq/bm25 fold it now
    drain.run_available_now(spark, landing, schema, ckpt)

    # --- every maintainer equals its clean twin -------------------------
    want_pairs = {
        tuple(r)
        for r in minhash_near_dup_pairs(
            union.select("doc_id", "text"), threshold=0.3
        ).collect()
    }
    assert {tuple(r) for r in ndm.pairs().collect()} == want_pairs
    assert len(want_pairs) >= 1  # the cross-file near-dup family paired

    c_ndm, c_sdd, c_cm, c_drift, c_panel, c_ivf, c_bm = build("clean")
    c_sdd.merge_batch(emb_union, batch_id=0)
    assert sorted(
        tuple(r) for r in sdd.pairs().collect()
    ) == sorted(tuple(r) for r in c_sdd.pairs().collect())

    c_cm.merge_batch(union.select("lang"), batch_id=0)
    assert sorted(
        tuple(r) for r in cm.current().collect()
    ) == sorted(tuple(r) for r in c_cm.current().collect())

    c_drift.merge_batch(union.select("embedding"), batch_id=0)
    assert sorted(
        tuple(r) for r in drift.moments().collect()
    ) == sorted(tuple(r) for r in c_drift.moments().collect())

    c_panel.merge_batch(union.select("lang", "doc_id"), batch_id=0)
    assert sorted(
        tuple(r) for r in panel.sample().collect()
    ) == sorted(tuple(r) for r in c_panel.sample().collect())

    c_ivf.merge_batch(emb_union, batch_id=0)
    q = seed.limit(3)
    assert sorted(
        tuple(r) for r in ivf.topk(q, k=3, nprobe=1).collect()
    ) == sorted(tuple(r) for r in c_ivf.topk(q, k=3, nprobe=1).collect())

    c_bm.merge_batch(union.select("doc_id", "text"), batch_id=0)
    ix, cix = bm.serve_index(), c_bm.serve_index()
    assert sorted(
        tuple(r) for r in ix["dictionary"].collect()
    ) == sorted(tuple(r) for r in cix["dictionary"].collect())
    assert ix["stats"].collect() == cix["stats"].collect()


# ---------------------------------------------------------------------------
# r13 capstone: the self-healing index loop, end to end
# ---------------------------------------------------------------------------
def test_self_healing_index_loop_end_to_end(spark, tmp_path):
    """The full production loop every r12-r13 piece exists for, in one
    test: ONE ingest drain (FanoutDrain) ticks the serving IVF-OPQ
    index, the drift monitor, and the covariance statistics; planted
    drift trips ``rebootstrap_decision``; ``BlueGreenIndex.swap``
    re-trains the rotation FROM THE MAINTAINED SUMS (no training scan
    — ``CovarianceMaintainer.model()`` is bit-equal to a corpus-scan
    ``pca_fit``), re-encodes, passes the recall-floor audit, and
    atomically repoints serving. Recall on the drifted panel is
    restored (new >= old), the blue generation survives until gc."""
    import math
    import os

    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators.pca import (
        opq_allocate,
        pca_fit,
    )
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        topk_cosine_bruteforce,
    )
    from _data_engineering_pipeline_project_spark.streaming.bluegreen import (
        BlueGreenIndex,
    )
    from _data_engineering_pipeline_project_spark.streaming.compose import (
        FanoutDrain,
    )
    from _data_engineering_pipeline_project_spark.streaming.covmaint import (
        CovarianceMaintainer,
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

    d, m, sub, ksub, C, nprobe, k = 16, 4, 2, 8, 4, 2, 5
    schema = "vec_id long, embedding array<double>"

    def emb_rows(ids, shift=0.0):
        return [
            (
                i,
                [
                    math.sin(0.37 * i * (j + 1)) + (shift if j == 2 else 0.0)
                    for j in range(d)
                ],
            )
            for i in ids
        ]

    calm = emb_rows(range(1, 81))
    drifted = emb_rows(range(81, 201), shift=2.5)
    union = spark.createDataFrame(calm + drifted, schema)
    panel = spark.createDataFrame(emb_rows([81, 95, 110, 140, 180], 2.5), schema)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land(rows, name):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(
            os.path.join(tmp, part), os.path.join(landing, f"{name}.parquet")
        )

    # gen_0: serving index bootstrapped over the calm seed
    bg = BlueGreenIndex(str(tmp_path / "bg"))

    def build_plain(corpus):
        def fn(gen_dir):
            mnt = IvfOpqIndexMaintainer(
                spark, os.path.join(gen_dir, "index"), num_centroids=C
            )
            mnt.bootstrap(corpus, dim=d, m=m, sub_dim=sub, ksub=ksub)
        return fn

    bg.swap(True, build_plain(spark.createDataFrame(calm, schema)))
    serving = IvfOpqIndexMaintainer(
        spark, os.path.join(bg.serving_dir(), "index"), num_centroids=C
    )
    drift = DriftMaintainer(spark, str(tmp_path / "drift"))
    drift.merge_batch(spark.createDataFrame(calm, schema), batch_id=-1)
    drift.mark_baseline()
    cov = CovarianceMaintainer(spark, str(tmp_path / "cov"), dim=d)
    cov.merge_batch(spark.createDataFrame(calm, schema), batch_id=-1)

    # ONE drain ticks the serving index, the drift monitor, and the
    # covariance statistics from the same micro-batch
    drain = FanoutDrain(
        [
            ("index", serving, None),
            ("drift", drift, lambda b: b.select("embedding")),
            ("cov", cov, None),
        ]
    )
    land(drifted, "drifted")
    drain.run_available_now(
        spark, landing, schema, str(tmp_path / "ckpt")
    )

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

    old_recalls = [r["recall"] for r in audit(bg.serving_dir()).collect()]
    old_mean = sum(old_recalls) / len(old_recalls)

    decision = rebootstrap_decision(
        spark, drift.drift_report(top=8),
        artifacts={"ivfopq": bg.serving_dir()},
    )
    assert decision.collect()[0]["decision"] is True

    # re-train WITHOUT a training scan: the rotation comes from the
    # maintained sums (bit-equal to a fresh pca_fit over the union)
    model_maint = opq_allocate(cov.model(), m, sub)
    assert model_maint == opq_allocate(
        pca_fit(union, dim=d, method="gram"), m, sub
    )

    def build_from_stats(gen_dir):
        mnt = IvfOpqIndexMaintainer(
            spark, os.path.join(gen_dir, "index"), num_centroids=C
        )
        mnt.bootstrap(
            union, dim=d, m=m, sub_dim=sub, ksub=ksub, model=model_maint
        )

    report = bg.swap(
        decision, build_from_stats, audit_fn=audit, min_recall=0.3
    )
    assert report["swapped"] and report["mean_recall"] >= max(0.3, old_mean)
    assert bg.serving_dir().endswith("gen_1")
    assert os.path.isdir(os.path.join(str(tmp_path / "bg"), "gen_0"))


def test_fanout_bluegreen_indirection_route(spark, tmp_path):
    """A FanoutDrain route given a ZERO-ARG RESOLVER follows the
    blue/green ``_SERVING`` pointer: before the swap the standing
    drain ticks gen_0; after a swap at drain quiescence (the cadence
    contract) the SAME drain ticks gen_1 — no restart, no rewiring.
    The old generation's state stops growing the moment serving
    flips."""
    import math
    import os

    from _data_engineering_pipeline_project_spark.streaming.bluegreen import (
        BlueGreenIndex,
    )
    from _data_engineering_pipeline_project_spark.streaming.compose import (
        FanoutDrain,
    )
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    d, C = 8, 2
    schema = "vec_id long, embedding array<double>"

    def emb(ids):
        return spark.createDataFrame(
            [
                (i, [math.sin(0.37 * i * (j + 1)) for j in range(d)])
                for i in ids
            ],
            schema,
        )

    seed = emb(range(1, 41))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land(df, name):
        tmp = str(tmp_path / f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(
            os.path.join(tmp, part), os.path.join(landing, f"{name}.parquet")
        )

    bg = BlueGreenIndex(str(tmp_path / "bg"))

    def build_over(corpus):
        def fn(gen_dir):
            mnt = IvfOpqIndexMaintainer(
                spark, os.path.join(gen_dir, "index"), num_centroids=C
            )
            mnt.bootstrap(corpus, dim=d, m=2, sub_dim=2, ksub=4)
        return fn

    bg.swap(True, build_over(seed))

    def serving_index():
        return IvfOpqIndexMaintainer(
            spark,
            os.path.join(bg.serving_dir(), "index"),
            num_centroids=C,
        )

    drain = FanoutDrain([("index", serving_index, None)])
    ckpt = str(tmp_path / "ckpt")

    land(emb(range(41, 51)), "b1")
    drain.run_available_now(spark, landing, schema, ckpt)
    gen0 = os.path.join(str(tmp_path / "bg"), "gen_0", "index")
    def n_vecs(index_dir):
        return (
            IvfOpqIndexMaintainer(spark, index_dir, num_centroids=C)
            .codes.codes()
            .select("vec_id")
            .distinct()
            .count()
        )

    assert n_vecs(gen0) == 50  # seed 40 + drained batch 10

    # swap AT QUIESCENCE (awaitTermination returned): gen_1 over all 50
    bg.swap(True, build_over(seed.unionByName(emb(range(41, 51)))))
    assert bg.serving_dir().endswith("gen_1")

    land(emb(range(51, 61)), "b2")
    drain.run_available_now(spark, landing, schema, ckpt)
    gen1 = os.path.join(bg.serving_dir(), "index")
    assert n_vecs(gen1) == 60  # 50 bootstrapped + the post-swap batch
    # the retired generation stopped growing at the flip
    assert n_vecs(gen0) == 50
