"""Round 12: the VERDICT r11 brief — maintained IVF-OPQ composition,
pca-variance deferred oracle, filtered ANN at IVF scale, bench
de-noising, streaming heavy-hitter screen, cm_estimate broadcast pin,
hostile-pointer coverage for the r11 maintainers, and the
drift→re-bootstrap policy operator."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F


def _emb_batch(spark, ids, shift=0.0, d=8):
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
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _keyed_batch(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


# ---------------------------------------------------------------------------
# VERDICT r11 #6: cm_estimate probe join is pinned to broadcast
# ---------------------------------------------------------------------------
def test_cm_estimate_probe_plan_is_broadcast(spark):
    """The cells side of the estimate join is ≤ depth·width rows BY
    CONSTRUCTION — a static bound, not a statistic — so the probe plan
    must be a BroadcastHashJoin regardless of AQE's stats freshness
    (a point-lookup serving path must never degrade to a shuffle)."""
    from _data_engineering_pipeline_project_spark.operators import (
        frequency as FQ,
    )
    from _data_engineering_pipeline_project_spark.plans.audit import (
        broadcast_join_count,
        explain_str,
    )

    df = _keyed_batch(spark, [f"k{i % 7}" for i in range(200)])
    cells = FQ.cm_build(df, F.col("k"), width=64, depth=3)
    est = FQ.cm_estimate(cells, df, F.col("k"), width=64, depth=3)
    assert broadcast_join_count(est) >= 1
    assert "SortMergeJoin" not in explain_str(est)
    # the pin changes the plan, never the answer
    got = {(r["key"], r["cm_estimate"]) for r in est.collect()}
    exact = {
        (r["k"], r["c"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k for k, _ in got} == {k for k, _ in exact}
    over = dict(got)
    for k, c in exact:
        assert over[k] >= c


# ---------------------------------------------------------------------------
# VERDICT r11 #7: hostile-pointer sweep for the r11 maintainers
# ---------------------------------------------------------------------------
def test_cm_maintainer_hostile_pointer(spark, tmp_path):
    """CountMinMaintainer: corrupt _CURRENT JSON, a truncated pointer
    missing 'version', and committed cells dirs with a lost pointer
    must each raise loud, specific errors — counter merges are not
    idempotent, so silent adoption double-counts and silent restart
    overwrites live counts."""
    from _data_engineering_pipeline_project_spark.streaming.cmmaint import (
        CountMinMaintainer,
    )

    base = str(tmp_path / "cmm")
    mnt = CountMinMaintainer(spark, base, width=64, depth=3)
    mnt.merge_batch(_keyed_batch(spark, ["a", "b", "a"]), batch_id=0)
    assert mnt.version == 1
    ptr = os.path.join(base, "_CURRENT")

    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write(good[: len(good) // 2])  # truncated mid-JSON
    with pytest.raises(ValueError, match="corrupt _CURRENT pointer"):
        CountMinMaintainer(spark, base, width=64, depth=3)

    with open(ptr, "w") as f:
        json.dump({"width": 64, "depth": 3}, f)  # valid JSON, no version
    with pytest.raises(ValueError, match="no 'version' field"):
        CountMinMaintainer(spark, base, width=64, depth=3)

    os.remove(ptr)
    with pytest.raises(ValueError, match="no _CURRENT pointer"):
        CountMinMaintainer(spark, base, width=64, depth=3)

    # restoring the pointer restores service exactly
    with open(ptr, "w") as f:
        f.write(good)
    m2 = CountMinMaintainer(spark, base, width=64, depth=3)
    assert m2.version == 1
    est = {
        (r["key"], r["cm_estimate"])
        for r in m2.estimate(_keyed_batch(spark, ["a", "b"]), "k").collect()
    }
    assert est == {("a", 2), ("b", 1)}


def test_sample_maintainer_hostile_pointer(spark, tmp_path):
    """SampleMaintainer: same sweep — the geometry (key_col, k) lives
    only in the pointer, so a lost/corrupt pointer over committed
    sample dirs cannot be silently adopted."""
    from _data_engineering_pipeline_project_spark.streaming.samplemaint import (
        SampleMaintainer,
    )

    base = str(tmp_path / "smm")
    mnt = SampleMaintainer(spark, base, key_col="k", k=4)
    mnt.merge_batch(_keyed_batch(spark, [f"k{i}" for i in range(20)]), 0)
    assert mnt.version == 1
    ptr = os.path.join(base, "_CURRENT")

    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt _CURRENT pointer"):
        SampleMaintainer(spark, base, key_col="k", k=4)

    with open(ptr, "w") as f:
        json.dump({"key_col": "k", "k": 4}, f)
    with pytest.raises(ValueError, match="no 'version' field"):
        SampleMaintainer(spark, base, key_col="k", k=4)

    os.remove(ptr)
    with pytest.raises(ValueError, match="no _CURRENT pointer"):
        SampleMaintainer(spark, base, key_col="k", k=4)

    with open(ptr, "w") as f:
        f.write(good)
    m2 = SampleMaintainer(spark, base, key_col="k", k=4)
    assert m2.version == 1 and m2.sample().count() == 4


def test_drift_maintainer_hostile_pointer(spark, tmp_path):
    """DriftMaintainer: same sweep — the watermark AND the pinned
    baseline version live only in the pointer; power-sum merges are
    not idempotent."""
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )

    base = str(tmp_path / "dmm")
    mnt = DriftMaintainer(spark, base)
    mnt.merge_batch(_emb_batch(spark, range(0, 30)), batch_id=0)
    assert mnt.version == 1
    ptr = os.path.join(base, "_CURRENT")

    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write(good + "}}}")  # trailing garbage
    with pytest.raises(ValueError, match="corrupt _CURRENT pointer"):
        DriftMaintainer(spark, base)

    with open(ptr, "w") as f:
        json.dump({"vec_col": "embedding"}, f)
    with pytest.raises(ValueError, match="no 'version' field"):
        DriftMaintainer(spark, base)

    os.remove(ptr)
    with pytest.raises(ValueError, match="no _CURRENT pointer"):
        DriftMaintainer(spark, base)

    with open(ptr, "w") as f:
        f.write(good)
    m2 = DriftMaintainer(spark, base)
    assert m2.version == 1
    assert {r["n"] for r in m2.moments().collect()} == {30}


# ---------------------------------------------------------------------------
# VERDICT r11 #2: scree report's deferred oracle — raw-model parity
# ---------------------------------------------------------------------------
def test_pca_raw_model_duckdb_matches_spark(spark):
    """The scree twin reads the RAW (unallocated) model — pin that
    pca_model_duckdb's full 64-eigenvalue spectrum and mean equal the
    Spark ``pca_fit(method='gram')`` model bit-for-bit at the compare
    scale (the allocated-model parity test covers only the 32 retained
    permuted values)."""
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators.pca import (
        pca_fit,
    )
    from _data_engineering_pipeline_project_spark.queries_ext11 import (
        _ORACLE_SF_DIR,
        pca_model_duckdb,
    )

    duck = pca_model_duckdb(f"{_ORACLE_SF_DIR}/embeddings.parquet", 64)
    sparkm = pca_fit(
        table(spark, _ORACLE_SF_DIR, "embeddings"), dim=64, method="gram"
    )
    assert duck["mean"] == sparkm["mean"]
    assert duck["eigenvalues"] == sparkm["eigenvalues"]
    assert len(duck["eigenvalues"]) == 64
    assert duck["components"] == sparkm["components"]


# ---------------------------------------------------------------------------
# VERDICT r11 #3: filtered ANN inside the IVF index walk
# ---------------------------------------------------------------------------
def _labeled_corpus(spark, n=240, d=8, n_labels=8):
    rows = [
        (
            i,
            f"class_{i % n_labels}",
            # i+3 offset: no all-zero vector (cosine needs a norm)
            [math.sin(0.61 * (i + 3) * (j + 1)) for j in range(d)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_filtered_ivf_returns_full_k_where_postfilter_starves(spark):
    """The brief's acceptance shape: with a selective predicate (1/8 of
    the corpus per class), filtering INSIDE the index walk returns the
    full k same-class neighbors the probed lists can supply, while
    post-filtering an unfiltered top-k returns < k. Also pins: every
    returned neighbor matches the query's class, ranks are contiguous
    from 1, and the filtered result is exactly the top-k of the
    class-restricted candidate set (no non-class candidate ever
    displaced a class member)."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        topk_cosine_ivf,
        topk_cosine_ivf_filtered,
    )

    corpus = _labeled_corpus(spark)
    queries = corpus.filter(F.col("vec_id") < 6)
    k = 5

    filt = topk_cosine_ivf_filtered(
        corpus, queries, k=k, num_centroids=4, nprobe=2, filter_col="label"
    ).collect()
    labels = {r["vec_id"]: r["label"] for r in queries.collect()}
    by_q: dict = {}
    for r in filt:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(labels)
    for qid, rows in by_q.items():
        # full k, all in-class, contiguous ranks
        assert len(rows) == k
        assert all(r["label"] == labels[qid] for r in rows)
        assert sorted(r["rnk"] for r in rows) == list(range(1, k + 1))

    # the anti-pattern this operator exists to avoid: post-filtering
    # the unfiltered top-k starves on a selective predicate
    unfilt = topk_cosine_ivf(
        corpus, queries, k=k, num_centroids=4, nprobe=2
    ).collect()
    nbr_labels = {r["vec_id"]: r["label"] for r in corpus.collect()}
    post = {}
    for r in unfilt:
        if nbr_labels[r["neighbor_id"]] == labels[r["query_id"]]:
            post[r["query_id"]] = post.get(r["query_id"], 0) + 1
    starved = [q for q in labels if post.get(q, 0) < k]
    assert starved, "post-filtering unexpectedly kept full k everywhere"

    # and in-walk filtering never loses recall vs post-filtering: the
    # surviving post-filter pairs are a subset of the filtered result
    filt_pairs = {(r["query_id"], r["neighbor_id"]) for r in filt}
    for r in unfilt:
        if nbr_labels[r["neighbor_id"]] == labels[r["query_id"]]:
            assert (r["query_id"], r["neighbor_id"]) in filt_pairs


# ---------------------------------------------------------------------------
# VERDICT r11 #5: streaming heavy-hitter screen over the maintained sketch
# ---------------------------------------------------------------------------
def _batch_screen(spark, df, width, depth, multiplier=1.2):
    """The registered batch composition (cm_heavy_hitter_screen_events'
    shape) run one-shot over ``df`` — the twin the maintained screen
    must reproduce exactly."""
    from _data_engineering_pipeline_project_spark.operators import (
        frequency as FQ,
    )

    keyed = df.filter(F.col("k").isNotNull())
    cells = FQ.cm_build(keyed, F.col("k"), width, depth)
    est = FQ.cm_estimate(cells, keyed, F.col("k"), width, depth)
    stats = keyed.agg(
        F.count(F.lit(1)).alias("__n"), F.countDistinct("k").alias("__kk")
    )
    thr = F.lit(multiplier) * F.col("__n") / F.col("__kk")
    cand = est.crossJoin(F.broadcast(stats)).filter(
        F.col("cm_estimate") >= thr
    )
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact_count"))
    return cand.join(exact, cand["key"] == exact["k"]).select(
        "key",
        "exact_count",
        "cm_estimate",
        (F.col("exact_count") >= thr).alias("is_heavy"),
    )


def test_maintained_heavy_hitter_screen_equals_batch(spark, tmp_path):
    """N ticks into a CountMinMaintainer, then screen() over the union
    == the batch screen over the union, row for row (cells are an
    exact monoid, so estimates — and therefore candidates and
    verdicts — are identical). The superset guarantee holds at EVERY
    tick: no true heavy hitter of the data-so-far ever screens out.
    And the exact aggregate runs only over candidate rows (the plan
    carries the semi-join below the groupBy)."""
    from _data_engineering_pipeline_project_spark.streaming.cmmaint import (
        CountMinMaintainer,
    )

    w, d = 64, 3
    mult = 1.2
    # skewed stream: two heavies, a mid key, and a long tail
    def batch(i):
        keys = (
            ["hot_a"] * 20
            + ["hot_b"] * 12
            + [f"tail_{i}_{j}" for j in range(30)]
        )
        return _keyed_batch(spark, keys)

    base = str(tmp_path / "hh")
    mnt = CountMinMaintainer(spark, base, width=w, depth=d)
    union = None
    for i in range(3):
        b = batch(i)
        mnt.merge_batch(b, batch_id=i)
        union = b if union is None else union.unionByName(b)

        # superset guarantee this tick: true heavies of data-so-far
        # all appear among the screen's candidates
        got = mnt.screen(union, "k", multiplier=mult).collect()
        cand_keys = {r["key"] for r in got}
        n = union.count()
        kk = union.select("k").distinct().count()
        thr = mult * n / kk
        exact = {
            r["k"]: r["c"]
            for r in union.groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        true_heavy = {k for k, c in exact.items() if c >= thr}
        assert true_heavy <= cand_keys
        # every candidate's verdict is the exact comparison
        for r in got:
            assert r["is_heavy"] == (exact[r["key"]] >= thr)
            assert r["exact_count"] == exact[r["key"]]
            assert r["cm_estimate"] >= r["exact_count"]

    # N ticks + screen == one-shot batch screen over the union
    want = {
        tuple(r)
        for r in _batch_screen(spark, union, w, d, mult).collect()
    }
    got = {
        tuple(r) for r in mnt.screen(union, "k", multiplier=mult).collect()
    }
    assert got == want and got

    # economics pin: the exact groupBy sits ABOVE a semi-join against
    # the broadcast candidates (the sliver), not over the key universe
    plan = mnt.screen(union, "k")._jdf.queryExecution().toString()
    assert "LeftSemi" in plan


# ---------------------------------------------------------------------------
# VERDICT r11 #1: maintained IVF-OPQ (the composed FAISS add() index)
# ---------------------------------------------------------------------------
def test_ivfopq_maintainer_equals_frozen_one_shot(spark, tmp_path):
    """Bootstrap + N ticks: served IVF-OPQ top-k equals a one-shot
    frozen-model build over the accumulated corpus BIT-FOR-BIT (same
    frozen rotation/codebooks/centroids; assignment and encode are
    per-row deterministic). Redelivery is a no-op; a simulated crash
    between the codes commit and the outer pointer (lists appended
    twice) still serves exactly (candidate-sliver distinct); compact()
    changes nothing served; a fresh handle recovers; geometry and
    pointer guards fail loudly."""
    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        ivf_assign,
        ivfpq_topk,
        pq_encode,
    )
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    d, m, sub, ksub, C, nprobe = 16, 4, 2, 8, 4, 2
    seed = _emb_batch(spark, range(1, 121), d=d)
    b1 = _emb_batch(spark, range(121, 161), d=d)
    b2 = _emb_batch(spark, range(161, 201), d=d)

    base = str(tmp_path / "ivfopq")
    mnt = IvfOpqIndexMaintainer(spark, base, num_centroids=C)
    with pytest.raises(ValueError, match="not bootstrapped"):
        mnt.topk(seed.limit(1))
    mnt.bootstrap(seed, dim=d, m=m, sub_dim=sub, ksub=ksub)
    with pytest.raises(ValueError, match="already bootstrapped"):
        mnt.bootstrap(seed, dim=d, m=m, sub_dim=sub, ksub=ksub)
    mnt.merge_batch(b1, batch_id=0)
    mnt.merge_batch(b2, batch_id=1)
    mnt.merge_batch(b1, batch_id=0)  # redelivery: no-op

    queries = seed.filter(F.col("vec_id") <= 5)

    def one_shot(union):
        ix = P.load_opq_index(spark, os.path.join(base, "opq", "artifact"))
        rot_all = P.pca_project_batch(
            union, ix["model"], r=m * sub, out_col="embedding"
        )
        centroids = spark.read.parquet(
            os.path.join(base, "ivf", "centroids")
        )
        assigned = ivf_assign(rot_all, centroids).select(
            "vec_id", "centroid_id"
        )
        codes_all = pq_encode(rot_all, ix["codebooks"], m, sub)
        rot_q = P.pca_project_batch(
            queries, ix["model"], r=m * sub, out_col="embedding"
        )
        return sorted(
            tuple(r)
            for r in ivfpq_topk(
                rot_q, rot_q, k=4, num_centroids=C, nprobe=nprobe,
                m=m, sub_dim=sub, ksub=ksub,
                index=(centroids, assigned, ix["codebooks"], codes_all),
            ).collect()
        )

    union = seed.unionByName(b1).unionByName(b2)
    got = sorted(
        tuple(r) for r in mnt.topk(queries, k=4, nprobe=nprobe).collect()
    )
    want = one_shot(union)
    assert got == want and len(got) == 20

    # crash window: codes committed + lists appended, outer pointer
    # NOT advanced; the redelivered tick re-appends the assignments
    b3 = _emb_batch(spark, range(201, 241), d=d)
    mnt.codes.merge_batch(b3, batch_id=2)
    mnt.lists.ingest(mnt._rotate(b3))
    mnt.merge_batch(b3, batch_id=2)  # redelivery after 'crash'
    union3 = union.unionByName(b3)
    got3 = sorted(
        tuple(r) for r in mnt.topk(queries, k=4, nprobe=nprobe).collect()
    )
    assert got3 == one_shot(union3)

    # compact: identical serving, codes batch dirs folded away
    mnt.compact()
    assert not os.path.isdir(os.path.join(base, "opq", "codes_inc", "b0"))
    assert (
        sorted(
            tuple(r)
            for r in mnt.topk(queries, k=4, nprobe=nprobe).collect()
        )
        == got3
    )

    # fresh handle recovers and serves identically
    m2 = IvfOpqIndexMaintainer(spark, base, num_centroids=C)
    assert (
        sorted(
            tuple(r) for r in m2.topk(queries, k=4, nprobe=nprobe).collect()
        )
        == got3
    )

    # geometry guard: a different coarse-quantizer size is a
    # different index
    with pytest.raises(ValueError, match="geometry mismatch"):
        IvfOpqIndexMaintainer(spark, base, num_centroids=C + 1)

    # hostile pointer: corrupt JSON, then lost pointer over live halves
    ptr = os.path.join(base, "_CURRENT")
    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write("{broken")
    with pytest.raises(ValueError, match="corrupt _CURRENT pointer"):
        IvfOpqIndexMaintainer(spark, base, num_centroids=C)
    os.remove(ptr)
    with pytest.raises(ValueError, match="no _CURRENT pointer"):
        IvfOpqIndexMaintainer(spark, base, num_centroids=C)
    with open(ptr, "w") as f:
        f.write(good)
    assert IvfOpqIndexMaintainer(spark, base, num_centroids=C)


def test_ivfopq_maintainer_streaming_drain(spark, tmp_path):
    """availableNow drain into the composed index: files land, ticks
    fold through foreachBatch under the checkpoint-identity guard, a
    re-drain of the same directory adds nothing, and the served top-k
    equals the one-shot frozen build over everything drained."""
    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    d, m, sub, ksub, C = 16, 4, 2, 8, 4
    seed = _emb_batch(spark, range(1, 101), d=d)
    base = str(tmp_path / "state")
    mnt = IvfOpqIndexMaintainer(spark, base, num_centroids=C)
    mnt.bootstrap(seed, dim=d, m=m, sub_dim=sub, ksub=ksub)

    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<double>"
    _emb_batch(spark, range(101, 141), d=d).write.mode("append").parquet(src)
    mnt.run_available_now(src, schema, ckpt)
    queries = seed.filter(F.col("vec_id") <= 3)
    r1 = sorted(tuple(r) for r in mnt.topk(queries, k=3).collect())

    mnt.run_available_now(src, schema, ckpt)  # nothing new
    assert sorted(tuple(r) for r in mnt.topk(queries, k=3).collect()) == r1

    _emb_batch(spark, range(141, 171), d=d).write.mode("append").parquet(src)
    mnt.run_available_now(src, schema, ckpt)
    r2 = sorted(tuple(r) for r in mnt.topk(queries, k=3).collect())
    assert r2 != r1 or len(r2) == 9  # index grew (or ties held)
    # a foreign checkpoint cannot tick this state (the guard's
    # ValueError surfaces wrapped in StreamingQueryException)
    with pytest.raises(Exception, match="checkpoint mismatch"):
        mnt.run_available_now(src, schema, str(tmp_path / "other_ckpt"))


# ---------------------------------------------------------------------------
# VERDICT r11 #8 (stretch): drift → re-bootstrap policy operator
# ---------------------------------------------------------------------------
def test_rebootstrap_decision_on_planted_drift(spark, tmp_path):
    """The policy operator consumes the maintained monitors and emits
    the decision row: planted drift (a 0.8 mean shift on dim 3) trips
    the mean-shift trigger with evidence naming the dim and the
    artifact paths to swap; an undrifted window decides False; a
    re-widened balance audit trips the spread trigger on its own."""
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.policy import (
        rebootstrap_decision,
    )

    base = str(tmp_path / "drift")
    mnt = DriftMaintainer(spark, base)
    mnt.merge_batch(_emb_batch(spark, range(0, 80)), batch_id=0)
    mnt.mark_baseline()

    # no drift yet: same distribution keeps the index
    mnt.merge_batch(_emb_batch(spark, range(80, 120)), batch_id=1)
    calm = rebootstrap_decision(
        spark,
        mnt.drift_report(top=8),
        artifacts={"opq_index": "/warm/opq", "ivf_lists": "/warm/ivf"},
    ).collect()[0]
    assert calm["decision"] is False
    assert calm["n_drifted_dims"] == 0
    assert "within thresholds" in calm["evidence"]

    # planted drift: shift=0.8 on j==2 (dim 3)
    mnt.merge_batch(
        _emb_batch(spark, range(120, 360), shift=0.8), batch_id=2
    )
    hot = rebootstrap_decision(
        spark,
        mnt.drift_report(top=8),
        artifacts={"opq_index": "/warm/opq", "ivf_lists": "/warm/ivf"},
    ).collect()[0]
    assert hot["decision"] is True
    assert "3" in hot["drifted_dims"].split(",")
    assert hot["max_mean_shift"] >= 0.25
    assert "dims [3]" in hot["evidence"] or "dims [3," in hot["evidence"]
    assert "opq_index=/warm/opq" in hot["artifacts"]

    # balance trigger alone: a re-widened allocation trips the spread
    # threshold even with calm means
    balance = spark.createDataFrame(
        [(0, 2, 1.0, 0.5, 0.0), (1, 2, 0.01, 0.005, -9.2)],
        "subspace int, n_dims int, sum_eigenvalue double, "
        "variance_share double, log_energy double",
    )
    mnt2 = DriftMaintainer(spark, str(tmp_path / "drift2"))
    mnt2.merge_batch(_emb_batch(spark, range(0, 60)), batch_id=0)
    mnt2.mark_baseline()
    mnt2.merge_batch(_emb_batch(spark, range(60, 90)), batch_id=1)
    spread_hit = rebootstrap_decision(
        spark,
        mnt2.drift_report(top=8),
        balance_audit=balance,
        balance_spread_threshold=5.0,
    ).collect()[0]
    assert spread_hit["decision"] is True
    assert spread_hit["n_drifted_dims"] == 0
    assert "re-widened" in spread_hit["evidence"]
    assert spread_hit["balance_spread"] == pytest.approx(9.2)

    # recall floor (r12 wave 3): ground truth outranks proxies — a
    # calm drift window still re-bootstraps when measured panel recall
    # sinks below the floor; a healthy panel adds no trigger but its
    # mean is recorded in the row either way
    panel_low = spark.createDataFrame(
        [(0, 2, 0.4), (1, 3, 0.6), (2, 1, 0.2)],
        "query_id bigint, hits bigint, recall double",
    )
    recall_hit = rebootstrap_decision(
        spark,
        mnt2.drift_report(top=8),  # calm window — recall triggers alone
        recall_audit=panel_low,
        min_recall=0.5,
        artifacts={"opq_index": "/warm/opq"},
    ).collect()[0]
    assert recall_hit["decision"] is True
    assert "mean panel recall" in recall_hit["evidence"]
    assert recall_hit["mean_recall"] == pytest.approx(0.4)
    assert recall_hit["min_recall"] == 0.5

    panel_ok = spark.createDataFrame(
        [(0, 5, 1.0), (1, 4, 0.8)],
        "query_id bigint, hits bigint, recall double",
    )
    recall_ok = rebootstrap_decision(
        spark, mnt2.drift_report(top=8), recall_audit=panel_ok,
        min_recall=0.5,
    ).collect()[0]
    assert recall_ok["decision"] is False
    assert recall_ok["mean_recall"] == pytest.approx(0.9)

    # hostile config fails loudly
    with pytest.raises(ValueError, match="var_ratio_bounds"):
        rebootstrap_decision(
            spark, mnt.drift_report(), var_ratio_bounds=(2.0, 0.5)
        )


# ---------------------------------------------------------------------------
# save_opq_index model passthrough: train-once share, foreign-model guard
# ---------------------------------------------------------------------------
def test_save_opq_index_model_share_is_bit_identical(spark, tmp_path):
    """Passing the session's already-fit allocated model to
    save_opq_index freezes the IDENTICAL artifact the internal refit
    would have trained (deterministic pipeline) — pinned by comparing
    both artifacts' served rows. A raw (unallocated) or wrong-dim
    model is refused loudly."""
    from _data_engineering_pipeline_project_spark.operators import pca as P

    d, m, sub, ksub = 16, 4, 2, 8
    df = _emb_batch(spark, range(1, 121), d=d)
    model = P.opq_allocate(P.pca_fit(df, dim=d, method="gram"), m, sub)

    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    P.save_opq_index(df, pa, dim=d, m=m, sub_dim=sub, ksub=ksub)
    P.save_opq_index(df, pb, dim=d, m=m, sub_dim=sub, ksub=ksub, model=model)
    qs = df.filter(F.col("vec_id") < 5)
    got_a = sorted(
        tuple(r)
        for r in P.opq_topk_from_index(
            P.load_opq_index(spark, pa), qs, k=3
        ).collect()
    )
    got_b = sorted(
        tuple(r)
        for r in P.opq_topk_from_index(
            P.load_opq_index(spark, pb), qs, k=3
        ).collect()
    )
    assert got_a == got_b and len(got_a) == 12  # 4 queries × k=3

    raw = P.pca_fit(df, dim=d, method="gram")  # not allocated
    with pytest.raises(ValueError, match="opq_allocate'd model"):
        P.save_opq_index(
            df, str(tmp_path / "c"), dim=d, m=m, sub_dim=sub, model=raw
        )
    with pytest.raises(ValueError, match="opq_allocate'd model"):
        P.save_opq_index(
            df, str(tmp_path / "d"), dim=d + 1, m=m, sub_dim=sub, model=model
        )


# ---------------------------------------------------------------------------
# Stratified sample maintainer (r12 wave 2): per-group bottom-k monoid
# ---------------------------------------------------------------------------
def test_stratified_sample_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """SampleMaintainer(group_col=...): N ticks == a one-shot per-group
    bottom-k over the union, bit-for-bit; state holds ≤ k rows per
    group seen; a group first appearing in a later batch starts its
    own panel; redelivery is a no-op; reopening with a different
    stratification (or none) fails loudly; a legacy unstratified
    pointer is not adoptable by a stratified handle."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        bottom_k_per_group,
    )
    from _data_engineering_pipeline_project_spark.streaming.samplemaint import (
        SampleMaintainer,
    )

    def batch(lo, hi, langs):
        rows = [
            (f"doc_{i}", langs[i % len(langs)], i) for i in range(lo, hi)
        ]
        return spark.createDataFrame(
            rows, "doc_id string, lang string, n int"
        )

    base = str(tmp_path / "strat")
    k = 3
    mnt = SampleMaintainer(
        spark, base, key_col="doc_id", k=k, group_col="lang"
    )
    b1 = batch(0, 40, ["en", "de"])
    b2 = batch(40, 90, ["en", "fr"])  # fr appears only in tick 2
    b3 = batch(90, 120, ["de", "fr"])
    union = b1.unionByName(b2).unionByName(b3)
    for i, b in enumerate((b1, b2, b3)):
        mnt.merge_batch(b, batch_id=i)
    mnt.merge_batch(b2, batch_id=1)  # redelivery: no-op
    got = {tuple(r) for r in mnt.sample().collect()}
    want = {
        tuple(r)
        for r in bottom_k_per_group(union, "lang", "doc_id", k).collect()
    }
    assert got == want
    # exactly k per group, all three groups present
    per_group: dict = {}
    for _, lang, _n in got:
        per_group[lang] = per_group.get(lang, 0) + 1
    assert per_group == {"en": k, "de": k, "fr": k}

    # geometry: stratification is part of the contract
    with pytest.raises(ValueError, match="sample geometry mismatch"):
        SampleMaintainer(spark, base, key_col="doc_id", k=k)
    with pytest.raises(ValueError, match="sample geometry mismatch"):
        SampleMaintainer(
            spark, base, key_col="doc_id", k=k, group_col="source"
        )
    m2 = SampleMaintainer(
        spark, base, key_col="doc_id", k=k, group_col="lang"
    )
    assert {tuple(r) for r in m2.sample().collect()} == want


# ---------------------------------------------------------------------------
# ClusterMaintainer (r12 wave 3): incremental connected components
# ---------------------------------------------------------------------------
def _cm_pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a string, doc_b string")


def test_cluster_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """N ticks == one-shot connected_components over the union of all
    batch edges, bit-for-bit — including cross-batch transitive merges,
    a later-arriving smaller id stealing a cluster's root (alias), and
    an alias-of-alias fold (flatness invariant); redelivery is a no-op;
    compact() preserves served clusters and empties the alias map;
    post-compact ticks keep the contract."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        connected_components,
    )
    from _data_engineering_pipeline_project_spark.streaming.clustermaint import (
        ClusterMaintainer,
    )

    b1 = _cm_pairs(spark, [("b", "c"), ("x", "y")])
    b2 = _cm_pairs(spark, [("c", "d"), ("a", "b")])  # alias b -> a
    b3 = _cm_pairs(spark, [("w", "x")])  # alias x -> w
    b4 = _cm_pairs(spark, [("d", "y")])  # merge: w -> a, x re-folds to a
    batches = [b1, b2, b3, b4]

    base = str(tmp_path / "cc")
    mnt = ClusterMaintainer(spark, base)
    union = b1
    for i, b in enumerate(batches):
        mnt.merge_batch(b, batch_id=i)
        if i > 0:
            union = union.unionByName(b)
    mnt.merge_batch(b2, batch_id=1)  # redelivery: no-op

    want = {tuple(r) for r in connected_components(union).collect()}
    got = {tuple(r) for r in mnt.clusters().collect()}
    assert got == want
    assert {c for _, c in got} == {"a"}  # everything merged under min id

    # flatness: every alias points at a CURRENT root (never chained)
    al = mnt.aliases()
    assert al is not None
    amap = {r["old_root"]: r["new_root"] for r in al.collect()}
    assert set(amap.values()) <= ({"a"})
    assert all(v not in amap for v in amap.values())

    # compact: served relation unchanged, aliases emptied, dirs folded
    info = mnt.compact()
    assert info["folded_batches"] > 0
    assert mnt.aliases() is None
    assert {tuple(r) for r in mnt.clusters().collect()} == want

    # post-compact tick: new island + a merge into the compacted base
    b5 = _cm_pairs(spark, [("p", "q"), ("q", "z")])
    mnt.merge_batch(b5, batch_id=4)
    union5 = union.unionByName(b5)
    want5 = {tuple(r) for r in connected_components(union5).collect()}
    assert {tuple(r) for r in mnt.clusters().collect()} == want5

    # a NEW node bridging two existing clusters in one tick: edges
    # (a,m) and (m,p) contract to (root_a, m), (m, root_p) — the
    # contracted CC merges both components THROUGH the new node
    b6 = _cm_pairs(spark, [("a", "m"), ("m", "p")])
    mnt.merge_batch(b6, batch_id=5)
    union6 = union5.unionByName(b6)
    want6 = {tuple(r) for r in connected_components(union6).collect()}
    assert {tuple(r) for r in mnt.clusters().collect()} == want6
    assert {c for _, c in want6} == {"a"}  # one component again

    # reopen: same state from the pointer
    m2 = ClusterMaintainer(spark, base)
    assert {tuple(r) for r in m2.clusters().collect()} == want6


def test_cluster_maintainer_hostile_pointers(spark, tmp_path):
    """House hostile-artifact discipline: geometry mismatch, corrupt
    JSON, truncated pointer, and orphaned state dirs all fail loudly
    and specifically."""
    import json
    import os

    from _data_engineering_pipeline_project_spark.streaming.clustermaint import (
        ClusterMaintainer,
    )

    base = str(tmp_path / "cc")
    mnt = ClusterMaintainer(spark, base)
    mnt.merge_batch(_cm_pairs(spark, [("b", "c")]), batch_id=0)

    with pytest.raises(ValueError, match="cluster geometry mismatch"):
        ClusterMaintainer(spark, base, a_col="left", b_col="right")

    ptr = os.path.join(base, "_CURRENT")
    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="invalid JSON"):
        ClusterMaintainer(spark, base)
    with open(ptr, "w") as f:
        json.dump({"last_batch_id": 0}, f)
    with pytest.raises(ValueError, match="truncated or foreign"):
        ClusterMaintainer(spark, base)
    os.remove(ptr)
    with pytest.raises(ValueError, match="cannot be safely adopted"):
        ClusterMaintainer(spark, base)
    with open(ptr, "w") as f:
        f.write(good)
    assert ClusterMaintainer(spark, base).clusters().count() == 2


# ---------------------------------------------------------------------------
# NearDupIndexMaintainer (r12 wave 3): maintained MinHash-LSH index
# ---------------------------------------------------------------------------
def _ndm_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_near_dup_index_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """pairs() == one-shot minhash_near_dup_pairs over the union and
    clusters() == the one-shot transitive closure, bit-for-bit, with
    near-dup groups SPANNING batches (the cross-tick band join);
    redelivery and replayed doc ids are no-ops; reopening with a
    different banding geometry fails loudly."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        connected_components,
        minhash_near_dup_pairs,
    )
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    def doc(i, tail):
        return (
            i,
            "the quick brown fox jumps over the lazy dog while the "
            f"cat sleeps near the warm fire {tail}",
        )

    # three near-dup groups spanning batches + unrelated noise docs
    b1 = _ndm_docs(
        spark,
        [
            doc(1, "group one alpha"),
            doc(10, "group two beta"),
            (90, "completely different text about spark shuffle "
                 "partitions and adaptive query execution planning"),
        ],
    )
    b2 = _ndm_docs(
        spark,
        [
            doc(2, "group one alpha bis"),
            doc(11, "group two beta bis"),
            doc(20, "group three gamma"),
            (91, "another unrelated document mentioning parquet row "
                 "groups footers statistics and bloom filters"),
        ],
    )
    b3 = _ndm_docs(
        spark,
        [
            doc(3, "group one alpha ter"),
            doc(21, "group three gamma bis"),
            (92, "a third standalone text on catalyst optimizer rules "
                 "and whole stage code generation spans"),
        ],
    )
    union = b1.unionByName(b2).unionByName(b3)

    base = str(tmp_path / "ndm")
    mnt = NearDupIndexMaintainer(spark, base)
    for i, b in enumerate((b1, b2, b3)):
        mnt.merge_batch(b, batch_id=i)
    mnt.merge_batch(b2, batch_id=1)  # redelivery: no-op
    mnt.merge_batch(b2, batch_id=3)  # replayed ids in a NEW batch: dropped

    want_pairs = {
        tuple(r) for r in minhash_near_dup_pairs(union, threshold=0.3).collect()
    }
    got_pairs = {tuple(r) for r in mnt.pairs().collect()}
    assert got_pairs == want_pairs
    assert len(want_pairs) >= 3  # groups actually paired
    # cross-batch pairs exist (e.g. doc 1 in b1 ~ doc 2 in b2)
    assert any(a == 1 and b == 2 for a, b, _ in got_pairs)

    want_cc = {
        tuple(r)
        for r in connected_components(
            minhash_near_dup_pairs(union, threshold=0.3)
        ).collect()
    }
    assert {tuple(r) for r in mnt.clusters().collect()} == want_cc

    # reopen: same served relations; geometry guard
    m2 = NearDupIndexMaintainer(spark, base)
    assert {tuple(r) for r in m2.pairs().collect()} == want_pairs
    with pytest.raises(ValueError, match="geometry mismatch"):
        NearDupIndexMaintainer(spark, base, num_hashes=16)
    with pytest.raises(ValueError, match="geometry mismatch"):
        NearDupIndexMaintainer(spark, base, threshold=0.5)

    # compact: served relations unchanged; post-compact ticks keep the
    # contract (cross candidates now come from the folded bands base)
    info = m2.compact()
    assert info["folded_batches"] == 4  # incl. the all-replayed empty batch
    assert {tuple(r) for r in m2.pairs().collect()} == want_pairs
    assert {tuple(r) for r in m2.clusters().collect()} == want_cc
    b4 = _ndm_docs(spark, [doc(4, "group one alpha quater")])
    m2.merge_batch(b4, batch_id=4)
    union4 = union.unionByName(b4)
    want4 = {
        tuple(r)
        for r in minhash_near_dup_pairs(union4, threshold=0.3).collect()
    }
    assert {tuple(r) for r in m2.pairs().collect()} == want4


def test_near_dup_index_maintainer_hostile_pointers(spark, tmp_path):
    import json
    import os

    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    base = str(tmp_path / "ndm")
    mnt = NearDupIndexMaintainer(spark, base)
    mnt.merge_batch(
        _ndm_docs(spark, [(1, "a b c d e f g"), (2, "a b c d e f h")]),
        batch_id=0,
    )
    ptr = os.path.join(base, "_CURRENT")
    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write("{nope")
    with pytest.raises(ValueError, match="invalid JSON"):
        NearDupIndexMaintainer(spark, base)
    with open(ptr, "w") as f:
        json.dump({"k": 1}, f)
    with pytest.raises(ValueError, match="truncated or foreign"):
        NearDupIndexMaintainer(spark, base)
    os.remove(ptr)
    with pytest.raises(ValueError, match="cannot be safely adopted"):
        NearDupIndexMaintainer(spark, base)
    with open(ptr, "w") as f:
        f.write(good)
    assert NearDupIndexMaintainer(spark, base).docs().count() == 2


def test_cluster_maintainer_serve_plan_is_broadcast_no_shuffle(spark, tmp_path):
    """Serving plan pin (100 TB property): ``clusters()`` is ONE
    BroadcastHashJoin over the append-only member dirs — the
    corpus-sized side is scanned, never shuffled (no SortMergeJoin, no
    Exchange on the members side). Same discipline for the near-dup
    maintainer's verification lookups, pinned here at its serve face."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        scan_summary,
    )
    from _data_engineering_pipeline_project_spark.streaming.clustermaint import (
        ClusterMaintainer,
    )

    base = str(tmp_path / "cc")
    mnt = ClusterMaintainer(spark, base)
    mnt.merge_batch(_cm_pairs(spark, [("b", "c"), ("x", "y")]), 0)
    mnt.merge_batch(_cm_pairs(spark, [("a", "b")]), 1)  # alias b -> a
    assert mnt.aliases() is not None  # the serve join is actually live
    s = scan_summary(mnt.clusters())
    assert s["broadcast_joins"] == 1, s
    assert s["sortmerge_joins"] == 0, s
    # the only Exchange is the tiny alias side's broadcast build; the
    # members relation itself never shuffles
    plan = str(s)
    assert "Exchange hashpartitioning" not in plan, s


def test_near_dup_index_maintainer_streaming_drain(spark, tmp_path):
    """End-to-end availableNow drain: document files land, the index
    folds them through foreachBatch with the checkpoint-identity guard
    (pairs AND clusters current after each drain), and a second drain
    of the SAME directory adds nothing (exactly-once per file)."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from _data_engineering_pipeline_project_spark.streaming.neardupmaint import (
        NearDupIndexMaintainer,
    )

    def doc(i, tail):
        return (
            i,
            "the quick brown fox jumps over the lazy dog while the "
            f"cat sleeps near the warm fire {tail}",
        )

    d1 = _ndm_docs(spark, [doc(1, "one alpha"), doc(10, "two beta")])
    d2 = _ndm_docs(spark, [doc(2, "one alpha bis"), doc(11, "two beta bis")])

    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    d1.write.mode("append").parquet(src)
    mnt = NearDupIndexMaintainer(spark, str(tmp_path / "index"))
    schema = "doc_id bigint, text string"
    mnt.run_available_now(src, schema, ckpt)
    n1 = mnt.pairs().count()

    mnt.run_available_now(src, schema, ckpt)  # nothing new
    assert mnt.pairs().count() == n1

    d2.write.mode("append").parquet(src)
    mnt.run_available_now(src, schema, ckpt)
    want = {
        tuple(r)
        for r in minhash_near_dup_pairs(
            d1.unionByName(d2), threshold=0.3
        ).collect()
    }
    assert {tuple(r) for r in mnt.pairs().collect()} == want
    assert mnt.clusters().count() == 4  # all four docs labeled

    # a different checkpoint cannot adopt this state (the guard's
    # ValueError surfaces wrapped in the streaming query failure)
    with pytest.raises(Exception, match="checkpoint mismatch"):
        mnt.run_available_now(src, schema, str(tmp_path / "ckpt2"))


# ---------------------------------------------------------------------------
# SemDeDupMaintainer (r12 wave 3): frozen centroids, maintained pairs
# ---------------------------------------------------------------------------
def test_semdedup_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """With centroids frozen at bootstrap from the full corpus, N ticks
    == the one-shot semantic_dup_pairs over the union, bit-for-bit
    (the one-shot seeds identically from the same corpus); clusters
    match the transitive closure; redelivery/replays are no-ops;
    double-bootstrap and geometry drift fail loudly; merging before
    bootstrap fails."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        connected_components,
    )
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        semantic_dup_pairs,
    )
    from _data_engineering_pipeline_project_spark.streaming.semdedupmaint import (
        SemDeDupMaintainer,
    )

    # ids start at 1: vec 0 is the zero vector in the sine grid and a
    # zero norm is a data bug, not a tolerated input (ANSI division)
    b1 = _emb_batch(spark, range(1, 30))
    b2 = _emb_batch(spark, range(30, 70))
    b3 = _emb_batch(spark, range(70, 100))
    union = b1.unionByName(b2).unionByName(b3)

    base = str(tmp_path / "sdd")
    mnt = SemDeDupMaintainer(
        spark, base, num_centroids=4, threshold=0.9, dim=8
    )
    with pytest.raises(ValueError, match="bootstrap"):
        mnt.merge_batch(b1, batch_id=0)
    mnt.bootstrap(union)
    with pytest.raises(ValueError, match="already bootstrapped"):
        mnt.bootstrap(union)
    for i, b in enumerate((b1, b2, b3)):
        mnt.merge_batch(b, batch_id=i)
    mnt.merge_batch(b2, batch_id=1)  # redelivery: no-op

    want = {
        tuple(r)
        for r in semantic_dup_pairs(
            union, threshold=0.9, num_centroids=4, dim=8
        ).collect()
    }
    got = {tuple(r) for r in mnt.pairs().collect()}
    assert got == want
    assert len(want) >= 5  # sine-grid embeddings do produce near-dups
    # cross-tick pairs exist (ids from different batches)
    assert any(a < 30 <= b for _, a, b, _ in got)

    want_cc = {
        tuple(r)
        for r in connected_components(
            semantic_dup_pairs(union, threshold=0.9, num_centroids=4, dim=8),
            a_col="vec_a",
            b_col="vec_b",
        ).collect()
    }
    assert {tuple(r) for r in mnt.clusters().collect()} == want_cc

    # reopen from pointer; geometry guard
    m2 = SemDeDupMaintainer(
        spark, base, num_centroids=4, threshold=0.9, dim=8
    )
    assert {tuple(r) for r in m2.pairs().collect()} == want
    with pytest.raises(ValueError, match="geometry mismatch"):
        SemDeDupMaintainer(spark, base, num_centroids=8, threshold=0.9)
    with pytest.raises(ValueError, match="geometry mismatch"):
        SemDeDupMaintainer(
            spark, base, num_centroids=4, threshold=0.5, dim=8
        )


def test_semdedup_maintainer_hostile_pointers_and_drain(spark, tmp_path):
    """House discipline for the semantic index too: corrupt/truncated/
    lost pointers fail loudly; an availableNow drain folds landed files
    exactly once and a foreign checkpoint is rejected."""
    import json
    import os

    from _data_engineering_pipeline_project_spark.streaming.semdedupmaint import (
        SemDeDupMaintainer,
    )

    base = str(tmp_path / "sdd")
    mnt = SemDeDupMaintainer(
        spark, base, num_centroids=2, threshold=0.9, dim=8
    )
    seed = _emb_batch(spark, range(1, 40))
    mnt.bootstrap(seed)

    # streaming drain: files land, fold once, re-drain adds nothing
    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    _emb_batch(spark, range(1, 20)).write.mode("append").parquet(src)
    schema = "vec_id long, embedding array<double>"
    mnt.run_available_now(src, schema, ckpt)
    n1 = mnt.pairs().count()
    mnt.run_available_now(src, schema, ckpt)  # nothing new
    assert mnt.pairs().count() == n1
    _emb_batch(spark, range(20, 40)).write.mode("append").parquet(src)
    mnt.run_available_now(src, schema, ckpt)
    assert mnt.pairs().count() > n1
    with pytest.raises(Exception, match="checkpoint mismatch"):
        mnt.run_available_now(src, schema, str(tmp_path / "ckpt2"))

    # hostile pointers
    ptr = os.path.join(base, "_CURRENT")
    good = open(ptr).read()
    with open(ptr, "w") as f:
        f.write("{nope")
    with pytest.raises(ValueError, match="invalid JSON"):
        SemDeDupMaintainer(spark, base, num_centroids=2, threshold=0.9, dim=8)
    with open(ptr, "w") as f:
        json.dump({"threshold": 0.9}, f)
    with pytest.raises(ValueError, match="truncated or foreign"):
        SemDeDupMaintainer(spark, base, num_centroids=2, threshold=0.9, dim=8)
    os.remove(ptr)
    with pytest.raises(ValueError, match="cannot be safely adopted"):
        SemDeDupMaintainer(spark, base, num_centroids=2, threshold=0.9, dim=8)
    with open(ptr, "w") as f:
        f.write(good)
    m2 = SemDeDupMaintainer(
        spark, base, num_centroids=2, threshold=0.9, dim=8
    )
    assert m2.pairs().count() == mnt.pairs().count()


# ---------------------------------------------------------------------------
# r12 self-review regression pins
# ---------------------------------------------------------------------------
def test_ivfopq_unbootstrapped_dir_is_reopenable(spark, tmp_path):
    """Constructing IvfOpqIndexMaintainer makedirs its halves BEFORE any
    bootstrap; reopening that never-bootstrapped base_dir must succeed
    (the orphan guard keys on COMMITTED content — the OPQ half's
    pointer / the IVF quantizer — not bare directories, which
    previously bricked the dir permanently). Committed state with a
    lost pointer still refuses adoption."""
    import os

    from _data_engineering_pipeline_project_spark.streaming.ivfopqmaint import (
        IvfOpqIndexMaintainer,
    )

    base = str(tmp_path / "idx")
    IvfOpqIndexMaintainer(spark, base)  # abandoned before bootstrap
    m2 = IvfOpqIndexMaintainer(spark, base)  # must not raise
    emb = _emb_batch(spark, range(1, 40))
    m2.bootstrap(emb, dim=8, m=4, sub_dim=2, ksub=4)
    os.remove(os.path.join(base, "_CURRENT"))
    with pytest.raises(ValueError, match="cannot be safely adopted"):
        IvfOpqIndexMaintainer(spark, base)


def test_rebootstrap_decision_rejects_empty_recall_panel(spark, tmp_path):
    """An empty recall audit is a monitoring failure, not evidence of
    health — the policy must fail loudly instead of reporting 'within
    thresholds' on missing evidence."""
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )
    from _data_engineering_pipeline_project_spark.streaming.policy import (
        rebootstrap_decision,
    )

    mnt = DriftMaintainer(spark, str(tmp_path / "d"))
    mnt.merge_batch(_emb_batch(spark, range(1, 40)), batch_id=0)
    mnt.mark_baseline()
    mnt.merge_batch(_emb_batch(spark, range(40, 60)), batch_id=1)
    empty = spark.createDataFrame(
        [], "query_id bigint, hits bigint, recall double"
    )
    with pytest.raises(ValueError, match="recall_audit has no rows"):
        rebootstrap_decision(
            spark, mnt.drift_report(top=8), recall_audit=empty,
            min_recall=0.5,
        )


def test_save_opq_index_rejects_mismatched_allocation_geometry(spark, tmp_path):
    """A caller-supplied model allocated for a DIFFERENT (m, sub_dim)
    grouping must be refused even when dim matches — the permutation
    length pins the PQ geometry (a dim-only check silently froze a
    mis-grouped rotation)."""
    from _data_engineering_pipeline_project_spark.operators import pca as P

    emb = _emb_batch(spark, range(1, 60))
    model = P.opq_allocate(
        P.pca_fit(emb, dim=8, method="gram"), 2, 4
    )  # 2×4 grouping
    with pytest.raises(ValueError, match="m·sub_dim"):
        P.save_opq_index(
            emb, str(tmp_path / "x"), dim=8, m=4, sub_dim=2, ksub=4,
            model=model,
        )
