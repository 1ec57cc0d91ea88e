"""Round 11: ADVICE fixes (gram int64 headroom guard, pointer-first
bloom rotation, probe column-collision guard) and the VERDICT r10
brief — shared footer fan-out for the ranked span audit, one-pass
multi-column equi-depth stats, crash-mid-rotate recovery, OPQ-rotated
retrieval, drift maintainer, artifact-load adversarial sweep."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators import membership as M

M_BITS = 1 << 12
K = 3


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


# ---------------------------------------------------------------------------
# ADVICE r10 (medium): gram int64 headroom guard
# ---------------------------------------------------------------------------
def test_gram_overflow_guard_raises_loudly(spark):
    """Elements big enough to overflow the int64 Gram sum raise a loud
    headroom error instead of letting numpy wrap silently (silent
    garbage covariance was the one remaining silent path — the
    NULL/ragged/dim-mismatch guards already fail loudly). Values inside
    the envelope still work."""
    from pyspark.errors import PySparkException

    from _data_engineering_pipeline_project_spark.operators import pca as P

    # |x| = 2^12 -> quantized |v| = 2^32; one row already puts
    # rows*max^2 = 2^64 > 2^62
    big = spark.createDataFrame(
        [(i, [float(1 << 12)] * 4) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PySparkException, match="headroom"):
        P.covariance_pairs(big, method="gram", dim=4).collect()

    # the documented envelope (|x| <~ 30) stays fine and bit-identical
    ok = spark.createDataFrame(
        [(i, [float(i % 7) - 3.0, 29.5, -29.5, 0.25]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    a = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in P.covariance_pairs(ok).collect()
    }
    b = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in P.covariance_pairs(ok, method="gram", dim=4).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# ADVICE r10 (low): bloom_probe column-collision guard
# ---------------------------------------------------------------------------
def test_bloom_probe_rejects_column_collisions(spark):
    """Probing a frame that already carries '__k' or the flag column
    fails loudly (re-probing an annotated frame was ambiguous-join /
    duplicate-column territory); a fresh flag name works."""
    df = _keys_df(spark, ["a", "b"])
    words = M.bloom_build(df, F.col("k"), M_BITS, K)

    annotated = M.bloom_probe(words, df, F.col("k"), M_BITS, K)
    assert "bloom_member" in annotated.columns
    with pytest.raises(ValueError, match="bloom_member"):
        M.bloom_probe(words, annotated, F.col("k"), M_BITS, K)
    # a different flag name probes the annotated frame fine
    again = M.bloom_probe(
        words, annotated, F.col("k"), M_BITS, K, flag="bloom_member2"
    ).collect()
    assert all(r["bloom_member2"] for r in again)

    withk = df.withColumn("__k", F.lit(1))
    with pytest.raises(ValueError, match="__k"):
        M.bloom_probe(words, withk, F.col("k"), M_BITS, K)


# ---------------------------------------------------------------------------
# ADVICE r10 (low) + VERDICT #5: pointer-first rotation, crash-mid-rotate
# ---------------------------------------------------------------------------
def test_rotating_bloom_crash_mid_rotate_recovers_exactly(spark, tmp_path):
    """Kill rotate() between the pointer commit and the slot reset
    (the ADVICE r10 ordering fix: pointer FIRST): recovery must
    (a) land on the advanced slot, (b) re-reset it before any merge —
    no stale keys resurrected from the aged-out window, (c) lose no
    committed window — every in-retention key still probes member.
    Also pins the other crash point (slot reset done, second commit
    lost): recovery re-resets an empty slot, a no-op."""
    from _data_engineering_pipeline_project_spark.streaming.bloommaint import (
        RotatingBloomMaintainer,
    )

    base = str(tmp_path / "ring")
    r = RotatingBloomMaintainer(spark, base, m_bits=M_BITS, k=K, generations=3)
    windows = []
    for w in range(3):  # fill slots 0,1,2
        keys = [f"w{w}k{i}" for i in range(20)]
        windows.append(keys)
        if w > 0:
            r.rotate()
        r.merge_batch(_keys_df(spark, keys), batch_id=0)

    # crash point A: pointer advanced (needs_reset committed), slot
    # reset never ran — simulate by raising out of _reset_slot
    class Boom(RuntimeError):
        pass

    orig_reset = r._reset_slot
    r._reset_slot = lambda g: (_ for _ in ()).throw(Boom())
    with pytest.raises(Boom):
        r.rotate()
    r._reset_slot = orig_reset

    # the on-disk pointer shows the advanced slot with the pending flag
    with open(os.path.join(base, "_RING")) as f:
        meta = json.load(f)
    assert meta["current"] == 0 and meta["needs_reset"] is True
    # and slot 0 still physically holds window 0's (stale) words
    assert os.path.isdir(os.path.join(base, "gen_0", "words_v1"))

    # recovery: fresh handle completes the rotation before any merge
    r2 = RotatingBloomMaintainer(spark, base, m_bits=M_BITS, k=K, generations=3)
    assert r2.current_slot == 0
    with open(os.path.join(base, "_RING")) as f:
        assert json.load(f)["needs_reset"] is False
    r2.merge_batch(_keys_df(spark, [f"w3k{i}" for i in range(20)]), batch_id=0)
    windows.append([f"w3k{i}" for i in range(20)])

    live = windows[1] + windows[2] + windows[3]
    aged = windows[0]
    flags = {
        row["k"]: row["bloom_member"]
        for row in r2.probe(_keys_df(spark, live + aged), "k").collect()
    }
    # (c) no committed in-retention window lost
    assert all(flags[k] for k in live)
    # (b) the aged-out window did NOT resurrect (tiny FP allowance)
    assert sum(1 for k in aged if flags[k]) <= 1

    # crash point B: reset done, second commit lost -> pending flag
    # with an ALREADY-empty slot; recovery re-reset is a no-op
    with open(os.path.join(base, "_RING")) as f:
        meta = json.load(f)
    meta["needs_reset"] = True
    with open(os.path.join(base, "_RING"), "w") as f:
        json.dump(meta, f)
    r3 = RotatingBloomMaintainer(spark, base, m_bits=M_BITS, k=K, generations=3)
    flags3 = {
        row["k"]: row["bloom_member"]
        for row in r3.probe(_keys_df(spark, live), "k").collect()
    }
    assert all(flags3[k] for k in windows[1] + windows[2])
    # window 3 lived in the re-reset current slot: by the pointer-first
    # contract the current window's partial content is the one thing a
    # mid-rotate crash may age out early -- but here the flag was
    # forged AFTER window 3 committed, so the re-reset wipes it; that
    # is the documented over-eager-reset direction (safe: false
    # "new" verdicts never occur for committed OLDER windows).
    # The real crash can only set the flag BEFORE any merge into the
    # slot, which test point A covers end-to-end.


# ---------------------------------------------------------------------------
# VERDICT r10 #4: one-pass multi-column equi-depth stats
# ---------------------------------------------------------------------------
def test_equi_depth_bounds_multi_matches_per_column(spark):
    """One multi-column approxQuantile pass returns IDENTICAL
    boundaries to k independent per-column passes (same GK summaries,
    same value sequences), on real testdata including a long-tailed
    column and a NaN/NULL-bearing frame."""
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators import layout as L

    orders = table(spark, "/root/testdata/sf0.001", "orders")
    cols = ["o_totalprice", "o_custkey", "o_orderkey"]
    multi = L.equi_depth_bounds_multi(orders, cols, bits=6)
    for c in cols:
        single = L.equi_depth_bounds(
            orders.select(c), c, bits=6
        )
        assert multi[c] == single, c

    # NaN/NULL handling matches the single-column row-filter form
    messy = spark.createDataFrame(
        [(float("nan"), 1.0), (None, 2.0), (5.0, None), (1.0, 4.0),
         (2.0, 8.0), (3.0, 16.0)],
        "a double, b double",
    )
    m2 = L.equi_depth_bounds_multi(messy, ["a", "b"], bits=2)
    assert m2["a"] == L.equi_depth_bounds(messy.select("a"), "a", bits=2)
    assert m2["b"] == L.equi_depth_bounds(messy.select("b"), "b", bits=2)


def test_equi_depth_write_unchanged_by_multi_stats(spark, tmp_path):
    """The clustered write driven by the one-pass stats produces the
    same rows and a tight layout (regression pin on the refactor)."""
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans,
        write_zordered_quantized,
    )

    cust = table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    path = str(tmp_path / "zq")
    write_zordered_quantized(
        cust, path, ["c_acctbal", "c_nationkey"], bits=6,
        num_files=4, quantize="equi_depth",
    )
    spans = file_stat_spans(spark, path, "c_acctbal")
    assert len(spans) == 4
    assert sum(spans) / len(spans) < 0.8
    back = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert back == sorted(tuple(r) for r in cust.collect())


# ---------------------------------------------------------------------------
# VERDICT r10 #2: ranked span audit through the footer fan-out
# ---------------------------------------------------------------------------
def test_ranked_spans_distributed_equals_driver_loop(spark, tmp_path):
    """file_stat_spans_ranked(distributed=True) — now the default —
    returns the same multiset of rank spans as the sequential driver
    loop (same _footer_min_max calls, same CDF; only footer-read
    placement differs)."""
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans_ranked,
        write_zordered_quantized,
    )

    orders = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice", "o_custkey"
    )
    path = str(tmp_path / "ranked")
    write_zordered_quantized(
        orders, path, ["o_totalprice", "o_custkey"], bits=8,
        num_files=6, quantize="equi_depth",
    )
    dist = file_stat_spans_ranked(spark, path, "o_totalprice")
    seq = file_stat_spans_ranked(
        spark, path, "o_totalprice", distributed=False
    )
    assert len(dist) == len(seq) == 6
    assert sorted(dist) == sorted(seq)
    # and the layout is actually tight in rank space
    assert sum(dist) / len(dist) < 0.7


# ---------------------------------------------------------------------------
# VERDICT r10 #1: OPQ-rotated retrieval, registered + oracled
# ---------------------------------------------------------------------------
def _synth_lowrank(spark, n=400, d=16, rank=4, noise=0.05):
    """Deterministic low-rank-plus-noise embeddings (the correlated
    fixture OPQ exists for — same construction as test_round10b)."""
    import math

    rows = []
    for i in range(n):
        lat = [math.sin(0.7 * i * (k + 1)) for k in range(rank)]
        vec = []
        for j in range(d):
            v = sum(
                lat[k] * math.cos(0.3 * (k + 1) * (j + 1)) for k in range(rank)
            )
            v += noise * math.sin(12.9898 * i + 78.233 * j)
            vec.append(v)
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pca_project_batch_bit_identical_and_guarded(spark):
    """The Arrow-batched projection equals the unrolled expression form
    EXACTLY (same left-fold IEEE op chain per output element), and
    fails loudly on ragged/NULL/width-mismatched vectors like the gram
    covariance path."""
    from pyspark.errors import PySparkException

    from _data_engineering_pipeline_project_spark.operators import pca as P

    df = _synth_lowrank(spark, n=120, d=16, rank=4)
    model = P.opq_allocate(P.pca_fit(df, dim=16), m=4, sub_dim=2)
    a = {
        (r["vec_id"], tuple(r["p"]))
        for r in P.pca_project(df, model, r=8, out_col="p").collect()
    }
    b = {
        (r["vec_id"], tuple(r["p"]))
        for r in P.pca_project_batch(df, model, r=8, out_col="p").collect()
    }
    assert a == b

    nullelem = spark.createDataFrame(
        [(0, [1.0, None] + [0.0] * 14)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(PySparkException, match="NULL/NaN"):
        P.pca_project_batch(nullelem, model, r=4).collect()
    narrow = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(PySparkException, match="does not match model"):
        P.pca_project_batch(narrow, model, r=4).collect()


def test_opq_query_recall_beats_plain_pq_query(spark):
    """The registered query's pipeline (fit gram → opq_allocate →
    batch-project → PQ-ADC, at the registry geometry m=16 × sub_dim=2,
    ksub=64) beats the plain-PQ query's recall@5 against exact L2 on
    the correlated fixture — the registry now serves the measured win,
    not the anti-pattern (VERDICT r10 #1 done-criterion)."""
    import numpy as np

    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_adc_topk,
    )

    d, m, sub, ksub, K = 64, 16, 2, 64, 5
    df = _synth_lowrank(spark, n=400, d=d, rank=6)
    X = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()])
    qids = list(range(10))

    def exact_topk(Xs):
        out = {}
        for q in qids:
            d2 = ((Xs - Xs[q]) ** 2).sum(axis=1)
            d2[q] = np.inf
            out[q] = set(np.argsort(d2, kind="stable")[:K].tolist())
        return out

    def recall(frame, Xs):
        got = {}
        qs = frame.filter(F.col("vec_id") < 10)
        for r in pq_adc_topk(
            frame, qs, k=K, m=m, sub_dim=sub, ksub=ksub
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ex = exact_topk(Xs)
        return sum(len(got.get(q, set()) & ex[q]) for q in qids) / (
            K * len(qids)
        )

    r_plain = recall(df, X)
    model = P.opq_allocate(
        P.pca_fit(df, dim=d, method="gram"), m=m, sub_dim=sub
    )
    rot = P.pca_project_batch(df, model, r=m * sub, out_col="embedding")
    Xc = X - np.array(model["mean"])
    Xrot = Xc @ np.array(model["components"][: m * sub]).T
    r_opq = recall(rot, Xrot)
    assert r_opq >= r_plain, (r_plain, r_opq)
    assert r_opq > 0.5, r_opq


# ---------------------------------------------------------------------------
# VERDICT r10 #3: bloom words layout proven at the scan-metric level
# ---------------------------------------------------------------------------
def _scan_output_rows(spark, path, pred) -> int:
    """Rows the parquet reader actually DECODED for a filtered read
    (FileSourceScan numOutputRows after row-group skipping) — the
    test_round9 runtime-skip metric."""
    df = spark.read.parquet(path).filter(pred)
    df.collect()

    def walk(node):
        rows = []
        for i in range(node.children().size()):
            rows += walk(node.children().apply(i))
        if "FileSourceScan" in node.getClass().getName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    rows.append(kv._2().value())
        return rows

    return sum(walk(df._jdf.queryExecution().executedPlan()))


def test_bloom_words_layout_row_group_skips(spark, tmp_path):
    """The persisted words artifact's clustering claim, proven at the
    runtime scan metric (the z-order test's discipline): a probe
    batch's word working set, pushed as an IN filter over the
    word_idx-clustered words relation, decodes a small fraction of the
    filter; and the scan-pruned probe returns IDENTICAL flags to the
    full-scan probe (a word no key touches cannot change a verdict)."""
    pytest.importorskip("pyarrow")
    path = str(tmp_path / "bloomidx")
    keys = spark.range(400_000).select(
        F.concat(F.lit("key"), F.col("id")).alias("k")
    )
    M.save_bloom_index(
        keys,
        F.col("k"),
        path,
        m_bits=1 << 26,
        k=3,
        num_files=8,
        row_group_bytes=1 << 16,  # ~4k words/group: lookup-read shape
    )
    idx = M.load_bloom_index(spark, path)
    total_words = idx["words"].count()
    assert total_words > 400_000  # big enough for skip economics

    probe = _keys_df(
        spark, [f"key{i}" for i in range(0, 500, 100)] + ["novel-a", "novel-b"]
    )
    full = {
        r["k"]: r["bloom_member"]
        for r in M.bloom_probe_index(idx, probe, F.col("k")).collect()
    }
    pruned = {
        r["k"]: r["bloom_member"]
        for r in M.bloom_probe_index(
            idx, probe, F.col("k"), prune_scan=True
        ).collect()
    }
    assert pruned == full
    assert all(full[f"key{i}"] for i in range(0, 500, 100))  # no FNs

    # runtime skip: the working-set filter decodes ≪ the words relation
    ws = M.probe_word_working_set(probe, F.col("k"), idx["m_bits"], idx["k"])
    assert len(ws) <= 7 * 3  # ≤ distinct_keys·k
    decoded = _scan_output_rows(
        spark, f"{path}/words", F.col("word_idx").isin(ws)
    )
    matched = idx["words"].filter(F.col("word_idx").isin(ws)).count()
    assert decoded >= matched  # skipping never loses matches
    assert decoded < total_words / 8, (decoded, total_words)


# ---------------------------------------------------------------------------
# VERDICT r10 #6: streaming embedding-drift maintainer
# ---------------------------------------------------------------------------
def _emb_batch(spark, ids, shift=0.0, d=8):
    import math

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


def test_drift_maintainer_ticks_equal_recompute(spark, tmp_path):
    """N maintained ticks serve per-dim moments BIT-IDENTICAL to a
    one-shot recompute over the union of batches (decimal sums are an
    exact monoid; the read-time double math is the audit's sequence).
    A redelivered batch id is a no-op; a fresh handle recovers
    version/baseline; vacuum never drops the pinned baseline."""
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
        drift_partials,
        moments_from_partials,
    )

    base = str(tmp_path / "drift")
    mnt = DriftMaintainer(spark, base)
    batches = [
        _emb_batch(spark, range(0, 40)),
        _emb_batch(spark, range(40, 90)),
        _emb_batch(spark, range(90, 120)),
    ]
    for bid, b in enumerate(batches):
        mnt.merge_batch(b, batch_id=bid)
    mnt.merge_batch(batches[0], batch_id=0)  # redelivery: no-op
    assert mnt.version == 3

    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {
        (r["dim"], r["n"], r["mu"], r["var"])
        for r in moments_from_partials(drift_partials(union)).collect()
    }
    got = {
        (r["dim"], r["n"], r["mu"], r["var"])
        for r in mnt.moments().collect()
    }
    assert got == want and len(got) == 8

    # baseline + drifted tick -> report names the shifted dim first
    mnt.mark_baseline()
    mnt.merge_batch(
        _emb_batch(spark, range(120, 240), shift=0.8), batch_id=3
    )
    rep = mnt.drift_report(top=3).collect()
    assert rep[0]["dim"] == 3  # 0-based j==2 -> dim 3
    assert rep[0]["mean_shift"] > 0.2
    assert rep[0]["var_ratio"] > 1.0  # shift on half the mass widens var

    # recovery + baseline-safe vacuum
    m2 = DriftMaintainer(spark, base)
    assert m2.version == 4 and m2.baseline_version == 3
    removed = m2.vacuum_versions(keep_last=1)
    assert "moments_v3" not in removed  # pinned baseline survives
    assert "moments_v1" in removed and "moments_v2" in removed
    rep2 = m2.drift_report(top=3).collect()
    assert [r["dim"] for r in rep2] == [r["dim"] for r in rep]


def test_drift_maintainer_geometry_guards(spark, tmp_path):
    """Hostile-geometry guards: reopening with a different vec_col
    fails loudly; a batch whose vector width differs from the pinned
    state width fails loudly (silent unions of mixed-width moments are
    garbage); an empty/all-NULL batch is a no-op, not a width-0 pin."""
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )

    base = str(tmp_path / "driftg")
    mnt = DriftMaintainer(spark, base)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    mnt.merge_batch(empty, batch_id=0)
    assert mnt.version == 0  # no-op, nothing pinned

    mnt.merge_batch(_emb_batch(spark, range(0, 30), d=8), batch_id=1)
    assert mnt.version == 1

    with pytest.raises(ValueError, match="drift geometry mismatch"):
        mnt.merge_batch(_emb_batch(spark, range(30, 60), d=16), batch_id=2)

    with pytest.raises(ValueError, match="drift geometry mismatch"):
        DriftMaintainer(spark, base, vec_col="other_col")
    # same geometry reopens fine and remembers the width
    m2 = DriftMaintainer(spark, base)
    with pytest.raises(ValueError, match="drift geometry mismatch"):
        m2.merge_batch(_emb_batch(spark, range(30, 60), d=16), batch_id=2)
    m2.merge_batch(_emb_batch(spark, range(30, 60), d=8), batch_id=2)
    assert {r["n"] for r in m2.moments().collect()} == {60}


def test_drift_maintainer_streaming_drain(spark, tmp_path):
    """End-to-end availableNow drain: files land, the maintainer folds
    them through foreachBatch with the checkpoint-identity guard, and a
    second drain of the SAME directory adds nothing (exactly-once per
    file)."""
    from _data_engineering_pipeline_project_spark.streaming.driftmaint import (
        DriftMaintainer,
    )

    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    _emb_batch(spark, range(0, 50)).write.mode("append").parquet(src)
    mnt = DriftMaintainer(spark, str(tmp_path / "state"))
    schema = "vec_id long, embedding array<double>"
    mnt.run_available_now(src, schema, ckpt)
    n1 = {r["dim"]: r["n"] for r in mnt.moments().collect()}
    assert set(n1.values()) == {50}

    mnt.run_available_now(src, schema, ckpt)  # nothing new
    n2 = {r["dim"]: r["n"] for r in mnt.moments().collect()}
    assert n2 == n1

    _emb_batch(spark, range(50, 80)).write.mode("append").parquet(src)
    mnt.run_available_now(src, schema, ckpt)
    n3 = {r["dim"]: r["n"] for r in mnt.moments().collect()}
    assert set(n3.values()) == {80}


# ---------------------------------------------------------------------------
# Wave 2: bottom-k-by-hash fixed-size sampling (operator + maintainer)
# ---------------------------------------------------------------------------
def test_bottom_k_sample_properties(spark):
    """Determinism, consistency (bottom-k ⊂ bottom-2k), monoid
    (bottom-k of union == bottom-k of per-part bottom-k's), and the
    TakeOrdered plan shape (no full sort of the input)."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        bottom_k_per_group,
        bottom_k_sample,
    )

    df = spark.range(5000).select(
        F.concat(F.lit("id"), F.col("id")).alias("k"),
        (F.col("id") % 3).alias("g"),
    )
    s1 = sorted(r["k"] for r in bottom_k_sample(df, "k", 16).collect())
    s2 = sorted(r["k"] for r in bottom_k_sample(df, "k", 16).collect())
    assert s1 == s2 and len(s1) == 16
    s32 = {r["k"] for r in bottom_k_sample(df, "k", 32).collect()}
    assert set(s1) <= s32  # consistency

    a, b = df.filter(F.col("g") != 2), df.filter(F.col("g") == 2)
    merged = sorted(
        r["k"]
        for r in bottom_k_sample(
            bottom_k_sample(a, "k", 16).unionByName(
                bottom_k_sample(b, "k", 16)
            ),
            "k",
            16,
        ).collect()
    )
    assert merged == s1  # monoid

    plan = bottom_k_sample(df, "k", 16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # k-row heaps, no full sort

    per = bottom_k_per_group(df, "g", "k", 5).collect()
    from collections import Counter

    assert Counter(r["g"] for r in per) == {0: 5, 1: 5, 2: 5}

    # NULL keys are EXCLUDED, never silently sampled first (md5(NULL)
    # is NULL and would sort ahead of every hash)
    withnull = df.unionByName(
        spark.createDataFrame([(None, 0), (None, 1)], "k string, g int")
    )
    sn = bottom_k_sample(withnull, "k", 16).collect()
    assert all(r["k"] is not None for r in sn)
    assert sorted(r["k"] for r in sn) == s1
    pn = bottom_k_per_group(withnull, "g", "k", 5).collect()
    assert all(r["k"] is not None for r in pn)


def test_sample_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """N maintained ticks == one-shot bottom-k over the union of all
    batches, exactly; redelivery is a no-op; a fresh handle recovers;
    geometry mismatch fails loudly."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        bottom_k_sample,
    )
    from _data_engineering_pipeline_project_spark.streaming.samplemaint import (
        SampleMaintainer,
    )

    base = str(tmp_path / "samp")
    mnt = SampleMaintainer(spark, base, key_col="k", k=10)
    batches = [
        spark.createDataFrame(
            [(f"b{b}r{i}", b * 100 + i) for i in range(40)], "k string, v int"
        )
        for b in range(3)
    ]
    for bid, b in enumerate(batches):
        mnt.merge_batch(b, batch_id=bid)
    mnt.merge_batch(batches[1], batch_id=1)  # redelivery no-op
    assert mnt.version == 3

    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = sorted(tuple(r) for r in bottom_k_sample(union, "k", 10).collect())
    got = sorted(tuple(r) for r in mnt.sample().collect())
    assert got == want and len(got) == 10

    m2 = SampleMaintainer(spark, base, key_col="k", k=10)
    assert m2.version == 3
    assert sorted(tuple(r) for r in m2.sample().collect()) == want
    with pytest.raises(ValueError, match="sample geometry mismatch"):
        SampleMaintainer(spark, base, key_col="k", k=20)
    with pytest.raises(ValueError, match="sample geometry mismatch"):
        SampleMaintainer(spark, base, key_col="v", k=10)


# ---------------------------------------------------------------------------
# Wave 2: Count-Min frequency sketch
# ---------------------------------------------------------------------------
def test_cm_sketch_properties(spark):
    """CM contract on hostile keys at a deliberately collision-heavy
    geometry: estimate ≥ true count for EVERY key (never under);
    merge of per-part sketches equals the sketch of the union
    (monoid); geometry validation fails loudly."""
    from _data_engineering_pipeline_project_spark.operators import (
        frequency as FQ,
    )

    hostile = [
        "", " ", "a", "ünïcode-ké y", "emoji 🙂🚀 key", "line\nbreak",
        "0", "-1", "9" * 500, "null", "None",
    ]
    rows = [(k,) for k in hostile for _ in range(hostile.index(k) + 1)]
    df = spark.createDataFrame(rows, "k string")
    W, D = 16, 2  # tiny width: collisions guaranteed
    cells = FQ.cm_build(df, F.col("k"), W, D)
    est = {
        r["key"]: r["cm_estimate"]
        for r in FQ.cm_estimate(
            cells, df, F.col("k"), W, D
        ).collect()
    }
    exact = {k: hostile.index(k) + 1 for k in hostile}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact), (est, exact)

    # monoid: per-part build + merge == build of the union
    a = spark.createDataFrame(rows[: len(rows) // 2], "k string")
    b = spark.createDataFrame(rows[len(rows) // 2 :], "k string")
    merged = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in FQ.cm_merge(
            FQ.cm_build(a, F.col("k"), W, D),
            FQ.cm_build(b, F.col("k"), W, D),
        ).collect()
    }
    whole = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in cells.collect()
    }
    assert merged == whole

    # NULL keys dropped, never a NULL cell
    withnull = df.unionByName(spark.createDataFrame([(None,)], "k string"))
    cn = FQ.cm_build(withnull, F.col("k"), W, D).collect()
    assert all(r["col"] is not None for r in cn)
    assert {(r["row_idx"], r["col"]): r["cnt"] for r in cn} == whole

    with pytest.raises(ValueError, match="width"):
        FQ.cm_positions(F.col("k"), 1, 2)
    with pytest.raises(ValueError, match="depth"):
        FQ.cm_positions(F.col("k"), 16, 0)


def test_count_min_maintainer_ticks_equal_one_shot(spark, tmp_path):
    """N maintained ticks produce cells EXACTLY equal to a one-shot
    build over the union of batches (cell-wise integer addition is
    order-free); redelivery is a no-op; recovery and geometry guard
    behave like the sibling maintainers; estimates never undercount."""
    from _data_engineering_pipeline_project_spark.operators import (
        frequency as FQ,
    )
    from _data_engineering_pipeline_project_spark.streaming.cmmaint import (
        CountMinMaintainer,
    )

    base = str(tmp_path / "cm")
    W, D = 32, 3
    mnt = CountMinMaintainer(spark, base, width=W, depth=D)
    batches = [
        spark.createDataFrame(
            [(f"k{i % (10 + b * 5)}",) for i in range(60)], "k string"
        )
        for b in range(3)
    ]
    for bid, b in enumerate(batches):
        mnt.merge_batch(b, batch_id=bid)
    mnt.merge_batch(batches[0], batch_id=0)  # redelivery no-op
    assert mnt.version == 3

    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in FQ.cm_build(union, F.col("k"), W, D).collect()
    }
    got = {
        (r["row_idx"], r["col"]): r["cnt"]
        for r in mnt.current().collect()
    }
    assert got == want

    exact = {
        r["k"]: r["n"]
        for r in union.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est = {
        r["key"]: r["cm_estimate"]
        for r in mnt.estimate(union, "k").collect()
    }
    assert all(est[k] >= exact[k] for k in exact)

    m2 = CountMinMaintainer(spark, base, width=W, depth=D)
    assert m2.version == 3
    with pytest.raises(ValueError, match="count-min geometry mismatch"):
        CountMinMaintainer(spark, base, width=64, depth=D)


# ---------------------------------------------------------------------------
# Wave 2: OPQ index maintainer (frozen transform, growing codes)
# ---------------------------------------------------------------------------
def test_opq_index_maintainer_equals_frozen_one_shot(spark, tmp_path):
    """After bootstrap + N ticks, served ADC top-k equals a one-shot
    encode of the FULL accumulated corpus with the same frozen
    model/codebooks — exactly (encode is deterministic and per-row
    independent). Redelivery is a no-op; compact() changes nothing
    served and drops the batch dirs; a fresh handle recovers; a
    pointerless artifact and a double bootstrap fail loudly."""
    import os

    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )
    from _data_engineering_pipeline_project_spark.streaming.opqmaint import (
        OpqIndexMaintainer,
    )

    d, m, sub, ksub = 16, 4, 2, 8
    seed = _synth_lowrank(spark, n=120, d=d, rank=3)
    b1 = _synth_lowrank(spark, n=160, d=d, rank=3).filter(
        F.col("vec_id") >= 120
    )
    b2 = _synth_lowrank(spark, n=200, d=d, rank=3).filter(
        F.col("vec_id") >= 160
    )

    base = str(tmp_path / "opqm")
    mnt = OpqIndexMaintainer(spark, base)
    with pytest.raises(ValueError, match="not bootstrapped"):
        mnt.topk(seed.limit(1))
    mnt.bootstrap(seed, dim=d, m=m, sub_dim=sub, ksub=ksub)
    with pytest.raises(ValueError, match="already bootstrapped"):
        mnt.bootstrap(seed, dim=d, m=m, sub_dim=sub, ksub=ksub)
    mnt.merge_batch(b1, batch_id=0)
    mnt.merge_batch(b2, batch_id=1)
    mnt.merge_batch(b1, batch_id=0)  # redelivery no-op
    queries = seed.filter(F.col("vec_id") < 5)
    got = sorted(tuple(r) for r in mnt.topk(queries, k=4).collect())

    # one-shot frozen-model encode over the union
    ix = P.load_opq_index(spark, f"{base}/artifact")
    union = seed.unionByName(b1).unionByName(b2)
    rot_all = P.pca_project_batch(
        union, ix["model"], r=m * sub, out_col="embedding"
    )
    codes_all = pq_encode(rot_all, ix["codebooks"], m, sub)
    rot_q = P.pca_project_batch(
        queries, ix["model"], r=m * sub, out_col="embedding"
    )
    want = sorted(
        tuple(r)
        for r in pq_adc_topk(
            rot_q, rot_q, k=4, m=m, sub_dim=sub, ksub=ksub,
            index=(ix["codebooks"], codes_all),
        ).collect()
    )
    assert got == want and len(got) == 20

    # compact: identical serving, batch dirs folded away
    mnt.compact()
    assert sorted(tuple(r) for r in mnt.topk(queries, k=4).collect()) == want
    assert not os.path.isdir(os.path.join(base, "codes_inc", "b0"))
    # tick after compact still serves exactly
    b3 = _synth_lowrank(spark, n=230, d=d, rank=3).filter(
        F.col("vec_id") >= 200
    )
    mnt.merge_batch(b3, batch_id=2)
    m2 = OpqIndexMaintainer(spark, base)  # fresh handle recovers
    got3 = sorted(tuple(r) for r in m2.topk(queries, k=4).collect())
    rot_all3 = P.pca_project_batch(
        union.unionByName(b3), ix["model"], r=m * sub, out_col="embedding"
    )
    codes3 = pq_encode(rot_all3, ix["codebooks"], m, sub)
    want3 = sorted(
        tuple(r)
        for r in pq_adc_topk(
            rot_q, rot_q, k=4, m=m, sub_dim=sub, ksub=ksub,
            index=(ix["codebooks"], codes3),
        ).collect()
    )
    assert got3 == want3

    # orphaned artifact without pointer fails loudly
    os.remove(os.path.join(base, "_CURRENT"))
    with pytest.raises(ValueError, match="no _CURRENT pointer"):
        OpqIndexMaintainer(spark, base)


# ---------------------------------------------------------------------------
# VERDICT r10 #8 (stretch): Avro source/sink seam (env-gated)
# ---------------------------------------------------------------------------
def test_avro_seam(spark, tmp_path):
    """With the external spark-avro jar absent, the seam raises the
    loud deploy-instruction gate (the Delta/Iceberg pattern); with it
    present, a schema'd round-trip is lossless — the same test flips
    to e2e the moment the jar is deployed."""
    from _data_engineering_pipeline_project_spark.sources.formats import (
        avro_available,
        read_avro,
        write_avro,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
    )
    path = str(tmp_path / "avro")
    if not avro_available(spark):
        with pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(df, path)
        with pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, path)
        return
    write_avro(df, path)
    back = read_avro(spark, path, "id long, s string, v double")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


# ---------------------------------------------------------------------------
# VERDICT r10 #7: adversarial sweep over artifact LOAD paths
# ---------------------------------------------------------------------------
def test_hostile_artifacts_fail_loudly(spark, tmp_path):
    """Hostile-ARTIFACT discipline (the data-side sweep's sibling):
    truncated/missing/foreign params or state must raise specific
    errors, never load as silently-wrong serving state.
    (a) PQ index: missing params dir; garbage params row.
    (b) PCA model: truncated (missing component row); width mismatch.
    (c) BM25 index: missing params; foreign params row.
    (d) BM25 maintainer: committed meta_v dirs with a lost pointer.
    (e) bloom artifacts: mixed-geometry merge."""
    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        load_bm25_index,
        save_bm25_index,
    )
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        load_pq_index,
    )

    # (a) PQ: params missing entirely
    pq_dir = str(tmp_path / "pq")
    spark.range(3).write.parquet(f"{pq_dir}/codebooks")
    with pytest.raises(ValueError, match="not a PQ index artifact"):
        load_pq_index(spark, pq_dir)
    # garbage params row (wrong shape)
    spark.createDataFrame([(0, "x")], "m int, junk string").write.mode(
        "overwrite"
    ).parquet(f"{pq_dir}/params")
    with pytest.raises(ValueError, match="not a PQ index artifact"):
        load_pq_index(spark, pq_dir)

    # (b) PCA: truncated artifact — drop a middle component row
    df = _synth_lowrank(spark, n=60, d=8, rank=2)
    model = P.pca_fit(df, dim=8)
    good = str(tmp_path / "pca_good")
    P.save_pca_model(spark, model, good)
    bad = str(tmp_path / "pca_bad")
    spark.read.parquet(good).filter(
        ~((F.col("kind") == "comp") & (F.col("idx") == 3))
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="not contiguous"):
        P.load_pca_model(spark, bad)
    # width mismatch: a component row from a different-dim model
    bad2 = str(tmp_path / "pca_bad2")
    spark.read.parquet(good).filter(
        ~((F.col("kind") == "comp") & (F.col("idx") == 3))
    ).unionByName(
        spark.createDataFrame(
            [("comp", 3, [1.0, 2.0])], "kind string, idx int, vals array<double>"
        )
    ).write.parquet(bad2)
    with pytest.raises(ValueError, match="widths disagree"):
        P.load_pca_model(spark, bad2)

    # (c) BM25: params missing / foreign
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    bm_dir = str(tmp_path / "bm25")
    save_bm25_index(docs, bm_dir, id_col="doc_id", text_col="text")
    assert load_bm25_index(spark, bm_dir)["params"]["id_col"] == "doc_id"
    import shutil

    shutil.rmtree(f"{bm_dir}/params")
    with pytest.raises(ValueError, match="not a BM25 index artifact"):
        load_bm25_index(spark, bm_dir)
    spark.createDataFrame(
        [("doc_id", "text", "some-other-format")],
        "id_col string, text_col string, format string",
    ).coalesce(1).write.parquet(f"{bm_dir}/params")
    with pytest.raises(ValueError, match="not a BM25 index artifact"):
        load_bm25_index(spark, bm_dir)

    # (e) bloom: mixed-geometry artifact merge
    ka = _keys_df(spark, ["a", "b"])
    pa, pb = str(tmp_path / "bl_a"), str(tmp_path / "bl_b")
    M.save_bloom_index(ka, F.col("k"), pa, m_bits=1 << 12, k=3)
    M.save_bloom_index(ka, F.col("k"), pb, m_bits=1 << 13, k=3)
    ia, ib = M.load_bloom_index(spark, pa), M.load_bloom_index(spark, pb)
    with pytest.raises(ValueError, match="geometry mismatch"):
        M.bloom_merge_indexes(ia, ib)
    merged = M.bloom_merge_indexes(ia, M.load_bloom_index(spark, pa))
    out = M.bloom_probe_index(merged, ka, F.col("k")).collect()
    assert all(r["bloom_member"] for r in out)


def test_bm25_maintainer_orphaned_meta_fails_loudly(spark, tmp_path):
    """(d) A Bm25Maintainer base_dir holding committed meta_v dirs but
    no _CURRENT pointer cannot be silently re-adopted (the batch
    ordering lives only in the pointer): re-opening must raise, not
    restart the index from version 0 over live state."""
    import os

    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    base = str(tmp_path / "bm25m")
    m = Bm25Maintainer(spark, base, id_col="doc_id", text_col="text")
    m.merge_batch(
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
        ),
        batch_id=0,
    )
    assert m.version == 1
    os.remove(os.path.join(base, "_CURRENT"))
    with pytest.raises(ValueError, match="no _CURRENT pointer"):
        Bm25Maintainer(spark, base, id_col="doc_id", text_col="text")


def test_opq_index_artifact_serves_identically(spark, tmp_path):
    """save_opq_index → fresh load → opq_topk_from_index returns the
    EXACT rows of the in-session pipeline (same rotation bits, same
    codes) — the train-once/serve-anywhere form of the registered
    query."""
    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_adc_topk,
    )

    d, m, sub, ksub = 16, 4, 2, 8
    df = _synth_lowrank(spark, n=150, d=d, rank=3)
    path = str(tmp_path / "opq_index")
    P.save_opq_index(df, path, dim=d, m=m, sub_dim=sub, ksub=ksub)

    # in-session pipeline (same construction the artifact froze)
    model = P.opq_allocate(P.pca_fit(df, dim=d, method="gram"), m, sub)
    rot = P.pca_project_batch(df, model, r=m * sub, out_col="embedding")
    want = {
        tuple(r)
        for r in pq_adc_topk(
            rot, rot.filter(F.col("vec_id") < 5), k=3, m=m,
            sub_dim=sub, ksub=ksub,
        ).collect()
    }

    idx = P.load_opq_index(spark, path)
    got = {
        tuple(r)
        for r in P.opq_topk_from_index(
            idx, df.filter(F.col("vec_id") < 5), k=3
        ).collect()
    }
    assert got == want and len(got) == 15


def test_opq_oracle_resolver_matches_spark_model(spark):
    """The deferred oracle's independently-derived model (DuckDB exact
    covariance/mean + numpy eigh + opq_allocate) equals the Spark
    pipeline's ``pca_fit(method='gram')`` → ``opq_allocate`` model
    BIT-FOR-BIT at the compare scale — the property the whole
    rotation-as-literals oracle design rests on."""
    from _data_engineering_pipeline_project_spark.operators.pca import (
        opq_allocate,
        pca_fit,
    )
    from _data_engineering_pipeline_project_spark.queries_ext11 import (
        _OPQ_M,
        _OPQ_SD,
        _ORACLE_SF_DIR,
        opq_model_duckdb,
    )
    from _data_engineering_pipeline_project_spark.catalog import table

    duck = opq_model_duckdb(f"{_ORACLE_SF_DIR}/embeddings.parquet")
    sparkm = opq_allocate(
        pca_fit(
            table(spark, _ORACLE_SF_DIR, "embeddings"),
            dim=64,
            method="gram",
        ),
        _OPQ_M,
        _OPQ_SD,
    )
    assert duck["mean"] == sparkm["mean"]
    assert duck["eigenvalues"] == sparkm["eigenvalues"]
    assert duck["components"] == sparkm["components"]
    assert duck["opq_permutation"] == sparkm["opq_permutation"]
