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
