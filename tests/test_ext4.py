"""Property tests for the round-3 governance/modeling layer
(queries_ext4): expectation suites, unigram-LM scoring, OLS trend,
Pareto skyline, Kaplan-Meier, triangles, golden records, attribution,
HLL sketch rollups. Oracle hash-parity is the driver's job; these pin
the SEMANTICS on data where the right answer is computable
independently (brute force or closed form)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# expectations: one-scan suite
# --------------------------------------------------------------------------
def test_expectations_catch_injected_violations(spark):
    from _data_engineering_pipeline_project_spark.operators import expectations as E

    df = spark.createDataFrame(
        [
            Row(id=1, status="OK", price=10.0),
            Row(id=2, status="BAD", price=-5.0),
            Row(id=2, status="OK", price=None),
            Row(id=None, status="OK", price=1.0),
        ]
    )
    out = {
        r["expectation"]: (r["n_violations"], r["passed"])
        for r in E.run_expectations(
            df,
            [
                E.not_null("id_not_null", "id"),
                E.unique("id_unique", "id"),
                E.in_set("status_ok", "status", ["OK"]),
                E.positive("price_positive", "price"),
            ],
        ).collect()
    }
    assert out["id_not_null"] == (1, False)
    # 4 rows - 3 distinct non-null... countDistinct skips the NULL id:
    # 4 - distinct{1,2} = 2 duplicates flagged (NULL handled by not_null)
    assert out["id_unique"] == (2, False)
    assert out["status_ok"] == (1, False)
    # NULL price -> CASE not counted; only the -5.0 row violates
    assert out["price_positive"] == (1, False)


def test_expectations_single_scan_plan(spark):
    """The whole suite must compile to ONE aggregate over ONE scan —
    adding expectations must not add jobs/scans."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    plan = Q.expectations_suite_orders(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_expectations_pass_on_clean_orders(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    rows = Q.expectations_suite_orders(spark, SF).collect()
    assert len(rows) == 7
    assert all(r["n_rows"] > 0 for r in rows)
    by = {r["expectation"]: r for r in rows}
    assert by["pk_not_null"]["passed"]
    assert by["status_in_set"]["passed"]
    # passed must agree with the violation count on every row
    assert all((r["n_violations"] == 0) == r["passed"] for r in rows)


# --------------------------------------------------------------------------
# unigram LM quality
# --------------------------------------------------------------------------
def test_unigram_lm_scores_match_reference(spark):
    """Spark fixed-point NLL == pure-Python add-1 unigram LM on the
    same sf0.001 corpus (exact to the rounding contract)."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_per_token"])
        for r in Q.unigram_lm_quality_documents(spark, SF).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    toks = {d: [t for t in txt.strip().lower().split() if t] for d, txt in docs.items()}
    from collections import Counter

    vocab = Counter(t for ts in toks.values() for t in ts)
    total, v = sum(vocab.values()), len(vocab)
    lp_fp = {
        t: math.floor(math.log((c + 1) / float(total + v)) * 1_000_000)
        for t, c in vocab.items()
    }
    for d, ts in toks.items():
        if not ts:
            assert d not in got
            continue
        # Spark rounds HALF_UP, Python round() half-even — compare the
        # UNROUNDED reference within the 6-dp rounding envelope instead
        nll = -sum(lp_fp[t] for t in ts) / (1_000_000.0 * len(ts))
        assert got[d][0] == len(ts), d
        assert got[d][1] == pytest.approx(nll, abs=6e-7), d


# --------------------------------------------------------------------------
# OLS trend
# --------------------------------------------------------------------------
def test_ols_trend_matches_closed_form(spark):
    """Slope/intercept/R² agree with the numpy least-squares fit per
    series (to the 1e-6 rounding contract)."""
    np = pytest.importorskip("numpy")
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    out = {r["event_type"]: r for r in Q.ols_trend_events_daily(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    day0 = min(r["day"] for r in ev)
    series: dict = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append(
            ((r["day"] - day0).days, r["count"])
        )
    for et, pts in series.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        if len(pts) < 2 or x.std() == 0:
            continue
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = out[et]
        assert row["n_days"] == len(pts)
        assert row["slope"] == pytest.approx(slope, abs=2e-6)
        assert row["intercept"] == pytest.approx(intercept, abs=2e-6)
        if y.std() > 0:
            assert row["r2"] == pytest.approx(r * r, abs=2e-6)


# --------------------------------------------------------------------------
# Pareto skyline
# --------------------------------------------------------------------------
def test_pareto_frontier_equals_bruteforce(spark):
    """Sort-based skyline == O(n²) dominance definition, including
    duplicate/tie handling, on randomized points."""
    import random

    from _data_engineering_pipeline_project_spark.operators.skyline import (
        pareto_frontier_min_max,
    )

    rng = random.Random(7)
    pts = [
        Row(pid=i, x=float(rng.randint(0, 20)), y=rng.randint(0, 15))
        for i in range(200)
    ]
    df = spark.createDataFrame(pts)
    got = sorted(r["pid"] for r in pareto_frontier_min_max(df, "x", "y").collect())

    def dominated(a):
        return any(
            b.x <= a.x and b.y >= a.y and (b.x < a.x or b.y > a.y) for b in pts
        )

    want = sorted(p.pid for p in pts if not dominated(p))
    assert got == want and len(got) > 0


def test_pareto_frontier_no_cartesian(spark):
    """No unbroadcast cartesian between data relations. The bucketed
    two-pass inside the frontier legitimately contributes two
    BroadcastNestedLoopJoins — the 1-row key-envelope crossJoin and the
    ≤buckets²-pair totals stitch (the repo's documented single-row /
    bucket-envelope broadcast pattern) — so the pin is: every BNLJ in
    the plan is a Cross over a BROADCAST side, and no CartesianProduct
    (the unbounded shuffle form) appears at all."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    plan = Q.pareto_frontier_parts(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight" in line or "BuildLeft" in line, line


# --------------------------------------------------------------------------
# Kaplan-Meier
# --------------------------------------------------------------------------
def test_kaplan_meier_curve_properties(spark):
    """Survival starts ≤ 1, is non-increasing, and n_risk telescopes
    exactly by the per-time (converted + censored) counts."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    rows = sorted(
        Q.kaplan_meier_conversion_events(spark, SF).collect(),
        key=lambda r: r["t_hours"],
    )
    assert rows
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    )
    assert rows[0]["n_risk"] == n_users
    prev_s, prev = 1.0 + 1e-9, None
    for r in rows:
        if prev is not None:
            assert r["n_risk"] == prev["n_risk"] - prev["n_converted"] - prev["n_censored"]
        assert 0.0 <= r["survival"] <= prev_s + 1e-9
        prev_s, prev = r["survival"], r
    # KM closed form on a tiny hand case: at each event time the factor
    # is (n-d)/n — recompute survival independently from the output rows
    s = 1.0
    for r in rows:
        if r["n_converted"]:
            s *= (r["n_risk"] - r["n_converted"]) / r["n_risk"]
        assert r["survival"] == pytest.approx(s, abs=5e-6)


# --------------------------------------------------------------------------
# triangles
# --------------------------------------------------------------------------
def test_triangle_count_bruteforce_small(spark):
    """K4 + a pendant edge: 4 triangles, clustering coeff checked
    against the hand-computed wedge count."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    import _data_engineering_pipeline_project_spark.queries_ext4 as q4
    from _data_engineering_pipeline_project_spark.catalog import table as _table
    import os
    import tempfile

    # K4 on parts {1,2,3,4} via order 100 (4 lines), pendant 4-5 via order 200
    li = spark.createDataFrame(
        [Row(l_orderkey=100, l_partkey=p) for p in (1, 2, 3, 4)]
        + [Row(l_orderkey=200, l_partkey=p) for p in (4, 5)]
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = Q.triangle_count_copurchase(spark, d).collect()[0]
    assert out["n_nodes"] == 5
    assert out["n_edges"] == 7  # C(4,2)=6 + 1 pendant
    assert out["n_triangles"] == 4  # C(4,3)
    # degrees: 3,3,3,4,1 -> sum d(d-1) = 6+6+6+12+0 = 30; coeff = 6*4/30
    assert out["clustering_coeff"] == pytest.approx(24 / 30, abs=1e-9)


def test_triangle_hyper_basket_capped(spark):
    """VERDICT r7 #2: a planted mega-basket (2,000 parts in one order —
    4M pairs if exploded) must be dropped by the fused width cap before
    the |basket|² expansion, leaving only the clean K3 order's graph.
    The cap fires on ROW count per order, mirroring the oracle's
    HAVING count(*) <= cap."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    import os
    import tempfile

    assert Q._TRIANGLE_MAX_BASKET < 2000  # the planted order must exceed it
    li = spark.createDataFrame(
        [Row(l_orderkey=100, l_partkey=p) for p in (1, 2, 3)]  # K3
        + [Row(l_orderkey=900, l_partkey=p) for p in range(1000, 3000)]
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = Q.triangle_count_copurchase(spark, d).collect()[0]
    # the hyper order contributes no edges OR nodes; K3 survives intact
    assert out["n_nodes"] == 3
    assert out["n_edges"] == 3
    assert out["n_triangles"] == 1
    assert out["clustering_coeff"] == pytest.approx(1.0, abs=1e-9)


# --------------------------------------------------------------------------
# golden record
# --------------------------------------------------------------------------
def test_golden_record_matches_pandas(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    got = {r["user_id"]: r for r in Q.golden_record_users(spark, SF).collect()}
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    byu: dict = {}
    for r in ev:
        byu.setdefault(r["user_id"], []).append(r)
    assert set(got) == set(byu)
    for uid, rows in byu.items():
        g = got[uid]
        assert g["n_events"] == len(rows)
        assert g["first_seen"] == rows[0]["ts"] and g["last_seen"] == rows[-1]["ts"]
        nn = [r for r in rows if r["value"] is not None]
        if nn:
            assert g["last_value"] == pytest.approx(round(nn[-1]["value"], 4))
        from collections import Counter

        c = Counter(r["event_type"] for r in rows)
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert g["top_event_type"] == best


# --------------------------------------------------------------------------
# attribution
# --------------------------------------------------------------------------
def test_attribution_credit_conserved(spark):
    """Total credit across channels == number of conversions that had
    ≥1 preceding touch (each such conversion distributes exactly 1.0)."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    rows = Q.position_attribution_events(spark, SF).collect()
    assert {r["channel"] for r in rows} <= {"view", "click", "signup"}
    total_credit = sum(r["credit"] for r in rows)
    # recompute touched conversions independently
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    byu: dict = {}
    for r in ev:
        byu.setdefault(r["user_id"], []).append(r)
    touched = set()
    for uid, rs in byu.items():
        pc = 0
        total_p = sum(1 for r in rs if r["event_type"] == "purchase")
        for r in rs:
            if r["event_type"] == "purchase":
                pc += 1
            elif r["event_type"] in ("view", "click", "signup") and pc < total_p:
                touched.add((uid, pc + 1))
    assert total_credit == pytest.approx(len(touched), abs=0.01)


def test_attribution_unit_path(spark):
    """Hand case: v,c,v,purchase → k=3: 0.4/0.2/0.4 by position."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    import os
    import tempfile
    from datetime import datetime

    rows = [
        Row(event_id=i, ts=datetime(2024, 1, 1, 0, i), user_id=1, event_type=t,
            value=1.0, props="{}")
        for i, t in enumerate(["view", "click", "view", "purchase"])
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["channel"]: r for r in Q.position_attribution_events(spark, d).collect()}
    assert out["view"]["credit"] == pytest.approx(0.8)  # first 0.4 + last 0.4
    assert out["click"]["credit"] == pytest.approx(0.2)
    assert out["view"]["n_touches"] == 2 and out["click"]["n_touches"] == 1


# --------------------------------------------------------------------------
# HLL sketches
# --------------------------------------------------------------------------
def test_hll_estimate_within_error_envelope(spark):
    """Merged-sketch estimate within 5% of exact (default lgK=12 HLL
    has ~1.6% RSE; 5% is > 3 sigma)."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    for r in Q.hll_distinct_users_per_type(spark, SF).collect():
        assert abs(r["n_approx"] - r["n_exact"]) <= max(2, 0.05 * r["n_exact"]), r


# --------------------------------------------------------------------------
# KS / Mann-Whitney / RFM / Gini
# --------------------------------------------------------------------------
def _clicks_errors(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    a = sorted(round(r["value"], 4) for r in rows
               if r["event_type"] == "click" and r["value"] is not None)
    b = sorted(round(r["value"], 4) for r in rows
               if r["event_type"] == "error" and r["value"] is not None)
    return a, b


def test_ks_matches_python_reference(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    out = Q.ks_two_sample_events(spark, SF).collect()[0]
    a, b = _clicks_errors(spark)
    assert (out["n1"], out["n2"]) == (len(a), len(b))
    grid = sorted(set(a) | set(b))
    import bisect

    dmax = max(
        abs(bisect.bisect_right(a, v) * len(b) - bisect.bisect_right(b, v) * len(a))
        for v in grid
    )
    assert out["ks_stat"] == pytest.approx(dmax / (len(a) * len(b)), abs=1e-6)
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert out["crit_05"] == pytest.approx(crit, abs=1e-6)
    assert out["reject_h0"] == (out["ks_stat"] > out["crit_05"])


def test_mann_whitney_matches_python_reference(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    from collections import Counter

    out = Q.mann_whitney_events(spark, SF).collect()[0]
    a, b = _clicks_errors(spark)
    n1, n2, nn = len(a), len(b), len(a) + len(b)
    cnt = Counter(a + b)
    c1 = Counter(a)
    before, r1, tie3 = 0, 0.0, 0
    for v in sorted(cnt):
        t = cnt[v]
        avg_rank = before + (t + 1) / 2.0
        r1 += c1.get(v, 0) * avg_rank
        tie3 += t * t * t - t
        before += t
    u1 = r1 - n1 * (n1 + 1) / 2.0
    sigma = math.sqrt((n1 * n2 / 12.0) * ((nn + 1) - tie3 / (nn * (nn - 1))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    assert (out["n1"], out["n2"]) == (n1, n2)
    assert out["u1"] == pytest.approx(u1, abs=1e-9)
    assert out["z"] == pytest.approx(z, abs=1e-4)


def test_rfm_scores_valid_and_monetary_exact(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    rows = Q.rfm_segmentation_events(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    purch: dict = {}
    for r in ev:
        if r["event_type"] == "purchase" and r["value"] is not None:
            purch.setdefault(r["user_id"], []).append(r)
    assert {r["user_id"] for r in rows} == set(purch)
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
        assert r["rfm"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
        mine = purch[r["user_id"]]
        assert r["frequency"] == len(mine)
        cents = sum(round(x["value"] * 100) for x in mine)
        assert r["monetary"] == pytest.approx(cents / 100.0, abs=1e-9)
    # quintiles are balanced: each score bucket within ±1 of n/5
    from collections import Counter

    n = len(rows)
    for key in ("r_score", "f_score", "m_score"):
        c = Counter(r[key] for r in rows)
        assert all(abs(c.get(s, 0) - n / 5) <= 1 for s in range(1, 6)), (key, c)


def test_gini_matches_python_reference(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    out = {r["c_mktsegment"]: r for r in Q.gini_revenue_by_segment(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    agg: dict = {}
    for o in orders:
        seg = cust.get(o["o_custkey"])
        if seg is None:
            continue
        key = (seg, o["o_custkey"])
        agg[key] = agg.get(key, 0) + round(o["o_totalprice"] * 100)
    segs: dict = {}
    for (seg, _), x in agg.items():
        segs.setdefault(seg, []).append(x)
    for seg, xs in segs.items():
        xs.sort()
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * six - (n + 1) * sx) / (n * sx)
        row = out[seg]
        assert row["n_customers"] == n
        assert row["total_revenue"] == pytest.approx(sx / 100.0, abs=1e-6)
        assert row["gini"] == pytest.approx(gini, abs=1e-6)
        assert 0.0 <= row["gini"] < 1.0


# --------------------------------------------------------------------------
# prefix-filter similarity join / KL mixture drift
# --------------------------------------------------------------------------
def test_prefix_filter_join_is_exact_vs_bruteforce(spark):
    """The prefix principle guarantees NO false negatives and the
    verify stage no false positives: result == brute-force all-pairs
    Jaccard >= 0.8 on the sf0.001 corpus."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in Q.prefix_filter_jaccard_pairs(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sets = {
        r["doc_id"]: frozenset(t for t in r["text"].strip().lower().split() if t)
        for r in docs
    }
    ids = sorted(i for i, s in sets.items() if s)
    want = {}
    for i_idx, a in enumerate(ids):
        for b in ids[i_idx + 1:]:
            common = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 9 * common >= 4 * (len(sets[a]) + len(sets[b])):
                want[(a, b)] = common / union
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6), k


def test_kl_mixture_matches_python_reference(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    from collections import Counter

    out = {r["source"]: r for r in Q.kl_mixture_drift_sources(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cells = Counter((r["source"], r["lang"]) for r in docs)
    c_s = Counter(r["source"] for r in docs)
    c_l = Counter(r["lang"] for r in docs)
    tot = len(docs)
    for src in c_s:
        kl = ent = 0.0
        for (s, lang), c in cells.items():
            if s != src:
                continue
            p = c / c_s[src]
            q = c_l[lang] / tot
            kl += p * math.log(p / q)
            ent -= p * math.log(p)
        row = out[src]
        assert row["n_docs"] == c_s[src]
        assert row["kl_vs_corpus"] == pytest.approx(kl, abs=5e-6)
        assert row["lang_entropy"] == pytest.approx(ent, abs=5e-6)
        assert row["kl_vs_corpus"] >= -1e-9  # Gibbs: KL is non-negative


# --------------------------------------------------------------------------
# variant + observe-on-write
# --------------------------------------------------------------------------
def test_variant_matches_get_json_object_path(spark):
    """VARIANT extraction agrees with the classic get_json_object twin
    on every group."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    from _data_engineering_pipeline_project_spark import queries_ops as QO

    v = {r["event_type"]: (r["sum_k"], r["n"])
         for r in Q.variant_props_events(spark, SF).collect()}
    j = {r["event_type"]: (r["sum_k"], r["n"])
         for r in QO.json_extract_events(spark, SF).collect()}
    assert v == j


def test_write_with_metrics_single_pass(spark, tmp_path):
    """Observed metrics equal a direct aggregate, and the data lands."""
    from _data_engineering_pipeline_project_spark.sources.sinks import (
        write_with_metrics,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "ev_out")
    m = write_with_metrics(
        ev,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_value": F.sum(F.col("value").isNull().cast("bigint")),
            # DISTINCT aggs are rejected in observed metrics; the
            # sanctioned cardinality metric is the mergeable HLL
            "n_users_approx": F.approx_count_distinct("user_id"),
        },
    )
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("n_null_value"),
        F.countDistinct("user_id").alias("n_users"),
    ).collect()[0]
    assert m["n_rows"] == direct["n_rows"]
    assert (m["n_null_value"] or 0) == (direct["n_null_value"] or 0)
    assert abs(m["n_users_approx"] - direct["n_users"]) <= max(
        2, 0.05 * direct["n_users"]
    )
    assert spark.read.parquet(out).count() == m["n_rows"]


# --------------------------------------------------------------------------
# CDC apply / EWMA fold
# --------------------------------------------------------------------------
def test_cdc_apply_out_of_order_and_replay(spark):
    """Sequence ordering (not arrival order) decides; exact replays of
    the same (key, seq) collapse; delete-last keys vanish; a late
    update arriving AFTER the delete (higher seq) resurrects the key."""
    from _data_engineering_pipeline_project_spark.operators.cdc import (
        apply_changelog,
    )

    rows = [
        # key 1: I(1), U(2) delivered out of order
        Row(k=1, v="b", seq=2, op="U"),
        Row(k=1, v="a", seq=1, op="I"),
        # key 2: I then D -> gone
        Row(k=2, v="x", seq=1, op="I"),
        Row(k=2, v="x", seq=2, op="D"),
        # key 3: replayed insert (same seq twice)
        Row(k=3, v="r", seq=1, op="I"),
        Row(k=3, v="r", seq=1, op="I"),
        # key 4: D then late U with higher seq -> resurrected
        Row(k=4, v="old", seq=1, op="I"),
        Row(k=4, v=None, seq=2, op="D"),
        Row(k=4, v="new", seq=3, op="U"),
    ]
    snap = {
        r["k"]: (r["v"], r["seq"])
        for r in apply_changelog(
            spark.createDataFrame(rows), ["k"], ["seq"]
        ).collect()
    }
    assert snap == {1: ("b", 2), 3: ("r", 1), 4: ("new", 3)}


def test_cdc_query_matches_manual_apply(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    import hashlib

    got = {r["o_orderkey"]: r for r in Q.cdc_apply_orders_changelog(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    for o in orders:
        hb = int(hashlib.md5(str(o["o_orderkey"]).encode()).hexdigest()[:2], 16)
        k = o["o_orderkey"]
        if hb % 5 == 0:
            assert k not in got  # delete wins at seq 3
        elif hb % 3 == 0:
            assert got[k]["version"] == 2 and got[k]["last_op"] == "U"
            assert got[k]["o_totalprice"] == pytest.approx(
                round(o["o_totalprice"] + 10.0, 2)
            )
        else:
            assert got[k]["version"] == 1 and got[k]["last_op"] == "I"
            assert got[k]["o_totalprice"] == o["o_totalprice"]


def test_ewma_matches_python_fold(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    out = {r["event_type"]: r for r in Q.ewma_daily_counts_events(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    series: dict = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append((r["day"], float(r["count"])))
    for et, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        s = ys[0]
        for x in ys[1:]:
            s = (s + x) / 2.0  # exact halving, same IEEE ops as both engines
        row = out[et]
        assert row["n_days"] == len(ys)
        assert row["ewma"] == pytest.approx(s, abs=1e-6)
        assert row["last_minus_ewma"] == pytest.approx(ys[-1] - s, abs=1e-6)


# --------------------------------------------------------------------------
# PQ ANN
# --------------------------------------------------------------------------
def test_pq_codes_shape_and_recall(spark):
    """Every corpus vector encodes to exactly m=4 codes in 1..8, and
    PQ-ADC top-5 overlaps the exact L2 top-5 (recall sanity — seed
    codebooks are coarse, so the bar is deliberately modest)."""
    np = pytest.importorskip("numpy")
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    from _data_engineering_pipeline_project_spark.queries_ext4 import (
        _PQ_K,
        _PQ_M,
        _PQ_SD,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb = pq_codebooks(emb, m=_PQ_M, sub_dim=_PQ_SD, ksub=_PQ_K)
    codes = pq_encode(emb, cb, m=_PQ_M, sub_dim=_PQ_SD).collect()
    n_vec = emb.count()
    assert len(codes) == _PQ_M * n_vec
    assert all(
        1 <= r["code"] <= _PQ_K and 0 <= r["subspace"] < _PQ_M for r in codes
    )

    got = pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        m=_PQ_M, sub_dim=_PQ_SD, ksub=_PQ_K,
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in emb.collect()
    }
    hits = tot = 0
    for qid, rows in by_q.items():
        assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == [1, 2, 3, 4, 5]
        # approx distances are non-decreasing with rank
        sr = sorted(rows, key=lambda r: r["rnk"])
        assert all(
            sr[i]["approx_d2"] <= sr[i + 1]["approx_d2"] + 1e-9
            for i in range(len(sr) - 1)
        )
        q = vecs[qid]
        exact = sorted(
            ((np.sum((v - q) ** 2), vid) for vid, v in vecs.items() if vid != qid)
        )[:5]
        exact_ids = {vid for _, vid in exact}
        hits += len(exact_ids & {r["neighbor_id"] for r in rows})
        tot += 5
    assert tot == 50
    assert hits / tot >= 0.5, f"PQ recall@5 collapsed: {hits}/{tot}"


def test_pq_index_save_load_roundtrip(spark, tmp_path):
    """The persisted PQ artifact must serve bit-identical results: save
    the index, load it back (pure parquet scans, no lineage to the
    corpus), and pq_adc_topk(index=...) must equal the fresh build.
    Params row pins the trained geometry."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        load_pq_index,
        pq_adc_topk,
        save_pq_index,
    )
    from _data_engineering_pipeline_project_spark.queries_ext4 import (
        _PQ_K,
        _PQ_M,
        _PQ_SD,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "pq_index")
    save_pq_index(emb, path, m=_PQ_M, sub_dim=_PQ_SD, ksub=_PQ_K)
    cb, codes, params = load_pq_index(spark, path)
    assert (params["m"], params["sub_dim"], params["ksub"]) == (
        _PQ_M, _PQ_SD, _PQ_K,
    )
    assert params["id_col"] == "vec_id" and params["vec_col"] == "embedding"

    fresh = pq_adc_topk(
        emb, qs, k=5, m=_PQ_M, sub_dim=_PQ_SD, ksub=_PQ_K
    ).collect()
    served = pq_adc_topk(
        emb, qs, k=5, m=params["m"], sub_dim=params["sub_dim"],
        index=(cb, codes),
    ).collect()
    assert sorted(
        [(r["query_id"], r["rnk"], r["neighbor_id"], r["approx_d2"]) for r in fresh]
    ) == sorted(
        [(r["query_id"], r["rnk"], r["neighbor_id"], r["approx_d2"]) for r in served]
    )


def test_profile_table_one_scan_and_values(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    df = Q.profile_events_table(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    got = {r["column"]: r for r in df.collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    assert got["event_id"]["n_distinct"] == len({r["event_id"] for r in ev})
    assert got["user_id"]["min_num"] == float(min(r["user_id"] for r in ev))
    assert got["value"]["max_num"] == pytest.approx(
        max(r["value"] for r in ev if r["value"] is not None)
    )
    assert got["ts"]["min_ts"] == min(r["ts"] for r in ev)
    assert got["event_type"]["n_distinct"] == len({r["event_type"] for r in ev})
    assert all(r["n_rows"] == len(ev) for r in got.values())


def test_ivfpq_subset_of_probed_lists_and_recall(spark):
    """IVFADC returns only candidates from probed IVF lists, ranks by
    the same ADC distance as plain PQ (agreement on shared candidates),
    and keeps nonzero recall vs exact L2."""
    np = pytest.importorskip("numpy")
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        ivfpq_topk,
    )
    from _data_engineering_pipeline_project_spark.queries_ext4 import (
        _PQ_K,
        _PQ_M,
        _PQ_SD,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        m=_PQ_M, sub_dim=_PQ_SD, ksub=_PQ_K,
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}
    hits = tot = 0
    for qid, rows in by_q.items():
        assert len(rows) == 5 and len({r["neighbor_id"] for r in rows}) == 5
        q = vecs[qid]
        exact = sorted(
            ((np.sum((v - q) ** 2), vid) for vid, v in vecs.items() if vid != qid)
        )[:5]
        hits += len({vid for _, vid in exact} & {r["neighbor_id"] for r in rows})
        tot += 5
    # nprobe=2 of 8 lists examines ~25% of the corpus; recall trades
    # against that candidate cut — sanity bar only
    assert hits / tot >= 0.15, f"IVFPQ recall collapsed: {hits}/{tot}"


def test_dp_noise_bounded_and_deterministic(spark):
    """Seeded Laplace noise: |noisy - true| follows from the md5 seed
    (recompute in Python); noise magnitude within ~b·ln(1/(2·tail))."""
    import hashlib

    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    rows = Q.dp_noisy_counts_events(spark, SF).collect()
    for r in rows:
        u = (
            int(hashlib.md5(r["event_type"].encode()).hexdigest()[:8], 16)
            / 4294967296.0
        ) - 0.5
        noise = -(-1.0 if u < 0 else 1.0) * 2.0 * math.log(1.0 - 2.0 * abs(u))
        assert r["noisy_count"] == round(r["true_count"] + noise), r
        assert abs(r["noisy_count"] - r["true_count"]) <= 50  # b=2 tail


def test_k_anonymity_matches_python(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    from collections import Counter

    out = Q.k_anonymity_audit_events(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    groups = Counter(
        (r["event_type"], r["ts"].date(), r["user_id"] % 10) for r in ev
    )
    sizes = list(groups.values())
    risky = sum(s for s in sizes if s < 5)
    assert out["n_groups"] == len(sizes)
    assert out["n_violating_groups"] == sum(1 for s in sizes if s < 5)
    assert out["n_risky_rows"] == risky
    assert out["k_actual"] == min(sizes)
    assert out["risky_row_ratio"] == pytest.approx(risky / len(ev), abs=1e-6)


# --------------------------------------------------------------------------
# Theil-Sen / ACF / item-item cosine
# --------------------------------------------------------------------------
def _daily_series(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    day0 = min(r["day"] for r in rows)
    out: dict = {}
    for r in rows:
        out.setdefault(r["event_type"], []).append(
            ((r["day"] - day0).days, r["count"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_theil_sen_matches_python(spark):
    import statistics

    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    out = {r["event_type"]: r for r in Q.theil_sen_trend_events(spark, SF).collect()}
    for et, pts in _daily_series(spark).items():
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
            if x2 > x1
        ]
        row = out[et]
        assert row["n_pairs"] == len(slopes)
        assert row["theil_sen_slope"] == pytest.approx(
            statistics.median(slopes), abs=1e-6
        )


def test_acf_matches_numpy(spark):
    np = pytest.importorskip("numpy")
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    out = {
        (r["event_type"], r["lag"]): r
        for r in Q.acf_daily_counts_events(spark, SF).collect()
    }
    for et, pts in _daily_series(spark).items():
        by_x = dict(pts)
        for lag in range(1, 8):
            y0 = [y for x, y in pts if x + lag in by_x]
            y1 = [by_x[x + lag] for x, y in pts if x + lag in by_x]
            if len(y0) < 2:
                continue
            row = out.get((et, lag))
            assert row is not None and row["n"] == len(y0)
            if np.std(y0) > 0 and np.std(y1) > 0:
                want = np.corrcoef(y0, y1)[0, 1]
                assert row["acf"] == pytest.approx(want, abs=2e-6), (et, lag)


def test_item_item_cosine_matches_python(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    got = Q.item_item_cosine_parts(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    ui = {(orders[r["l_orderkey"]], r["l_partkey"]) for r in li
          if r["l_orderkey"] in orders}
    from collections import Counter

    buyers = Counter(p for _, p in ui)
    by_cust: dict = {}
    for c, p in ui:
        by_cust.setdefault(c, set()).add(p)
    common = Counter()
    for c, parts in by_cust.items():
        ps = sorted(parts)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1:]:
                common[(pa, pb)] += 1
    scored = sorted(
        (
            (-round(n / math.sqrt(buyers[a] * buyers[b]), 6), a, b, n)
            for (a, b), n in common.items()
        )
    )[:20]
    want = [(a, b, n, -negc) for negc, a, b, n in scored]
    assert [(r["part_a"], r["part_b"], r["common"], r["cosine"]) for r in got] == [
        (a, b, n, pytest.approx(c, abs=1e-6)) for a, b, n, c in want
    ]


def test_readability_matches_python(spark):
    import re as _re

    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    got = {r["doc_id"]: r for r in Q.readability_documents(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    for d in docs:
        w = len(_re.findall(r"[A-Za-z0-9]+", d["text"]))
        if w == 0:
            assert d["doc_id"] not in got
            continue
        s = max(len(_re.findall(r"[.!?]+", d["text"])), 1)
        sy = max(len(_re.findall(r"[aeiouy]+", d["text"].lower())), 1)
        row = got[d["doc_id"]]
        assert (row["words"], row["sentences"], row["syllables"]) == (w, s, sy)
        assert row["flesch_score"] == pytest.approx(
            206.835 - 1.015 * (w / s) - 84.6 * (sy / w), abs=1e-4
        )


def test_quantile_normalization_properties(spark):
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q

    rows = Q.quantile_normalized_values_events(spark, SF).collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append(r)
    for g, rs in by_g.items():
        prs = [r["pr"] for r in rs]
        assert min(prs) == 0.0 and max(prs) == pytest.approx(1.0)
        # monotone: sorting by (value, event_id) sorts pr
        srt = sorted(rs, key=lambda r: (r["value"], r["event_id"]))
        assert all(
            srt[i]["pr"] <= srt[i + 1]["pr"] + 1e-12 for i in range(len(srt) - 1)
        )


def test_item_item_hyper_customer_capped(spark):
    """A planted bot customer with > _COPURCHASE_MAX_BASKET distinct
    parts must be dropped before the cust self-join (its pairs would be
    |basket|² noise); clean customers' cosines are unchanged."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    import os
    import tempfile

    cap = Q._COPURCHASE_MAX_BASKET
    # clean: customers 1 and 2 both buy parts {10, 11} -> one pair with
    # common=2, buyers 2/2, cosine 1.0. Bot customer 9 buys cap+100
    # distinct parts (incl. 10, 11 — would inflate their buyer counts).
    li = spark.createDataFrame(
        [Row(l_orderkey=1, l_partkey=p) for p in (10, 11)]
        + [Row(l_orderkey=2, l_partkey=p) for p in (10, 11)]
        + [Row(l_orderkey=9, l_partkey=p) for p in range(10, 10 + cap + 100)]
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=1), Row(o_orderkey=2, o_custkey=2),
         Row(o_orderkey=9, o_custkey=9)]
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        got = Q.item_item_cosine_parts(spark, d).collect()
    assert [(r["part_a"], r["part_b"], r["common"], r["cosine"])
            for r in got] == [(10, 11, 2, 1.0)]


def test_triangle_above_gate_shuffle_path_matches(spark):
    """The above-gate plan (no broadcast hints — the 100 TB path) must
    produce the identical count/coefficient as the broadcast plan.
    Forced by disabling autoBroadcastJoinThreshold, which drives the
    conf-derived edge gate to 0 (functions/gates.py)."""
    from _data_engineering_pipeline_project_spark import queries_ext4 as Q
    import os
    import tempfile

    li = spark.createDataFrame(
        [Row(l_orderkey=100, l_partkey=p) for p in (1, 2, 3, 4)]
        + [Row(l_orderkey=200, l_partkey=p) for p in (4, 5)]
    )
    key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(key)
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        try:
            spark.conf.set(key, "-1")
            out = Q.triangle_count_copurchase(spark, d).collect()[0]
        finally:
            spark.conf.set(key, saved)
    assert (out["n_nodes"], out["n_edges"], out["n_triangles"]) == (5, 7, 4)
    assert out["clustering_coeff"] == pytest.approx(24 / 30, abs=1e-9)
