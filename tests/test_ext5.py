"""Semantics tests for the round-3 wave-2 queries (queries_ext5):
duplicate-span removal, naive-Bayes classification, snapshot
reconciliation, windowed funnel, activity islands. Oracle hash-parity is
the driver's job; these pin behavior on hand-built data where the right
answer is known by construction."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# remove_duplicate_spans
# --------------------------------------------------------------------------
def _spans(spark, rows, k=3):
    from _data_engineering_pipeline_project_spark.operators.curation import (
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    return {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(docs, k=k).collect()
    }


def test_dup_span_removed_from_second_doc_only(spark):
    out = _spans(
        spark,
        [(1, "a b c d e"), (2, "x a b c y")],
        k=3,
    )
    # "a b c" occurs in both docs; doc 1 (first occurrence) keeps it,
    # doc 2 loses exactly those 3 tokens.
    assert out[1]["text_clean"] == "a b c d e"
    assert out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "x y"
    assert out[2]["n_removed"] == 3
    assert out[2]["n_tokens"] == 5


def test_dup_span_within_one_doc(spark):
    out = _spans(spark, [(1, "p q r z p q r")], k=3)
    # second occurrence of "p q r" removed, first kept.
    assert out[1]["text_clean"] == "p q r z"
    assert out[1]["n_removed"] == 3


def test_overlapping_dup_spans_union_coverage(spark):
    # doc2 repeats a 4-token run; with k=3 two overlapping grams dup,
    # coverage is the UNION of their spans (4 tokens), not 6.
    out = _spans(spark, [(1, "a b c d"), (2, "u a b c d w")], k=3)
    assert out[2]["text_clean"] == "u w"
    assert out[2]["n_removed"] == 4


def test_short_and_empty_docs_pass_through(spark):
    out = _spans(spark, [(1, "a b"), (2, "   ")], k=3)
    assert out[1]["text_clean"] == "a b"
    assert out[1]["n_tokens"] == 2
    assert out[2]["text_clean"] == ""
    assert out[2]["n_tokens"] == 0
    assert out[2]["n_removed"] == 0


def test_span_first_occurrence_is_global_min_by_key(spark):
    # first occurrence = smallest (doc_id, start): doc 1 keeps even when
    # the duplicate appears earlier WITHIN doc 2's text.
    out = _spans(spark, [(1, "z z a b c"), (2, "a b c q r")], k=3)
    assert out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "q r"


# --------------------------------------------------------------------------
# naive bayes
# --------------------------------------------------------------------------
def test_naive_bayes_separable_vocab_perfect_confusion_diagonal(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # Two languages with disjoint vocabularies; every 5th doc held out.
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        text = "foo bar baz" if lang == "aa" else "uno dos tres"
        rows.append(Row(doc_id=i, text=text, lang=lang, source="s", n_chars=9))
    docs = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        out = {
            (r["lang_actual"], r["lang_pred"]): r["n_docs"]
            for r in q5.naive_bayes_lang_documents(spark, SF).collect()
        }
    finally:
        q5.table = orig
    # held-out docs: doc_id % 5 == 0 → ids 0,5,10,...,35 → 4 per class
    assert out == {("aa", "aa"): 4, ("bb", "bb"): 4}


# --------------------------------------------------------------------------
# reconciliation
# --------------------------------------------------------------------------
def test_reconcile_counts_match_construction(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    out = {
        r["column_name"]: r.asDict()
        for r in q5.reconcile_snapshots_orders(spark, SF).collect()
    }
    assert set(out) == {
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    # keys only in A are %6==0 (dropped from B) and not %4==0; vice versa.
    from _data_engineering_pipeline_project_spark.catalog import table

    o = table(spark, SF, "orders")
    keys = [r[0] for r in o.select("o_orderkey").collect()]
    only_a = sum(1 for k in keys if k % 4 != 0 and k % 6 == 0)
    only_b = sum(1 for k in keys if k % 4 == 0 and k % 6 != 0)
    both = [k for k in keys if k % 4 != 0 and k % 6 != 0]
    for c, r in out.items():
        assert r["n_only_left"] == only_a
        assert r["n_only_right"] == only_b
        assert r["n_match"] + r["n_mismatch"] == len(both)
    # injected perturbations: totalprice bumped on %9, status flipped on
    # %11 (except already-'P' rows stay equal — count via data).
    assert out["o_totalprice"]["n_mismatch"] == sum(
        1 for k in both if k % 9 == 0
    )
    assert out["o_custkey"]["n_mismatch"] == 0
    assert out["o_orderdate"]["n_mismatch"] == 0


# --------------------------------------------------------------------------
# windowed funnel
# --------------------------------------------------------------------------
def test_windowed_funnel_levels_hand_case(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    def ev(i, u, typ, mins):
        return Row(
            event_id=i,
            ts=datetime(2024, 1, 1, 12 + mins // 60, mins % 60, 0),
            user_id=u,
            event_type=typ,
            value=1.0,
            props="{}",
        )

    # user 1: view → click(+10m) → purchase(+20m)  → level 3
    # user 2: view → click(+75m, OUTSIDE window)   → level 1
    # user 3: view → purchase(+5m, no click first) → level 1
    # user 4: click only (no view anchor)          → absent
    rows = [
        ev(1, 1, "view", 0),
        ev(2, 1, "click", 10),
        ev(3, 1, "purchase", 20),
        ev(4, 2, "view", 0),
        ev(5, 2, "click", 75),
        ev(6, 3, "view", 0),
        ev(7, 3, "purchase", 5),
        ev(8, 4, "click", 0),
    ]
    docs = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        out = {
            r["funnel_level"]: r["n_users"]
            for r in q5.windowed_funnel_events(spark, SF).collect()
        }
    finally:
        q5.table = orig
    assert out == {3: 1, 1: 2}


# --------------------------------------------------------------------------
# activity islands
# --------------------------------------------------------------------------
def test_activity_islands_hand_case(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    def ev(i, u, day, hour=3):
        return Row(
            event_id=i,
            ts=datetime(2024, 1, day, hour, 0, 0),
            user_id=u,
            event_type="view",
            value=1.0,
            props="{}",
        )

    # user 1: days 1,2,3 then 7,8 → streaks [3,2]; two events same day
    # collapse to one active day.
    rows = [
        ev(1, 1, 1),
        ev(2, 1, 2),
        ev(3, 1, 2, hour=9),
        ev(4, 1, 3),
        ev(5, 1, 7),
        ev(6, 1, 8),
        ev(7, 2, 5),
    ]
    docs = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        out = {
            r["user_id"]: r.asDict()
            for r in q5.activity_islands_users(spark, SF).collect()
        }
    finally:
        q5.table = orig
    assert out[1]["n_streaks"] == 2
    assert out[1]["max_streak_days"] == 3
    assert out[1]["n_active_days"] == 5
    assert out[2]["n_streaks"] == 1
    assert out[2]["max_streak_days"] == 1


# --------------------------------------------------------------------------
# Fellegi-Sunter linkage
# --------------------------------------------------------------------------
def test_fs_linkage_weights_separate_matches(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    rows = q5.fellegi_sunter_linkage_parts(spark, SF).collect()
    assert rows, "no candidates generated"
    true_w = [r["weight_micro"] for r in rows if r["is_true_match"]]
    false_w = [r["weight_micro"] for r in rows if not r["is_true_match"]]
    assert true_w and false_w
    # FS weights must rank true matches above non-matches on average, and
    # the threshold-0 decision should be strongly enriched: every true
    # match scores positive, and precision at that threshold is high.
    assert min(true_w) > 0
    matched_true = sum(1 for r in rows if r["matched"] and r["is_true_match"])
    matched_all = sum(1 for r in rows if r["matched"])
    assert matched_true / matched_all > 0.9
    assert sum(true_w) / len(true_w) > sum(false_w) / len(false_w)


# --------------------------------------------------------------------------
# incremental join-view maintenance
# --------------------------------------------------------------------------
def test_incremental_join_view_equals_full_recompute(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    from _data_engineering_pipeline_project_spark.catalog import table
    from pyspark.sql import functions as F

    maintained = {
        r["n_name"]: (r["revenue"], r["n_lines"])
        for r in q5.incremental_join_view_revenue(spark, SF).collect()
    }
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer")
    n = table(spark, SF, "nation")
    full = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                    ).cast("decimal(18,4)")
                ).cast("double"),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    recomputed = {
        r["n_name"]: (r["revenue"], r["n_lines"]) for r in full.collect()
    }
    assert maintained == recomputed


# --------------------------------------------------------------------------
# zipf / heaps
# --------------------------------------------------------------------------
def test_zipf_alpha_on_synthetic_power_law(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # one doc whose term frequencies follow f(r) = round(1000 / r):
    # the fitted slope must be ~1.
    terms = []
    for r in range(1, 51):
        terms += [f"w{r:03d}"] * round(1000 / r)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(terms), lang="en", source="pl",
             n_chars=len(terms))]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        out = q5.zipf_heaps_by_source(spark, SF).collect()
    finally:
        q5.table = orig
    assert len(out) == 1
    assert abs(out[0]["zipf_alpha"] - 1.0) < 0.05
    assert out[0]["vocab"] == 50


# --------------------------------------------------------------------------
# compression ratio
# --------------------------------------------------------------------------
def test_compression_ratio_orders_repetitive_below_noise(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    import random

    rnd = random.Random(7)
    noisy = " ".join(
        "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(100)
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam ham " * 400, lang="en", source="s",
                n_chars=3600),
            Row(doc_id=2, text=noisy, lang="en", source="s",
                n_chars=len(noisy)),
            Row(doc_id=3, text="", lang="en", source="s", n_chars=0),
        ]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        out = {r["doc_id"]: r.asDict()
               for r in q5.compression_ratio_documents(spark, SF).collect()}
    finally:
        q5.table = orig
    assert out[1]["ratio"] < 0.05          # boilerplate compresses away
    assert out[2]["ratio"] > 0.5           # random text barely compresses
    assert not out[1]["keep"] and out[2]["keep"]
    assert out[3]["n_bytes"] == 0 and not out[3]["keep"]


# --------------------------------------------------------------------------
# distributed BPE training
# --------------------------------------------------------------------------
def test_bpe_distributed_learns_expected_merges(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # corpus: "aaab" x3, "ab" x2.
    # round 1: (a,a)=6 beats (a,b)=5 → merge (a,a).
    # round 2: "aaab"=[aa,a,b], "ab"=[a,b] → (aa,a)=3, (a,b)=3+2=5
    #          → merge (a,b).
    # round 3: "aaab"=[aa,ab], "ab"=[ab] → (aa,ab)=3 → merge (aa,ab).
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aaab aaab aaab ab ab", lang="en", source="s",
             n_chars=20)]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        out = {
            r["merge_rank"]: (r["p1"], r["p2"], r["pair_count"])
            for r in q5.bpe_train_merges_distributed(spark, SF).collect()
        }
    finally:
        q5.table = orig
    assert out[1] == ("a", "a", 6)
    assert out[2] == ("a", "b", 5)
    assert out[3] == ("aa", "ab", 3)


# --------------------------------------------------------------------------
# BOM explosion
# --------------------------------------------------------------------------
def test_bom_explosion_depth3_path_quantities(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    parts = spark.createDataFrame(
        [Row(p_partkey=k) for k in range(1, 351)]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: parts
        rows = q5.bom_explosion_parts(spark, SF).collect()
    finally:
        q5.table = orig
    by = {(r["ancestor"], r["descendant"], r["depth"]): r["path_qty"]
          for r in rows}
    # chain 343 → 49 → 7 → 1 with qty (k%3)+1 = 2 at each hop
    assert by[(1, 7, 1)] == 2
    assert by[(1, 49, 2)] == 4
    assert by[(1, 343, 3)] == 8
    # no depth-4 rows; every depth-1 row is a direct edge
    assert max(r["depth"] for r in rows) == 3


# --------------------------------------------------------------------------
# KMV set algebra
# --------------------------------------------------------------------------
def test_kmv_set_ops_identical_and_disjoint_sets(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    rows = []
    i = 0
    for u in range(1, 51):          # A and B share all 50 users
        for t in ("A", "B"):
            i += 1
            rows.append(Row(event_id=i, ts=datetime(2024, 1, 1), user_id=u,
                            event_type=t, value=1.0, props="{}"))
    for u in range(1000, 1050):     # C disjoint
        i += 1
        rows.append(Row(event_id=i, ts=datetime(2024, 1, 1), user_id=u,
                        event_type="C", value=1.0, props="{}"))
    ev = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: ev
        out = {(r["type_a"], r["type_b"]): r.asDict()
               for r in q5.kmv_set_ops_event_types(spark, SF).collect()}
    finally:
        q5.table = orig
    # identical sets, below k: exact union 50, jaccard 1
    assert out[("A", "B")]["est_union"] == 50.0
    assert out[("A", "B")]["jaccard_est"] == 1.0
    assert out[("A", "B")]["est_inter"] == 50.0
    # disjoint sets: true union 100 exceeds k=64, so the union is
    # ESTIMATED (within KMV's ~1/sqrt(k) error); jaccard exactly 0.
    assert abs(out[("A", "C")]["est_union"] - 100.0) / 100.0 < 0.2
    assert out[("A", "C")]["jaccard_est"] == 0.0
    assert out[("A", "C")]["est_inter"] == 0.0


# --------------------------------------------------------------------------
# dedup cluster representatives
# --------------------------------------------------------------------------
def test_cluster_representatives_keep_longest(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # docs 1,2 near-identical (one cluster), doc 3 unrelated singleton.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base, lang="en", source="s",
                n_chars=len(base)),
            Row(doc_id=2, text=base + "extra tail", lang="en", source="s",
                n_chars=len(base) + 10),
            Row(doc_id=3, text="totally different words here nothing shared "
                               "with the others at all believe me truly",
                lang="en", source="s", n_chars=90),
        ]
    )
    # the query consumes the MEMOIZED shared MinHash stage, which reads
    # through queries_ext's table import — patch both and flush the memo
    import _data_engineering_pipeline_project_spark.queries_ext as qext
    from _data_engineering_pipeline_project_spark.queries_ext import (
        clear_query_caches,
    )

    orig, orig_ext = q5.table, qext.table
    clear_query_caches()
    try:
        q5.table = lambda sp, sf, name: docs
        qext.table = lambda sp, sf, name: docs
        out = {r["doc_id"]: r.asDict()
               for r in q5.dedup_cluster_representatives(spark, SF).collect()}
    finally:
        q5.table = orig
        qext.table = orig_ext
        clear_query_caches()
    assert out[1]["cluster"] == out[2]["cluster"] == 1
    assert out[2]["kept"] and not out[1]["kept"]   # doc 2 is longer
    assert out[3]["cluster"] == 3 and out[3]["kept"]


# --------------------------------------------------------------------------
# content-defined chunking
# --------------------------------------------------------------------------
def test_cdc_chunks_resynchronize_after_head_insert(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    import random

    rnd = random.Random(11)
    toks = ["t%04d" % rnd.randrange(5000) for _ in range(400)]
    a = " ".join(toks)
    b = "inserted " + a          # head insertion shifts every position
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a, lang="en", source="s", n_chars=len(a)),
         Row(doc_id=2, text=b, lang="en", source="s", n_chars=len(b))]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: docs
        rows = q5.content_defined_chunks_documents(spark, SF).collect()
    finally:
        q5.table = orig
    ca = [r["chunk_text"] for r in sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_no"])]
    cb = [r["chunk_text"] for r in sorted(
        (r for r in rows if r["doc_id"] == 2), key=lambda r: r["chunk_no"])]
    assert len(ca) > 5, "divisor should produce many chunks on 400 tokens"
    # shift-resistance: chunks re-sync after the first boundary — all but
    # the first chunk of doc 2 appear verbatim in doc 1's chunk list.
    shared = set(ca) & set(cb)
    assert len(shared) >= len(ca) - 2
    # reassembly is lossless (tokens are already lowercase)
    assert " ".join(ca) == a


# --------------------------------------------------------------------------
# forward as-of join
# --------------------------------------------------------------------------
def test_asof_forward_picks_nearest_future_row(spark):
    from _data_engineering_pipeline_project_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 12), (1, 25), (1, 3), (2, 5)], "k int, rts int"
    )
    out = {
        (r["k"], r["ts"]): r["rts_asof"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=[], direction="forward",
        ).collect()
    }
    assert out[(1, 10)] == 12      # nearest future, not 25 and not past 3
    assert out[(1, 20)] == 25
    assert out[(2, 5)] == 5        # equal timestamp is visible


def test_asof_forward_none_when_no_future_row(spark):
    from _data_engineering_pipeline_project_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 30)], "k int, ts int")
    right = spark.createDataFrame([(1, 12)], "k int, rts int")
    [r] = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=[], direction="forward",
    ).collect()
    assert r["rts_asof"] is None


# --------------------------------------------------------------------------
# spatial neighbor pairs
# --------------------------------------------------------------------------
def test_spatial_pairs_match_brute_force(spark):
    import hashlib

    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    cust = spark.createDataFrame([Row(c_custkey=k) for k in range(1, 301)])

    def h(k, ax):
        return (
            int(hashlib.md5(f"{k}:{ax}".encode()).hexdigest()[:15], 16)
            % 100000
        ) / 1000.0

    pts = {k: (h(k, "x"), h(k, "y")) for k in range(1, 301)}
    expected = set()
    for a in pts:
        for b in pts:
            if a < b:
                d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
                if d2 <= 1.0:
                    expected.add((a, b))
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: cust
        got = {
            (r["cust_a"], r["cust_b"])
            for r in q5.spatial_neighbor_pairs_customers(spark, SF).collect()
        }
    finally:
        q5.table = orig
    assert got == expected


# --------------------------------------------------------------------------
# time-weighted average
# --------------------------------------------------------------------------
def test_twap_weights_by_interval_length(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    from datetime import timedelta

    base = datetime(2024, 1, 1, 0, 0, 0)
    # user 1: value 10 held 30s, value 2 held 10s, final value unweighted
    rows = [
        Row(event_id=1, ts=base, user_id=1, event_type="v",
            value=10.0, props="{}"),
        Row(event_id=2, ts=base + timedelta(seconds=30), user_id=1,
            event_type="v", value=2.0, props="{}"),
        Row(event_id=3, ts=base + timedelta(seconds=40), user_id=1,
            event_type="v", value=99.0, props="{}"),
    ]
    ev = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: ev
        [r] = q5.time_weighted_avg_value_users(spark, SF).collect()
    finally:
        q5.table = orig
    assert r["n_intervals"] == 2
    assert r["total_sec"] == 40
    assert r["twap"] == (10.0 * 30 + 2.0 * 10) / 40


# --------------------------------------------------------------------------
# clamped running balance
# --------------------------------------------------------------------------
def test_clamped_balance_never_negative(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # part 1: +5, -9 (clamps to 0), +3  → final 3 (unclamped would be -1)
    rows = [
        Row(l_partkey=1, l_quantity=5.0, l_returnflag="N",
            l_shipdate=datetime(2024, 1, 1), l_orderkey=1, l_linenumber=1),
        Row(l_partkey=1, l_quantity=9.0, l_returnflag="R",
            l_shipdate=datetime(2024, 1, 2), l_orderkey=2, l_linenumber=1),
        Row(l_partkey=1, l_quantity=3.0, l_returnflag="N",
            l_shipdate=datetime(2024, 1, 3), l_orderkey=3, l_linenumber=1),
    ]
    li = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: li
        [r] = q5.clamped_running_balance_parts(spark, SF).collect()
    finally:
        q5.table = orig
    assert r["n_moves"] == 3
    assert r["final_balance"] == 3


# --------------------------------------------------------------------------
# centroid silhouette
# --------------------------------------------------------------------------
def test_silhouette_separated_clusters_near_one(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # two tight, far-apart clusters → silhouette ≈ 1; interleaved labels
    # on the SAME points → silhouette ≈ negative/zero.
    rows = []
    vid = 0
    for label, base in ((0, 0.0), (1, 100.0)):
        for j in range(10):
            vid += 1
            rows.append(
                Row(vec_id=vid, embedding=[base + j * 0.01, base], label=label)
            )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: emb
        out = {r["label"]: r["mean_silhouette"]
               for r in q5.silhouette_centroid_embeddings(spark, SF).collect()}
    finally:
        q5.table = orig
    assert out[0] > 0.99 and out[1] > 0.99


# --------------------------------------------------------------------------
# GDPR erasure cascade
# --------------------------------------------------------------------------
def test_gdpr_cascade_order_children_first(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    rows = {r["table_name"]: r.asDict()
            for r in q5.gdpr_erasure_cascade_report(spark, SF).collect()}
    assert rows["lineitem"]["cascade_rank"] < rows["orders"]["cascade_rank"]
    assert rows["orders"]["cascade_rank"] < rows["customer"]["cascade_rank"]
    # cascade counts are monotone in the hierarchy construction: every
    # erased order belongs to an erased customer
    assert rows["customer"]["n_rows_to_erase"] >= 1


# --------------------------------------------------------------------------
# label propagation communities
# --------------------------------------------------------------------------
def test_lpa_two_cliques_converge_to_two_communities(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    from datetime import datetime, timedelta

    # users 1-6 alternate within {A1,A2,A3}; users 7-12 within {B1,B2,B3};
    # no cross traffic → two communities
    rows = []
    i = 0
    base = datetime(2024, 1, 1)
    for u in range(1, 7):
        for j, t in enumerate(["A1", "A2", "A3", "A1", "A2", "A3"]):
            i += 1
            rows.append(Row(event_id=i, ts=base + timedelta(minutes=i),
                            user_id=u, event_type=t, value=1.0, props="{}"))
    for u in range(7, 13):
        for j, t in enumerate(["B1", "B2", "B3", "B1", "B2", "B3"]):
            i += 1
            rows.append(Row(event_id=i, ts=base + timedelta(minutes=i),
                            user_id=u, event_type=t, value=1.0, props="{}"))
    ev = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: ev
        out = {r["event_type"]: r["community"]
               for r in q5.label_propagation_communities_events(spark, SF).collect()}
    finally:
        q5.table = orig
    # Synchronous LPA can oscillate within a symmetric clique (label
    # cycling is the documented failure mode the async variant fixes), so
    # the sound invariant after a fixed round count is SEPARATION: labels
    # never cross the disconnected components.
    a_comm = {out["A1"], out["A2"], out["A3"]}
    b_comm = {out["B1"], out["B2"], out["B3"]}
    assert a_comm <= {"A1", "A2", "A3"}
    assert b_comm <= {"B1", "B2", "B3"}
    assert not (a_comm & b_comm)


# --------------------------------------------------------------------------
# mutual information
# --------------------------------------------------------------------------
def test_mutual_information_independent_vs_dependent(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    from datetime import datetime

    def ev(i, t, hour):
        return Row(event_id=i, ts=datetime(2024, 1, 1 + i % 20, hour, 0, 0),
                   user_id=1, event_type=t, value=1.0, props="{}")

    # perfectly dependent: type A only at hour 1, type B only at hour 2
    dep = spark.createDataFrame(
        [ev(i, "A", 1) for i in range(50)] + [ev(i + 50, "B", 2) for i in range(50)]
    )
    # independent: both types uniformly at both hours
    ind = spark.createDataFrame(
        [ev(i, t, h) for i, (t, h) in enumerate(
            [(t, h) for t in ("A", "B") for h in (1, 2)] * 25)]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: dep
        [rd] = q5.mutual_information_type_hour(spark, SF).collect()
        q5.table = lambda sp, sf, name: ind
        [ri] = q5.mutual_information_type_hour(spark, SF).collect()
    finally:
        q5.table = orig
    import math

    assert abs(rd["mi_nats"] - math.log(2)) < 1e-4   # 1 bit of dependence
    assert abs(ri["mi_nats"]) < 1e-4                 # independence → 0


# --------------------------------------------------------------------------
# min-plus shortest paths
# --------------------------------------------------------------------------
def test_shortest_paths_prefer_cheap_two_hop_over_expensive_direct(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    from datetime import datetime, timedelta

    # Construct transition counts: A-B heavy (100), B-C heavy (100),
    # A-C rare (1). Direct A→C cost = 1e6; via B = 1e6/200 + 1e6/200
    # (undirected sums double the counts) → far cheaper, hops=2.
    rows = []
    i = 0
    base = datetime(2024, 1, 1)

    def burst(seq_types, n):
        nonlocal i
        for rep in range(n):
            for t in seq_types:
                i += 1
                rows.append(Row(event_id=i, ts=base + timedelta(seconds=i),
                                user_id=1000 + rep + len(rows) * 0,
                                event_type=t, value=1.0, props="{}"))

    # per-user two-event sequences to control transition counts exactly
    uid = 0
    def pair(a, b, n):
        nonlocal uid, i
        for _ in range(n):
            uid += 1
            for t in (a, b):
                i += 1
                rows.append(Row(event_id=i, ts=base + timedelta(seconds=i),
                                user_id=uid, event_type=t, value=1.0,
                                props="{}"))

    pair("A", "B", 100)
    pair("B", "C", 100)
    pair("A", "C", 1)
    ev = spark.createDataFrame(rows)
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: ev
        out = {(r["type_from"], r["type_to"]): r.asDict()
               for r in q5.shortest_paths_3hop_event_types(spark, SF).collect()}
    finally:
        q5.table = orig
    ac = out[("A", "C")]
    assert ac["hops"] == 2
    assert ac["dist_cost"] == 2 * (1000000 // 100)
    assert out[("A", "B")]["hops"] == 1


# --------------------------------------------------------------------------
# native recursive CTE closure
# --------------------------------------------------------------------------
def test_recursive_cte_reaches_depth_beyond_unrolled(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5

    # keys up to 2500 give the chain 2401 → 343 → 49 → 7 → 1 (depth 4) —
    # deeper than the 3-level unrolled variant can see.
    parts = spark.createDataFrame([Row(p_partkey=k) for k in range(1, 2501)])
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: parts
        rows = q5.bom_closure_recursive_cte(spark, SF).collect()
    finally:
        q5.table = orig
    by = {(r["ancestor"], r["descendant"]): r for r in rows}
    r = by[(1, 2401)]
    assert r["depth"] == 4
    # path qty = product of (k%3)+1 along 2401→343→49→7: 2*2*2*2
    assert r["path_qty"] == 16
    assert max(x["depth"] for x in rows) == 4


# --------------------------------------------------------------------------
# CLI smoke
# --------------------------------------------------------------------------
def test_cli_list_run_explain(spark, capsys):
    from _data_engineering_pipeline_project_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out and "remove_duplicate_spans_documents" in out
    assert main(["run", "pricing_summary", "--sf", SF, "--limit", "3"]) == 0
    assert "l_returnflag" in capsys.readouterr().out
    assert main(["explain", "revenue_by_nation", "--sf", SF]) == 0
    assert "Physical Plan" in capsys.readouterr().out
    assert main(["run", "no_such_query"]) == 2


# --------------------------------------------------------------------------
# registry contract
# --------------------------------------------------------------------------
def test_registry_contract():
    """Driver-contract invariants: every oracle key has a query, names
    are unique and stable-sortable, and no oracle SQL is empty."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
    # ≥ 90% of the surface is oracle-checked (the rest documented
    # rows-only); regression guard against silently losing oracles
    assert len(os_) / len(qs) >= 0.9


# --------------------------------------------------------------------------
# table fingerprint
# --------------------------------------------------------------------------
def test_fingerprint_detects_single_row_mutation(spark):
    import _data_engineering_pipeline_project_spark.queries_ext5 as q5
    from datetime import datetime

    rows = [
        Row(o_orderkey=i, o_custkey=i % 5, o_orderstatus="O",
            o_totalprice=100.0 + i, o_orderdate=datetime(2024, 1, 1),
            o_orderpriority="1-URGENT")
        for i in range(1, 200)
    ]
    base = spark.createDataFrame(rows)
    mutated = spark.createDataFrame(
        rows[:-1]
        + [rows[-1].asDict() | {"o_totalprice": rows[-1]["o_totalprice"] + 0.01}]
    )
    orig = q5.table
    try:
        q5.table = lambda sp, sf, name: base
        [fa] = q5.table_fingerprint_orders(spark, SF).collect()
        q5.table = lambda sp, sf, name: mutated
        [fb] = q5.table_fingerprint_orders(spark, SF).collect()
        # order-independence: same rows reshuffled → identical digest
        q5.table = lambda sp, sf, name: base.orderBy(F.rand(7)).repartition(8)
        [fc] = q5.table_fingerprint_orders(spark, SF).collect()
    finally:
        q5.table = orig
    assert fa["n_rows"] == fb["n_rows"]
    assert fa["content_sum"] != fb["content_sum"]
    assert fa["content_xor"] != fb["content_xor"]
    assert fa.asDict() == fc.asDict()


# --------------------------------------------------------------------------
# shared-stage memoization
# --------------------------------------------------------------------------
def test_minhash_pair_stage_is_memoized_per_session(spark):
    """Queries composing the MinHash stage (near-dup, clusters,
    representatives, weighted Jaccard) must share ONE cached pair frame
    per (session, sf) — the contract that makes a multi-query dedup run
    pay for signatures once."""
    from _data_engineering_pipeline_project_spark.queries_ext import (
        _minhash_pairs_shared,
        clear_query_caches,
    )

    clear_query_caches()
    a = _minhash_pairs_shared(spark, SF)
    b = _minhash_pairs_shared(spark, SF)
    assert a is b
    clear_query_caches()
    c = _minhash_pairs_shared(spark, SF)
    assert c is not a
    clear_query_caches()


# --------------------------------------------------------------------------
# collation contract
# --------------------------------------------------------------------------
def test_string_ordering_is_binary_and_matches_duckdb(spark):
    """Load-bearing invariant behind every string tie-break in the
    oracle suite: Spark's default UTF8_BINARY collation sorts by code
    point, and DuckDB's default BINARY collation agrees — so window
    orderings on strings are engine-identical. Pin it explicitly."""
    import duckdb

    vals = ["b", "B", "a", "á", "Z", "zz", "0", " ", "ab"]
    sp = [
        r["v"]
        for r in spark.createDataFrame([(v,) for v in vals], "v string")
        .orderBy("v")
        .collect()
    ]
    dk = [
        r[0]
        for r in duckdb.sql(
            "SELECT v FROM (VALUES "
            + ",".join(f"('{v}')" for v in vals)
            + ") t(v) ORDER BY v"
        ).fetchall()
    ]
    assert sp == dk == sorted(vals)
