"""Unit tests for the corpus-preparation operators added in round 3's
continuation: line dedup, hashed linear classifier, temperature
resampling, bigram PMI, duplicated-gram coverage. Hand-computed
expectations on tiny frames — the DuckDB oracle twins in queries_ext3
cover sf-scale parity; these pin the semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators import curation as C
from _data_engineering_pipeline_project_spark.operators import dedup as D
from _data_engineering_pipeline_project_spark.operators import ranking as R
from _data_engineering_pipeline_project_spark.operators import sampling as S


# --------------------------------------------------------------------------
# line dedup
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def lines(spark):
    # doc 1: [hello, world, hello]  (line "hello" repeats WITHIN the doc)
    # doc 2: [world, bye]           ("world" repeats ACROSS docs)
    return spark.createDataFrame(
        [
            (1, 0, "hello"),
            (1, 1, "world"),
            (1, 2, "hello"),
            (2, 0, "world"),
            (2, 1, "bye"),
        ],
        "doc_id long, line_no int, line string",
    )


def test_dedup_lines_keep_first(lines):
    flagged = {
        (r.doc_id, r.line_no): r.kept
        for r in C.dedup_lines(lines).collect()
    }
    assert flagged[(1, 0)] is True  # first "hello"
    assert flagged[(1, 2)] is False  # within-doc repeat
    assert flagged[(1, 1)] is True  # first "world" (doc 1 < doc 2)
    assert flagged[(2, 0)] is False  # cross-doc repeat
    assert flagged[(2, 1)] is True


def test_reassemble_documents_order_and_stats(lines):
    out = {
        r.doc_id: r
        for r in C.reassemble_documents(C.dedup_lines(lines)).collect()
    }
    assert out[1].text_clean == "hello\nworld"  # position order, repeat gone
    assert out[1].n_lines == 3 and out[1].n_removed == 1
    assert out[2].text_clean == "bye"
    assert out[2].n_lines == 2 and out[2].n_removed == 1


def test_reassemble_fully_removed_doc(spark):
    lines = spark.createDataFrame(
        [(1, 0, "dup"), (2, 0, "dup")],
        "doc_id long, line_no int, line string",
    )
    out = {
        r.doc_id: r
        for r in C.reassemble_documents(C.dedup_lines(lines)).collect()
    }
    assert out[2].text_clean == ""  # empty string, not null
    assert out[2].n_removed == 1


# --------------------------------------------------------------------------
# hashed linear classifier
# --------------------------------------------------------------------------
def test_hashed_linear_score_deterministic_and_exact(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")],
        "doc_id long, text string",
    )
    rows = R.hashed_linear_score(docs).collect()
    by_id = {r.doc_id: r for r in rows}
    assert 2 not in by_id  # empty doc: no tokens, no row
    r1 = by_id[1]
    assert r1.n_tokens == 3
    # repeated token contributes its weight twice: score*n divisible
    # by the repeated structure — recompute via the same md5 arithmetic
    import hashlib

    def w(term):
        b = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
        return (b % 1024 % 997) - 498

    expect = (2 * w("alpha") + w("beta")) / 3
    assert r1.quality_score == pytest.approx(round(expect, 6), abs=0)
    assert r1.keep == (2 * w("alpha") + w("beta") > 0)


# --------------------------------------------------------------------------
# temperature resample
# --------------------------------------------------------------------------
def test_temperature_resample_rarest_stratum_keeps_all(spark):
    rows = [(i, "big") for i in range(200)] + [(1000 + i, "rare") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, lang string")
    kept = S.temperature_resample(df, "lang", "id", alpha=0.5)
    by_lang = {
        r.lang: r.cnt
        for r in kept.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_lang.get("rare") == 5  # rate = sqrt(5/5) = 1.0 → all kept
    # head stratum downsampled around sqrt(5/200) ≈ 0.158 → well under 200
    assert 0 < by_lang["big"] < 100
    # rates attached and correct
    rates = {r.lang: r.keep_rate for r in kept.select("lang", "keep_rate").distinct().collect()}
    assert rates["rare"] == pytest.approx(1.0, abs=0)
    assert rates["big"] == pytest.approx(math.sqrt(5 / 200), abs=1e-12)


def test_temperature_resample_is_consistent_subset(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], "id long, lang string"
    )
    kept_ids = {r.id for r in S.temperature_resample(df, "lang", "id").collect()}
    # deterministic: rerun yields the identical set
    again = {r.id for r in S.temperature_resample(df, "lang", "id").collect()}
    assert kept_ids == again


# --------------------------------------------------------------------------
# bigram PMI
# --------------------------------------------------------------------------
def test_bigram_pmi_perfect_collocation_ranks_first(spark):
    # "san francisco" always adjacent; filler tokens independent
    docs = spark.createDataFrame(
        [(i, "san francisco " + "x y " * 5) for i in range(5)],
        "doc_id long, text string",
    )
    rows = R.bigram_pmi(docs, min_count=5, top_n=5).collect()
    assert rows[0].w1 == "san" and rows[0].w2 == "francisco"
    assert rows[0].rnk == 1
    # c_a = count("san") = 5, c_ab = 5
    assert rows[0].c_ab == 5 and rows[0].c_a == 5


def test_bigram_pmi_adjacency_skips_blank_runs(spark):
    # double spaces must not break adjacency (empty tokens filtered
    # before sequencing)
    docs = spark.createDataFrame(
        [(1, "a  b a  b a  b a  b a  b")], "doc_id long, text string"
    )
    rows = R.bigram_pmi(docs, min_count=5, top_n=5).collect()
    assert any(r.w1 == "a" and r.w2 == "b" and r.c_ab == 5 for r in rows)


# --------------------------------------------------------------------------
# duplicated-gram coverage
# --------------------------------------------------------------------------
def test_duplicated_gram_coverage(spark):
    shared = "abcdefghijkl"  # exactly k=12 chars, present in both docs
    docs = spark.createDataFrame(
        [
            (1, shared + "unique-tail-one-xyzzy"),
            (2, shared),  # doc 2 is a single duplicated gram
            (3, "short"),  # < k: no grams, no output row
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in D.duplicated_gram_coverage(docs, k=12, stride=4).collect()
    }
    assert 3 not in out
    assert out[2].n_grams == 1 and out[2].dup_coverage == 1.0
    # doc 1's gram at pos 1 equals doc 2's gram → at least one dup gram
    assert out[1].n_dup_grams >= 1
    assert 0 < out[1].dup_coverage < 1


def test_char_gram_table_positions(spark):
    docs = spark.createDataFrame([(1, "abcdefghijklmnop")], "doc_id long, text string")
    rows = D.char_gram_table(docs, k=12, stride=4).collect()
    assert {(r.pos, r.gram) for r in rows} == {
        (1, "abcdefghijkl"),
        (5, "efghijklmnop"),
    }


# --------------------------------------------------------------------------
# MAD outliers (query-level math pin)
# --------------------------------------------------------------------------
def test_mad_flags_injected_spike(spark, tmp_path):
    import pandas as pd

    vals = [10.0 + (i % 7) * 0.5 for i in range(50)] + [500.0]
    pdf = pd.DataFrame(
        {
            "event_id": range(51),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": "t",
            "value": vals,
            "props": "{}",
        }
    )
    d = tmp_path / "events.parquet"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(d))
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        mad_outliers_events,
    )

    out = mad_outliers_events(spark, str(tmp_path)).collect()
    assert [r.event_id for r in out] == [50]  # only the spike
    assert out[0].robust_z > 3.5


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------
def test_pagerank_two_node_chain(spark):
    from _data_engineering_pipeline_project_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b", 1)], "src string, dst string, w long")
    nodes = spark.createDataFrame([("a",), ("b",)], "node string")
    r = {row.node: row.pagerank for row in pagerank(edges, nodes, 0.85, 1).collect()}
    # after 1 iter: a gets only teleport 0.15/2; b gets 0.075 + 0.85*0.5
    assert r["a"] == pytest.approx(0.075, abs=1e-12)
    assert r["b"] == pytest.approx(0.075 + 0.85 * 0.5, abs=1e-12)


def test_pagerank_mass_conservation_no_dangling(spark):
    from _data_engineering_pipeline_project_spark.operators.graph import pagerank

    # cycle a->b->c->a: every node has out-degree, total mass stays 1
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3)],
        "src string, dst string, w long",
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    rows = pagerank(edges, nodes, 0.85, 4).collect()
    assert sum(r.pagerank for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_weights_matter(spark):
    from _data_engineering_pipeline_project_spark.operators.graph import pagerank

    # hub splits 9:1 between x and y → x ranks higher
    edges = spark.createDataFrame(
        [("h", "x", 9), ("h", "y", 1), ("x", "h", 1), ("y", "h", 1)],
        "src string, dst string, w long",
    )
    nodes = spark.createDataFrame([("h",), ("x",), ("y",)], "node string")
    r = {row.node: row.pagerank for row in pagerank(edges, nodes, 0.85, 3).collect()}
    assert r["x"] > r["y"]


# --------------------------------------------------------------------------
# rolling distinct / winsorize edge semantics
# --------------------------------------------------------------------------
def test_rolling_7d_distinct_counts_window_not_day(spark, tmp_path):
    import pandas as pd

    # user 1 active day 1; user 2 active day 5; user 3 active day 20
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-05", "2024-01-20"]),
            "user_id": [1, 2, 3],
            "event_type": "t",
            "value": 1.0,
            "props": "{}",
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        rolling_7d_distinct_users,
    )

    out = {
        str(r.day): r.users_7d
        for r in rolling_7d_distinct_users(spark, str(tmp_path)).collect()
    }
    assert out["2024-01-01"] == 1
    assert out["2024-01-05"] == 2  # day 1 user still inside the 7-day window
    assert out["2024-01-20"] == 1  # both earlier users aged out


def test_winsorize_clips_to_order_statistics(spark, tmp_path):
    import pandas as pd

    vals = list(range(1, 101))  # 1..100, p1=1.99, p99=99.01
    pdf = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": "t",
            "value": [float(v) for v in vals],
            "props": "{}",
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        winsorized_stats_events,
    )

    row = winsorized_stats_events(spark, str(tmp_path)).collect()[0]
    assert row.clipped_min == pytest.approx(1.99, abs=1e-9)
    assert row.clipped_max == pytest.approx(99.01, abs=1e-9)
    # winsorizing a symmetric sample leaves the mean at the center
    assert row.winsorized_mean == pytest.approx(50.5, abs=1e-9)


# --------------------------------------------------------------------------
# property-based invariants (hypothesis)
# --------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=6
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus)
def test_line_dedup_conservation_properties(spark, docs):
    rows = [
        (doc_id, pos, line)
        for doc_id, lines in enumerate(docs)
        for pos, line in enumerate(lines)
    ]
    df = spark.createDataFrame(rows, "doc_id long, line_no int, line string")
    flagged = C.dedup_lines(df).collect()
    # kept lines = exactly one occurrence per distinct line text
    kept = [r for r in flagged if r.kept]
    assert len(kept) == len({r.line for r in flagged})
    # the kept occurrence is the (doc, pos)-minimal one
    first = {}
    for r in sorted(flagged, key=lambda r: (r.doc_id, r.line_no)):
        first.setdefault(r.line, (r.doc_id, r.line_no))
    assert {(r.doc_id, r.line_no) for r in kept} == set(first.values())
    # reassembly conserves counts
    out = C.reassemble_documents(C.dedup_lines(df)).collect()
    assert sum(r.n_lines for r in out) == len(rows)
    assert sum(r.n_lines - r.n_removed for r in out) == len(kept)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=4)
)
def test_temperature_resample_invariants(spark, sizes):
    rows = [
        (stratum * 1000 + i, f"s{stratum}")
        for stratum, n in enumerate(sizes)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, lang string")
    kept = S.temperature_resample(df, "lang", "id").collect()
    ids = {r.id for r in kept}
    assert ids <= {r[0] for r in rows}  # subset of input
    by_stratum = {}
    for r in kept:
        by_stratum.setdefault(r.lang, []).append(r)
    min_n = min(sizes)
    for stratum, n in enumerate(sizes):
        name = f"s{stratum}"
        if n == min_n:
            # rarest stratum keeps everything (rate exactly 1.0)
            assert len(by_stratum.get(name, [])) == n
        for r in by_stratum.get(name, []):
            assert 0 < r.keep_rate <= 1.0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.sampled_from("abcd"), st.sampled_from("abcd"),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda e: (e[0], e[1]),
    )
)
def test_pagerank_bounds(spark, edges):
    from _data_engineering_pipeline_project_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(n,) for n in "abcd"], "node string")
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    rows = pagerank(e, nodes, 0.85, 2).collect()
    assert len(rows) == 4
    total = sum(r.pagerank for r in rows)
    # teleport floor for every node; dangling mass can only leak (≤ 1)
    for r in rows:
        assert r.pagerank >= 0.15 / 4 - 1e-12
    assert total <= 1.0 + 1e-9


# --------------------------------------------------------------------------
# mixture resample semantics
# --------------------------------------------------------------------------
def test_mixture_resample_hits_target_proportions(spark):
    rows = [(i, "a") for i in range(400)] + [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string")
    weights = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0)], "src string, weight double"
    )
    kept = S.mixture_resample(df, "src", "id", weights).collect()
    by = {}
    for r in kept:
        by.setdefault(r.src, []).append(r)
    # K = min(400/1, 100/1) = 100 → b keeps all, a keeps 25%
    assert len(by["b"]) == 100
    rates = {r.src: r.keep_rate for r in kept}
    assert rates["b"] == pytest.approx(1.0, abs=0)
    assert rates["a"] == pytest.approx(0.25, abs=0)
    # realized count is binomial around 100; md5 uniform keeps it close
    assert 60 <= len(by["a"]) <= 140


def test_mixture_resample_never_oversamples(spark):
    # stratum with zero target weight is dropped entirely
    rows = [(i, "x") for i in range(50)] + [(100 + i, "y") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, src string")
    weights = spark.createDataFrame(
        [("x", 2.0), ("y", 0.0)], "src string, weight double"
    )
    kept = S.mixture_resample(df, "src", "id", weights).collect()
    assert all(r.src == "x" for r in kept)
    assert len(kept) == 50  # K = min(50/2, inf) → x keeps all


# --------------------------------------------------------------------------
# plan-shape pins for the round-3 additions
# --------------------------------------------------------------------------
_SF_PLAN = "/root/testdata/sf0.001"


def test_temperature_resample_corpus_never_shuffles(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import (
        explain_str,
        scan_summary,
    )
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        lang_temperature_resample,
    )

    df = lang_temperature_resample(spark, _SF_PLAN)
    s = scan_summary(df)
    # census agg shuffles |strata| rows; the corpus-side keep filter is a
    # broadcast join — no exchange carries the documents table
    assert s["broadcast_joins"] >= 1
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan


def test_line_dedup_two_data_shuffles(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import scan_summary
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        line_dedup_documents,
    )

    s = scan_summary(line_dedup_documents(spark, _SF_PLAN))
    # line build (doc), keep-first (line text), reassembly (doc) — the
    # doc-keyed stages reuse one partitioning; allow AQE variance but pin
    # the order of magnitude (no per-line joins, no extra exchanges)
    assert s["shuffles"] <= 4


def test_pagerank_no_cartesian_no_nested_loop_growth(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        pagerank_event_types,
    )

    plan = explain_str(pagerank_event_types(spark, _SF_PLAN))
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the 1-row census broadcasts
    # (nn appears once for the init ranks and twice per unrolled
    # iteration — teleport + replayed lineage; all are 1-row sides)
    import re

    bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    assert bnlj <= 2 * 3 + 2


def test_dup_gram_coverage_counts_stay_partial_agg(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        dup_gram_coverage_documents,
    )

    plan = explain_str(dup_gram_coverage_documents(spark, _SF_PLAN))
    # gram counting must map-side combine (partial_count before exchange)
    assert "partial_count" in plan or "partial count" in plan.lower()


# --------------------------------------------------------------------------
# image aHash + 64-bit banded Hamming pairs
# --------------------------------------------------------------------------
def _ppm(arr):
    from _data_engineering_pipeline_project_spark.multimodal.codecs import (
        encode_ppm,
    )

    return encode_ppm(arr)


def _ref_ahash(arr):
    """Pure-python reference: same integer math as codecs.ahash_images."""
    import numpy as np
    from _data_engineering_pipeline_project_spark.multimodal.codecs import (
        resize_nearest,
    )

    small = resize_nearest(arr, 8, 8).astype(np.int64)
    luma = (299 * small[..., 0] + 587 * small[..., 1] + 114 * small[..., 2]) // 1000
    mean = int(luma.sum()) // 64
    h = 0
    for bit in (luma > mean).flatten():
        h = (h << 1) | int(bit)
    return h - (1 << 64) if h >= (1 << 63) else h


def test_ahash_matches_pure_python_reference(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    arrs = [rng.randint(0, 256, (16, 12, 3)).astype(np.uint8) for _ in range(4)]
    df = spark.createDataFrame(
        [(i, bytearray(_ppm(a))) for i, a in enumerate(arrs)],
        "doc_id long, payload binary",
    )
    from _data_engineering_pipeline_project_spark.multimodal.codecs import (
        ahash_images,
    )

    got = {r.doc_id: r.ahash for r in ahash_images(df).collect()}
    for i, a in enumerate(arrs):
        assert got[i] == _ref_ahash(a), i


def test_ahash_near_dup_detects_small_edit(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    edited = base.copy()
    edited[0, 0] = [255, 255, 255]  # one pixel changed
    far = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(_ppm(base))),
            (2, bytearray(_ppm(edited))),
            (3, bytearray(_ppm(far))),
        ],
        "doc_id long, payload binary",
    )
    from _data_engineering_pipeline_project_spark.multimodal.codecs import (
        ahash_images,
    )
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        sig64_band_pairs,
    )

    sigs = ahash_images(df)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in sig64_band_pairs(sigs, "doc_id", "ahash", max_hamming=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert (1, 3) not in pairs


def test_sig64_band_pairs_pigeonhole_guarantee(spark):
    # any pair within hamming <= 3 shares a 16-bit band → always found
    import random

    random.seed(11)
    rows = []
    base = random.getrandbits(63)
    rows.append((0, base))
    flips = [1, 17, 40]  # three bits in three different bands
    sig = base
    for b in flips:
        sig ^= 1 << b
    rows.append((1, sig))
    df = spark.createDataFrame(rows, "doc_id long, sig long")
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        sig64_band_pairs,
    )

    got = sig64_band_pairs(df, "doc_id", "sig", max_hamming=3).collect()
    assert len(got) == 1 and got[0].hamming == 3


def test_cusum_finds_injected_level_shift(spark, tmp_path):
    import pandas as pd

    # 40 events at 10.00 then 40 at 20.00 → max CUSUM deviation exactly
    # at the boundary (k=40)
    vals = [10.0] * 40 + [20.0] * 40
    pdf = pd.DataFrame(
        {
            "event_id": range(80),
            "ts": pd.date_range("2024-01-01", periods=80, freq="h"),
            "user_id": 1,
            "event_type": "t",
            "value": vals,
            "props": "{}",
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        cusum_changepoint_events,
    )

    row = cusum_changepoint_events(spark, str(tmp_path)).collect()[0]
    assert row.k == 40
    # D_40 = |n*S_40 - 40*T| = |80*40000 - 40*120000| = 1_600_000
    assert row.dstat == 1_600_000


def test_cusum_single_partitioned_window_no_global_sort(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        cusum_changepoint_events,
    )

    plan = explain_str(cusum_changepoint_events(spark, _SF_PLAN))
    assert "CartesianProduct" not in plan
    # every window spec must partition by event_type — an empty
    # partition spec (windowspecdefinition starting with the sort key)
    # would be the single-partition global sort
    specs = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(" in ln
    ]
    assert specs, plan
    for ln in specs:
        assert "windowspecdefinition(event_type" in ln, ln


def test_market_basket_pair_join_is_order_keyed(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext3 import (
        market_basket_part_pairs,
    )

    plan = explain_str(market_basket_part_pairs(spark, _SF_PLAN))
    # the pair stage streams out of the per-order basket explode
    # (quadratic only in basket size), never a cartesian/theta join
    # over parts — and since r8 there is no pair JOIN at all: pairs
    # come from Generate(explode) over the collect_set aggregate
    assert "CartesianProduct" not in plan
    assert "l_orderkey" in plan
    assert "collect_set" in plan and "explode" in plan


def test_hits_star_graph_hub_vs_authority(spark):
    from _data_engineering_pipeline_project_spark.operators.graph import hits

    # star: h -> x, h -> y (h is the only hub; x,y are pure authorities)
    edges = spark.createDataFrame(
        [("h", "x", 1), ("h", "y", 2)], "src string, dst string, w long"
    )
    nodes = spark.createDataFrame([("h",), ("x",), ("y",)], "node string")
    r = {row.node: row for row in hits(edges, nodes, 2).collect()}
    assert r["h"].hub == 1.0  # max-normalized top hub
    assert r["h"].authority == 0.0  # nothing points at h
    assert r["x"].hub == 0.0 and r["y"].hub == 0.0
    assert r["y"].authority == 1.0  # heavier edge wins the max
    assert 0 < r["x"].authority < 1


def test_text_normalize_planted_edges(spark, tmp_path):
    """Control chars -> space, whitespace runs collapse, trim,
    lowercase; already-clean text is unchanged (was_changed False,
    chars_removed 0); non-ASCII letters survive untouched."""
    import pyspark.sql.functions as F

    from _data_engineering_pipeline_project_spark.queries_ext2 import (
        text_normalize_documents,
    )

    rows = [
        (1, "Hello\tWorld\x01\x02  again "),  # tab+ctrl+runs+trailing
        (2, "clean text"),                      # fixed point
        (3, "  MiXeD Case\n\nLines  "),
        (4, "café Über"),             # non-ASCII preserved
    ]
    spark.createDataFrame(rows, "doc_id int, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in text_normalize_documents(spark, str(tmp_path)).collect()
    }
    exp = {
        1: "hello world again",
        2: "clean text",
        3: "mixed case lines",
        4: "café über",
    }
    md5 = {
        k: spark.range(1).select(F.md5(F.lit(v))).collect()[0][0]
        for k, v in exp.items()
    }
    for k, v in exp.items():
        assert out[k].norm_fp == md5[k], (k, v)
        assert out[k].chars_removed == len(rows[k - 1][1]) - len(v)
    assert out[2].was_changed is False and out[2].chars_removed == 0
    assert out[1].was_changed is True


def test_market_basket_hyper_order_capped(spark):
    """A planted wholesale order wider than _BASKET_MAX_WIDTH must be
    dropped before the |basket|² pair self-join; the clean orders'
    supports, n_orders, and lift are computed WITHOUT it."""
    from _data_engineering_pipeline_project_spark import queries_ext3 as Q
    import os
    import tempfile

    from pyspark.sql import Row

    cap = Q._BASKET_MAX_WIDTH
    # three clean orders of {10, 11} -> pair support 3 (passes n_ab>=3),
    # n_orders=3, lift = (3/3)/((3/3)*(3/3)) = 1.0; the mega order
    # would otherwise add itself to every count
    li = spark.createDataFrame(
        [Row(l_orderkey=k, l_partkey=p) for k in (1, 2, 3) for p in (10, 11)]
        + [Row(l_orderkey=9, l_partkey=p) for p in range(10, 10 + cap + 50)]
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        got = Q.market_basket_part_pairs(spark, d).collect()
    assert [(r["part_a"], r["part_b"], r["n_ab"], r["n_a"], r["n_b"],
             r["lift"]) for r in got] == [(10, 11, 3, 3, 3, 1.0)]
