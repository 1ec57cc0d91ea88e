"""Adversarial-data robustness sweep (VERDICT r10 brief #7).

The oracle testdata is well-behaved; these fixtures are not: empty
tables, 1-row tables, all-NULL and constant columns, unicode/emoji
keys, and extreme doubles. Each case pins no-crash PLUS a sensible,
documented output — the discipline the z-key constant-column test
started, extended across the quality family, dedup, text analysis,
BM25 serving, SCD2, and the layout writers."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

EMOJI_KEYS = ["🦀", "naïve-café", "木漏れ日", "", "a\tb", "🦀"]  # dup + empty


@pytest.fixture(scope="module")
def empty_orders(spark):
    return spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_totalprice double"
    )


# --- quality family -----------------------------------------------------


def test_pk_validation_hostile(spark, empty_orders):
    from _data_engineering_pipeline_project_spark.operators.quality import (
        validate_primary_keys,
    )

    # empty table: no violations, nothing kept, schema stable
    r = validate_primary_keys(empty_orders, ["o_orderkey"])
    assert r.violations.count() == 0 and r.cleaned.count() == 0
    assert r.violations.columns == [*empty_orders.columns, "issue"]

    # all-NULL PK: every row is a null_pk violation, none kept
    allnull = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k string, v string"
    )
    r = validate_primary_keys(allnull, ["k"])
    assert r.cleaned.count() == 0
    assert {x["issue"] for x in r.violations.collect()} == {"null_pk"}

    # emoji/unicode/empty-string keys: the duplicate 🦀 is caught
    # keep-first; the empty STRING key is a value, not a NULL
    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(EMOJI_KEYS)], "k string, v int"
    )
    r = validate_primary_keys(df, ["k"], order_by=["v"])
    viol = r.violations.collect()
    assert len(viol) == 1 and viol[0]["k"] == "🦀" and viol[0]["v"] == 5
    assert r.cleaned.count() == 5


def test_fk_validation_hostile(spark):
    from _data_engineering_pipeline_project_spark.operators.quality import (
        validate_foreign_keys,
    )

    child = spark.createDataFrame(
        [("🦀", 1), (None, 2), ("missing", 3)], "fk string, v int"
    )
    parent = spark.createDataFrame([("🦀",)], "pk string")
    r = validate_foreign_keys(child, ["fk"], parent, ["pk"])
    assert [x["fk"] for x in r.violations.collect()] == ["missing"]
    # NULL FK kept (the reference's ~isnull guard), match kept
    assert sorted(x["v"] for x in r.cleaned.collect()) == [1, 2]

    # empty PARENT: every non-null FK is an orphan, null FK still kept
    r = validate_foreign_keys(
        child, ["fk"], parent.filter(F.lit(False)), ["pk"]
    )
    assert r.violations.count() == 2 and r.cleaned.count() == 1


def test_null_counts_and_negatives_hostile(spark, empty_orders):
    from _data_engineering_pipeline_project_spark.operators.quality import (
        check_nulls,
        detect_negative_values,
    )

    # empty table: one row per column, all zero
    rows = {r["column"]: r["null_count"] for r in check_nulls(empty_orders).collect()}
    assert rows == {c: 0 for c in empty_orders.columns}

    # all-NULL and constant columns count exactly
    df = spark.createDataFrame(
        [(None, 7, -1e308), (None, 7, 1e308), (None, 7, 0.0)],
        "n string, c int, x double",
    )
    rows = {r["column"]: r["null_count"] for r in check_nulls(df).collect()}
    assert rows == {"n": 3, "c": 0, "x": 0}

    # extreme negative double IS flagged; no-numeric-columns is empty,
    # not a crash
    r = detect_negative_values(df)
    assert [x["issue"] for x in r.violations.collect()] == ["negative:x"]
    r2 = detect_negative_values(df.select("n"))
    assert r2.violations.count() == 0


def test_chronology_hostile(spark):
    from _data_engineering_pipeline_project_spark.operators.quality import (
        check_chronological_order,
        check_date_inversion,
    )

    # all-NULL timestamps: skip-null semantics -> no violations
    df = spark.createDataFrame(
        [(None, None), (None, None)], "t1 timestamp, t2 timestamp"
    )
    assert check_chronological_order(df, ["t1", "t2"]).violations.count() == 0
    assert check_date_inversion(df, "t1", "t2").violations.count() == 0

    # 1-row inversion still caught
    one = spark.createDataFrame(
        [(datetime(2024, 1, 2), datetime(2024, 1, 1))],
        "t1 timestamp, t2 timestamp",
    )
    assert check_date_inversion(one, "t1", "t2").violations.count() == 1


# --- dedup / text analysis ----------------------------------------------


def test_dedup_hostile(spark):
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        exact_duplicate_groups,
        ngram_jaccard_pairs,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_duplicate_groups(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0

    one = spark.createDataFrame([(1, "just one doc here")], "doc_id long, text string")
    assert exact_duplicate_groups(one).count() == 0
    assert ngram_jaccard_pairs(one).count() == 0  # no self-pairs

    # docs SHORTER than the shingle width produce no shingles, and an
    # emoji-only duplicate pair is still an exact-duplicate group
    short = spark.createDataFrame(
        [(1, "ab"), (2, "ab"), (3, "🦀 🦀 🦀 🦀"), (4, "🦀 🦀 🦀 🦀")],
        "doc_id long, text string",
    )
    assert ngram_jaccard_pairs(short, n=5).count() == 0
    groups = exact_duplicate_groups(short).collect()
    assert sorted(g["keep_id"] for g in groups) == [1, 3]


def test_textstats_hostile(spark):
    from _data_engineering_pipeline_project_spark.operators.textstats import (
        language_id,
        quality_metrics,
        token_count,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "🦀🦀🦀"), (3, None), (4, "   ")],
        "doc_id int, text string",
    )
    # token_count is the documented whitespace-SPLIT convention, which
    # counts an empty/whitespace-only string as ONE empty token — in
    # BOTH engines (every oracle twin mirrors the same len(split())),
    # so the convention is cross-engine stable rather than "fixed" on
    # one side only; curation pipelines filter empty docs upstream
    # (quality_metrics exposes the length for exactly that). NULL text
    # stays NULL. Pinned so a future "fix" can't silently desync the
    # token-count family's oracles.
    counts = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count("text").alias("n")
        ).collect()
    }
    assert counts == {1: 1, 2: 1, 3: None, 4: 1}
    # the scoring operators must not crash and must emit one row per doc
    assert quality_metrics(df.fillna({"text": ""})).count() == 4
    assert language_id(df.fillna({"text": ""})).count() == 4


# --- BM25 serving -------------------------------------------------------


def test_bm25_hostile(spark, tmp_path):
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_scores,
        bm25_scores_from_index,
        load_bm25_index,
        save_bm25_index,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    # empty query bag: zero scores, no crash
    assert bm25_scores(docs, []).count() == 0

    # EMPTY corpus: the artifact builds, loads, and serves zero rows
    empty = spark.createDataFrame([], "doc_id int, text string")
    path = str(tmp_path / "bm25_empty")
    save_bm25_index(empty, path, num_files=2)
    idx = load_bm25_index(spark, path)
    assert bm25_scores_from_index(idx, ["x"]).count() == 0
    assert idx["stats"].collect()[0]["n_docs"] == 0

    # maintainer fed an EMPTY batch: version advances, stats stay exact,
    # and a later real batch serves correctly
    m = Bm25Maintainer(spark, str(tmp_path / "maint"), files_per_batch=1)
    m.merge_batch(empty, batch_id=0)
    m.merge_batch(docs, batch_id=1)
    assert m.version == 2
    stats = m.serve_index()["stats"].collect()[0]
    assert stats["n_docs"] == 1
    assert bm25_scores_from_index(m.serve_index(), ["a"]).count() == 1


# --- SCD2 ----------------------------------------------------------------


def test_scd2_empty_batch_tombstones_then_reappears(spark, tmp_path):
    """An EMPTY incoming batch is a full snapshot saying "no keys
    exist": every current row tombstones (is_deleted), nothing crashes,
    and a later batch resurrects keys with history intact."""
    from _data_engineering_pipeline_project_spark.operators.scd2 import Scd2Table

    t = Scd2Table(spark, str(tmp_path / "t"), ["id"])
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    t.merge(b1, datetime(2024, 1, 1))
    t.merge(
        spark.createDataFrame([], "id int, v string"), datetime(2024, 1, 2)
    )
    cur = {r["id"]: r["is_deleted"] for r in t.current().collect()}
    assert cur == {1: True, 2: True}
    t.merge(
        spark.createDataFrame([(1, "a3")], "id int, v string"),
        datetime(2024, 1, 3),
    )
    cur = {
        r["id"]: (r["v"], r["is_deleted"]) for r in t.current().collect()
    }
    assert cur[1] == ("a3", False) and cur[2] == ("b", True)
    assert t.history().count() >= 2  # archive survived the wipe


# --- layout writers -------------------------------------------------------


def test_layout_hostile(spark, tmp_path):
    from _data_engineering_pipeline_project_spark.operators.layout import (
        equi_depth_bounds,
        quantized_equi_depth,
        with_zorder_key,
        write_zordered_quantized,
    )

    # EMPTY table: stats row is all-NULL, keys coalesce, write succeeds
    empty = spark.createDataFrame([], "a double, b double")
    assert with_zorder_key(empty, ["a", "b"]).count() == 0
    p = str(tmp_path / "empty")
    write_zordered_quantized(empty, p, ["a", "b"], num_files=2)
    assert spark.read.parquet(p).count() == 0

    # extreme doubles: the span (2e308) overflows to +inf and the whole
    # column collapses to the curve origin — the documented degenerate-
    # to-one-bucket class (same convention as twopass's ±inf envelope):
    # layout quality degrades, keys stay non-NULL, content is preserved
    ext = spark.createDataFrame(
        [(-1e308, 1.0), (1e308, 2.0), (0.0, 3.0)], "a double, b double"
    )
    keys = [r["z_key"] for r in with_zorder_key(ext, ["a"]).collect()]
    assert keys == [0, 0, 0]
    # ... and equi-depth quantization HANDLES the same data (finite
    # quantile boundaries), which is exactly why the mode exists
    bounds = equi_depth_bounds(ext, "a", bits=4)
    qs = sorted(
        r["q"]
        for r in ext.select(
            quantized_equi_depth(F.col("a"), bounds).alias("q")
        ).collect()
    )
    assert len(set(qs)) == 3  # three distinct buckets, not one

    # constant column: bounds collapse to one value, everything lands in
    # one bucket, the write still round-trips
    const = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "a double")
    assert equi_depth_bounds(const, "a", bits=4) == [5.0]
    p2 = str(tmp_path / "const")
    write_zordered_quantized(const, p2, ["a"], bits=4, num_files=2, quantize="equi_depth")
    assert spark.read.parquet(p2).count() == 3

    # 1-row table
    p3 = str(tmp_path / "one")
    write_zordered_quantized(
        spark.createDataFrame([(1.0, 2.0)], "a double, b double"),
        p3,
        ["a", "b"],
        num_files=2,
    )
    assert spark.read.parquet(p3).collect()[0]["a"] == 1.0


def test_bloom_hostile(spark):
    """Round-10 wave 2 discipline for the membership tier: an EMPTY
    corpus builds an empty words relation and every probe is a clean
    non-member (no crash, no NULL flags); a NULL probe key gets a NULL
    flag (membership of NULL is undefined, never a false claim);
    duplicate emoji keys round-trip."""
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators import (
        membership as M,
    )

    empty = spark.createDataFrame([], "k string")
    words = M.bloom_build(empty, F.col("k"), 1 << 10, 3)
    assert words.count() == 0

    probe = spark.createDataFrame([("x",), (None,)], "k string")
    got = {r["k"]: r["bloom_member"] for r in M.bloom_probe(
        words, probe, F.col("k"), 1 << 10, 3
    ).collect()}
    assert got["x"] is False
    assert got[None] is None  # NULL key -> NULL verdict, not false/true

    emo = spark.createDataFrame([(k,) for k in EMOJI_KEYS], "k string")
    w2 = M.bloom_build(emo, F.col("k"), 1 << 10, 3)
    back = M.bloom_probe(w2, emo, F.col("k"), 1 << 10, 3).collect()
    assert len(back) == len(EMOJI_KEYS)
    assert all(r["bloom_member"] for r in back)


def test_skew_audit_hostile(spark, empty_orders):
    """Empty table: no rows, no division-by-zero; single-key table:
    skew_factor = partitions exactly and salt = partitions."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        join_skew_audit,
    )

    assert (
        join_skew_audit(empty_orders, ["o_orderkey"], partitions=8).count()
        == 0
    )

    one = spark.createDataFrame([("k",)] * 40, "g string")
    r = join_skew_audit(one, ["g"], partitions=8).collect()
    assert len(r) == 1
    assert r[0]["share"] == 1.0
    assert r[0]["skew_factor"] == 8.0
    assert r[0]["recommended_salt"] == 8


def test_matryoshka_hostile(spark):
    """k larger than the corpus: recall is computed over the rows that
    exist (baseline = all neighbors), never a crash; a zero query set
    yields an empty audit."""
    from pyspark.sql import functions as F

    from _data_engineering_pipeline_project_spark.operators import (
        similarity as SIM,
    )

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    out = SIM.matryoshka_recall_audit(
        emb, emb.filter(F.col("vec_id") == 0), cuts=(4, 8), k=10
    ).collect()
    # 2 cuts x 1 query; only 2 neighbors exist -> n_overlap <= 2
    assert len(out) == 2
    assert all(r["n_overlap"] <= 2 for r in out)
    full = [r for r in out if r["prefix_dim"] == 8][0]
    assert full["n_overlap"] == 2

    none = SIM.matryoshka_recall_audit(
        emb, emb.filter(F.col("vec_id") < 0), cuts=(4, 8), k=3
    )
    assert none.count() == 0


def test_pca_hostile(spark):
    """Constant embeddings: zero covariance, zero eigenvalues, scree
    fractions well-defined (no 0/0); projection of constants is the
    zero vector. Empty relation: loud error, not a zeros model."""
    import pytest

    from _data_engineering_pipeline_project_spark.operators import pca as P

    const = spark.createDataFrame(
        [(i, [2.5] * 8) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    model = P.pca_fit(const, dim=8)
    assert all(abs(e) < 1e-12 for e in model["eigenvalues"])
    scree = P.variance_explained(model)
    assert all(0.0 <= f <= 1.0 or f == 0.0 for _, _, f in scree)
    proj = P.pca_project(const, model, r=2).collect()
    assert all(
        abs(x) < 1e-9 for r in proj for x in r["projected"]
    )  # centered constants

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty relation"):
        P.pca_fit(empty, dim=8)
