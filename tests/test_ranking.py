"""Unit tests for ranking (TF-IDF / BM25 / vocab coverage), containment
pairs, and kNN label voting — hand-computed expectations on tiny frames
(the DuckDB oracle twins cover the sf-scale parity; these pin the math)."""

from __future__ import annotations

import math

import pytest

from _data_engineering_pipeline_project_spark.operators import ranking as R
from _data_engineering_pipeline_project_spark.operators.dedup import (
    containment_pairs,
)
from _data_engineering_pipeline_project_spark.operators.similarity import (
    knn_label_vote,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_top_terms(docs):
    rows = R.tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=2 df=1 idf=ln(4/2)+1; banana tf=1 df=2 idf=ln(4/3)+1
    top = by_doc[1][0]
    assert top.term == "apple" and top.rnk == 1
    assert top.tfidf == pytest.approx(2 * (math.log(4 / 2) + 1), abs=1e-6)
    # every doc has <= 2 ranked terms, ranks contiguous from 1
    for doc_rows in by_doc.values():
        assert sorted(r.rnk for r in doc_rows) == list(
            range(1, len(doc_rows) + 1)
        )


def test_bm25_postings_only_query_terms(docs):
    per = R.bm25_per_term_contrib(docs, ["cherry", "zzz"]).collect()
    assert {r.term for r in per} == {"cherry"}  # absent term: no postings
    assert {r.doc_id for r in per} == {2, 3}
    # doc 3 has tf=3 of 'cherry' → bigger contribution than doc 2's tf=1
    c = {r.doc_id: r.contrib for r in per}
    assert c[3] > c[2] > 0


def test_bm25_scores_formula(docs):
    out = {r.doc_id: r.bm25 for r in R.bm25_scores(docs, ["banana"]).collect()}
    # N=3, df=2, idf=ln(1 + 1.5/2.5); doc1: tf=1, dl=3, avgdl=3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    expect1 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / 3))
    assert out[1] == pytest.approx(expect1, abs=1e-4)
    assert set(out) == {1, 2}


def test_vocab_coverage_monotone(docs):
    rows = sorted(R.vocab_coverage(docs, top_n=3).collect(), key=lambda r: r.rnk)
    assert [r.term for r in rows] == ["cherry", "apple", "banana"]
    # shares sum to cum_share; cumulative is monotone, ends < 1 (durian cut)
    assert rows[0].cum_share == rows[0].share
    assert rows[-1].cum_share < 1.0
    assert all(
        a.cum_share < b.cum_share for a, b in zip(rows, rows[1:])
    )


def test_containment_asymmetric(spark):
    # b embeds a's entire shingle set; a is 100% contained, b is not
    a_text = "one two three four five"
    b_text = a_text + " six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(1, a_text), (2, b_text)], "doc_id long, text string"
    )
    rows = {
        (r.a_id, r.b_id): r.containment
        for r in containment_pairs(df, threshold=0.0).collect()
    }
    assert rows[(1, 2)] == 1.0
    assert rows[(2, 1)] < 1.0


def test_knn_label_vote_majority(spark):
    # 1-D embeddings: two tight clusters; query vec sits in cluster 0
    vecs = [
        (0, [1.0, 0.0], 7),  # query
        (1, [0.9, 0.1], 0),
        (2, [0.8, 0.2], 0),
        (3, [0.95, 0.05], 1),
        (4, [-1.0, 0.0], 1),
        (5, [-0.9, -0.1], 1),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int"
    )
    out = knn_label_vote(emb, emb.filter("vec_id = 0"), k=3).collect()
    assert len(out) == 1
    r = out[0]
    # 3 nearest to [1,0] are vecs 1,2,3 → labels {0,0,1} → majority 0
    assert r.query_id == 0 and r.true_label == 7
    assert r.predicted_label == 0 and r.n_votes == 2


def test_semantic_dup_pairs_subset_of_bruteforce(spark):
    """Every semantic pair is a true pair (precision 1 — exact cosine
    verify), and recall against brute force is the within-cluster
    fraction (both vectors must land in one list)."""
    import math

    from _data_engineering_pipeline_project_spark.operators.similarity import (
        cosine_dup_pairs,
        semantic_dup_pairs,
    )

    vecs = [
        (i, [math.cos(i * 0.1), math.sin(i * 0.1)]) for i in range(40)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    sem = {
        (r.vec_a, r.vec_b): r.cosine
        for r in semantic_dup_pairs(emb, threshold=0.95, num_centroids=4).collect()
    }
    brute = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_dup_pairs(emb, threshold=0.95).collect()
    }
    assert sem  # non-trivial
    assert set(sem) <= set(brute)  # precision 1
    for k, v in sem.items():
        assert brute[k] == v  # identical exact cosines
    assert len(sem) / len(brute) > 0.5  # reasonable recall on smooth data


def test_bm25_no_matching_terms_empty(docs):
    assert R.bm25_scores(docs, ["zzz", "qqq"]).count() == 0


def test_tfidf_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert R.tfidf_top_terms(empty).count() == 0


def test_vocab_coverage_fewer_terms_than_topn(docs):
    rows = R.vocab_coverage(docs, top_n=100).collect()
    assert len(rows) == 4  # only 4 distinct terms exist
    assert max(r.cum_share for r in rows) == 1.0


def test_containment_empty_and_short_docs(spark):
    # docs below shingle length produce no shingles → no pairs, no crash
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d e")],
        "doc_id long, text string",
    )
    assert containment_pairs(df, threshold=0.0).count() == 0


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None), (5, 3)],
        "doc_id long, w int",
    )
    rows = weighted_sample(df, "w", k=10, id_col="doc_id").collect()
    assert {r.doc_id for r in rows} == {1, 5}
