"""Lexical ranking & vocabulary operators: TF-IDF, BM25, corpus
vocabulary coverage.

These extend the engine's text-analysis family (textstats.py) with the
scoring operators a training-data pipeline uses for keyword-based corpus
slicing, retrieval-style relevance filtering, and tokenizer-vocabulary
design. Everything is expressed as DataFrame aggregations over an
exploded token relation — groupBy shuffles on (doc_id, term) and (term),
both high-cardinality uniform keys, so the plans scale linearly with
corpus size on a multi-executor cluster. The only corpus-global scalars
(N, avgdl) travel through a broadcast of a 1-row aggregate, never a
driver collect.

Float determinism across engines (for the DuckDB oracle twins): every
score is ``round()``-ed BEFORE ranking, the same convention
similarity.topk_cosine_bruteforce documents — ln() in the JVM and libm
may differ in the last ulp, and ranking on the rounded value keeps
row_number stable in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators import textstats as TS


def _token_relation(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc, term) pairs — one row per token occurrence, empties dropped."""
    return docs.select(
        F.col(id_col),
        F.explode(TS.tokens(text_col)).alias("term"),
    ).filter(F.length("term") > 0)


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-``top_n`` terms per document by smoothed TF-IDF.

    tf = raw in-document count; idf = ln((N+1)/(df+1)) + 1 (the
    scikit-style smooth variant so unseen/ubiquitous terms stay finite).
    Two shuffles total — groupBy(doc, term) then groupBy(term) — plus a
    per-document window whose partitions are bounded by document vocab
    size, never corpus size. N joins in via a broadcast 1-row aggregate.
    """
    toks = _token_relation(docs, text_col, id_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf"),
            F.col("df"),
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                round_digits,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(id_col, "term", "tf", "df", "tfidf", "rnk")
    )


def bm25_per_term_contrib(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, term) BM25 contributions for a fixed bag of query terms
    (the retrieval-style corpus-slicing primitive).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); the doc-length norm uses
    whitespace token counts. The postings for the query bag are a
    FILTERED slice of the (doc, term) relation — the full term
    dictionary is never shuffled, so cost is O(postings of the query
    terms), the inverted-index access path re-expressed relationally.
    Returns (id, term, contrib) unrounded; callers choosing cross-engine
    exactness should combine terms in a FIXED order (see
    ``bm25_scores``'s note) rather than a commutative SUM.
    """
    toks = _token_relation(docs, text_col, id_col)
    qset = [t.lower() for t in query_terms]
    # document lengths + corpus scalars (N, avgdl) — one agg each
    dl = docs.select(
        F.col(id_col), TS.token_count(text_col).alias("dl")
    )
    scal = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # postings restricted to the query bag (filter pushes into the scan)
    tf = (
        toks.filter(F.col("term").isin(qset))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(df_, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scal))
        .select(F.col(id_col), F.col("term"), (idf * tf_norm).alias("contrib"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Total BM25 per document (commutative sum of the per-term
    contributions — convenient form; the oracle-checked query twin in
    queries_ext2 combines terms in fixed order instead, since a float
    SUM's accumulation order is engine-dependent)."""
    per_term = bm25_per_term_contrib(
        docs, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col
    )
    return per_term.groupBy(id_col).agg(
        F.round(F.sum("contrib"), round_digits).alias("bm25")
    )


def vocab_coverage(
    docs: DataFrame,
    top_n: int = 30,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-wide top-``top_n`` tokens with cumulative coverage share —
    the tokenizer-vocabulary design curve ("how much of the corpus do
    the K most frequent tokens cover").

    One groupBy(term) shuffle; the top-N cut is ``orderBy().limit()``
    (physical TakeOrdered — per-partition heaps merged on one reducer,
    never a global-window shuffle of the whole vocabulary), so the only
    unpartitioned windows run over the N surviving rows, matching the
    SCALE.md policy on global windows. Share divisions are single IEEE
    ops on exact longs — bit-identical across engines.
    """
    counts = (
        _token_relation(docs, text_col, "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("term"))
        .limit(top_n)
        .withColumn("rnk", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
    )
    cum = Window.orderBy(F.col("n").desc(), F.col("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.select(
        "term",
        "n",
        "rnk",
        F.round(F.col("n") / F.col("total"), round_digits).alias("share"),
        F.round(
            F.sum("n").over(cum) / F.col("total"), round_digits
        ).alias("cum_share"),
    )
