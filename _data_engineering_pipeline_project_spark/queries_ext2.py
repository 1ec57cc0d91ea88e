"""Round-3 extension queries: lexical ranking (TF-IDF / BM25 /
vocabulary coverage), stratified sampling, cross-corpus incremental
dedup, shingle containment, kNN label voting, and events-table
statistical operators (co-occurrence, z-score outliers, range-frame
rolling windows). Each query has a DuckDB oracle twin; float scores are
rounded BEFORE ranking so ulp-level ln()/accumulation differences
between the JVM and libm never flip a row_number (the convention
similarity.topk_cosine_bruteforce established).

Registered into the same QUERIES/ORACLES maps as the reference-parity
queries (imported for side effects from __spark_entry__)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.catalog import table
from _data_engineering_pipeline_project_spark.operators import dedup as D
from _data_engineering_pipeline_project_spark.operators import ranking as R
from _data_engineering_pipeline_project_spark.operators import similarity as SIM
from _data_engineering_pipeline_project_spark.operators import textstats as TS
from _data_engineering_pipeline_project_spark.queries import query

# lowercased whitespace tokenization, mirrored from textstats.tokens
_TOK2 = r"""
    tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
                                                     '\s+')) AS term
            FROM documents),
    tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0)
"""


# --------------------------------------------------------------------------
# Lexical ranking / vocabulary
# --------------------------------------------------------------------------
@query(
    "tfidf_top_terms_documents",
    f"""
    WITH {_TOK2},
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * (ln((n_docs + 1) / (df + 1)) + 1.0), 6) AS tfidf
      FROM tf JOIN dfreq USING (term), n)
    SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
)
def tfidf_top_terms_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 smoothed TF-IDF terms (keyword extraction)."""
    return R.tfidf_top_terms(table(spark, sf, "documents"), top_n=3)


_BM25_TERMS = ("table", "value", "fast")


@query(
    "bm25_search_documents",
    f"""
    WITH {_TOK2},
    dl AS (SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\\s+'))
                       AS INTEGER) AS dl
           FROM documents),
    scal AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
           WHERE term IN ('table', 'value', 'fast') GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS c
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), scal)
    SELECT doc_id,
           round(coalesce(max(CASE WHEN term = 'table' THEN c END), 0)
                 + coalesce(max(CASE WHEN term = 'value' THEN c END), 0)
                 + coalesce(max(CASE WHEN term = 'fast' THEN c END), 0),
                 4) AS bm25
    FROM contrib GROUP BY doc_id
    """,
)
def bm25_search_documents(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query bag.

    The per-term contributions are summed in FIXED term order (one
    conditional max per term — each (doc, term) group has exactly one
    row) so the 3-double addition happens in the same order in both
    engines; a commutative SUM would expose accumulation-order ulps."""
    d = table(spark, sf, "documents")
    per_term = R.bm25_per_term_contrib(d, list(_BM25_TERMS))
    agg = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("contrib"))), F.lit(0.0)
        ).alias(f"__c{i}")
        for i, t in enumerate(_BM25_TERMS)
    ]
    out = per_term.groupBy("doc_id").agg(*agg)
    total = F.col("__c0")
    for i in range(1, len(_BM25_TERMS)):
        total = total + F.col(f"__c{i}")
    return out.select("doc_id", F.round(total, 4).alias("bm25"))


@query(
    "vocab_coverage_top30",
    f"""
    WITH {_TOK2},
    counts AS (SELECT term, count(*) AS n FROM tok2 GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
    top AS (SELECT term, n,
                   row_number() OVER (ORDER BY n DESC, term) AS rnk
            FROM counts QUALIFY rnk <= 30)
    SELECT term, n, CAST(rnk AS INTEGER) AS rnk,
           round(n / CAST(total AS DOUBLE), 6) AS share,
           round(CAST(sum(n) OVER (ORDER BY n DESC, term
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 / CAST(total AS DOUBLE), 6) AS cum_share
    FROM top, tot
    """,
)
def vocab_coverage_top30(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-vocabulary design curve: corpus coverage of the top-30
    tokens (running share over the post-aggregation top-N only)."""
    return R.vocab_coverage(table(spark, sf, "documents"), top_n=30)


# --------------------------------------------------------------------------
# Sampling / cross-corpus dedup / containment
# --------------------------------------------------------------------------
@query(
    "stratified_sample_by_lang",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents)
    SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= CAST(ceil(0.2 * n_lang) AS BIGINT)
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 20% stratified sample per language: rank docs
    within each stratum by md5(doc_id) (a seedless portable shuffle) and
    keep the first ceil(0.2·|stratum|). Exact per-stratum proportions —
    what Bernoulli ``sample()`` can't promise — while staying fully
    distributed: one window shuffle on the (bounded-cardinality) lang
    key; at scale, salt the window by hash-prefix if one stratum
    dominates."""
    d = table(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wc = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_lang"),
        )
        .filter(
            F.col("rn") <= F.ceil(F.lit(0.2) * F.col("n_lang")).cast("long")
        )
        .select("doc_id", "lang", "rn")
    )


@query(
    "cross_dedup_new_vs_corpus",
    r"""
    WITH fp AS (
      SELECT doc_id, source,
             CAST(regexp_extract(source, '(\d+)$', 1) AS INTEGER) AS src_n,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents),
    corpus AS (SELECT fp, min(doc_id) AS matched_corpus_doc
               FROM fp WHERE src_n < 10 GROUP BY fp)
    SELECT n.doc_id, n.source,
           (c.matched_corpus_doc IS NOT NULL) AS is_dup,
           c.matched_corpus_doc
    FROM fp n LEFT JOIN corpus c USING (fp)
    WHERE n.src_n >= 10
    """,
)
def cross_dedup_new_vs_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-ingest dedup: annotate each NEW-batch document
    (sources src10+) with whether its exact fingerprint already exists
    in the standing corpus (src0–src9) and the smallest matching corpus
    doc_id. The corpus side pre-aggregates to one row per fingerprint
    before the join — at 100 TB that's the shape that keeps the join
    input |distinct fingerprints|, not |corpus|, and the md5 join key is
    uniform so no skew. New batches are typically ≪ corpus, so AQE
    broadcasts the batch side."""
    d = table(spark, sf, "documents").withColumn(
        "src_n", F.regexp_extract("source", r"(\d+)$", 1).cast("int")
    )
    fp = d.select("doc_id", "source", "src_n", TS.fingerprint("text").alias("fp"))
    corpus = (
        fp.filter(F.col("src_n") < 10)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("matched_corpus_doc"))
    )
    return (
        fp.filter(F.col("src_n") >= 10)
        .join(corpus, "fp", "left")
        .select(
            "doc_id",
            "source",
            F.col("matched_corpus_doc").isNotNull().alias("is_dup"),
            "matched_corpus_doc",
        )
    )


_SHINGLES_SQL = (
    "list_distinct(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(generate_series(1, len(toks)-2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [] END)"
)


@query(
    "containment_pairs_documents",
    rf"""
    WITH tokd AS (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '\s+') AS toks
                  FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle FROM tokd),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    shf AS (SELECT sh.doc_id, sh.shingle
            FROM sh JOIN dfreq USING (shingle) WHERE df <= 5),
    sizes AS (SELECT doc_id, count(*) AS n_a FROM shf GROUP BY 1),
    inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS common
              FROM shf x JOIN shf y
                ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
              GROUP BY 1, 2)
    SELECT i.a_id, i.b_id, i.common, s.n_a,
           round(CAST(i.common AS DOUBLE) / s.n_a, 6) AS containment
    FROM inter i JOIN sizes s ON s.doc_id = i.a_id
    WHERE CAST(i.common AS DOUBLE) / s.n_a >= 0.4
    """,
)
def containment_pairs_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Directed shingle containment ≥ 0.4 over the df-capped shingle
    universe — finds near-subset (excerpt/boilerplate) relations that
    symmetric Jaccard under-scores."""
    return D.containment_pairs(
        table(spark, sf, "documents"), threshold=0.4, max_shingle_df=5
    )


# --------------------------------------------------------------------------
# Embeddings: kNN classification
# --------------------------------------------------------------------------
@query(
    "knn_label_vote_embeddings",
    """
    WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id % 25 = 0),
    scored AS (
      SELECT q.query_id, q.true_label, e.vec_id AS neighbor_id, e.label,
             round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
      FROM embeddings e, q WHERE e.vec_id <> q.query_id),
    knn AS (SELECT query_id, true_label, label
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rnk
                  FROM scored)
            WHERE rnk <= 5),
    votes AS (SELECT query_id, true_label, label, count(*) AS n_votes
              FROM knn GROUP BY 1, 2, 3)
    SELECT query_id, true_label, label AS predicted_label, n_votes
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY n_votes DESC, label) AS vr
          FROM votes)
    WHERE vr = 1
    """,
)
def knn_label_vote_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """kNN majority-vote labels for every 25th vector against the rest
    of the corpus (weak-annotation primitive)."""
    emb = table(spark, sf, "embeddings")
    return SIM.knn_label_vote(emb, emb.filter(F.col("vec_id") % 25 == 0), k=5)


# --------------------------------------------------------------------------
# Events: co-occurrence, outliers, range-frame rolling windows
# --------------------------------------------------------------------------
@query(
    "event_type_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def event_type_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence: users having BOTH event types, for
    every unordered type pair. The self-join is keyed on user_id (AQE
    co-partitions both sides from the same distinct-shuffle), and rows
    per user are bounded by the event-type cardinality, so pair fan-out
    is O(users · types²) with small types — linear in users at scale."""
    ev = table(spark, sf, "events")
    ut = (
        ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "event_type")
        .distinct()
    )
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "zscore_outliers_events",
    """
    WITH stats AS (SELECT event_type, avg(value) AS m,
                          stddev_samp(value) AS s
                   FROM events WHERE value IS NOT NULL GROUP BY 1)
    SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
           round((e.value - st.m) / st.s, 3) AS z
    FROM events e JOIN stats st USING (event_type)
    WHERE e.value IS NOT NULL AND st.s > 0
      AND abs((e.value - st.m) / st.s) > 2.5
    """,
)
def zscore_outliers_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type z-score anomaly detection (|z| > 2.5). The per-type
    moments aggregate is tiny and broadcast back onto the fact scan —
    one shuffle for the agg, zero for the join-back at scale."""
    ev = table(spark, sf, "events").filter(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    )
    z = (F.col("value") - F.col("m")) / F.col("s")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("s") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 3).alias("z"),
        )
    )


@query(
    "rolling_user_value_6h",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_win,
           round(sum(value) OVER w, 2) AS sum_win
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_user_value_6h(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time rolling 6-hour window per user via a RANGE frame on
    microsecond epochs (sub-second precision preserved — unix_timestamp
    would truncate and shift frame edges; timestampdiff on the NTZ
    column avoids a timezone-dependent cast). Range frames are Spark's
    native windowed-scan: one shuffle on user_id, sequential frame walk
    per partition, no self-join. Peers at identical timestamps are frame
    peers in both engines."""
    ev = table(spark, sf, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-21_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.round(F.sum("value").over(w), 2).alias("sum_win"),
    )
