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
    return SIM.knn_label_vote(
        emb, emb.filter(F.col("vec_id") % 25 == 0), k=5, dim=64
    )


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


# --------------------------------------------------------------------------
# Sketches / statistics
# --------------------------------------------------------------------------
@query(
    "kmv_distinct_users_per_type",
    """
    WITH h AS (SELECT DISTINCT event_type AS g,
                      CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                          1, 15) AS BIGINT) AS hh
               FROM events
               WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    topk AS (SELECT g, hh FROM (
               SELECT g, hh, row_number() OVER (PARTITION BY g
                              ORDER BY hh) AS rn FROM h)
             WHERE rn <= 64),
    ex AS (SELECT event_type AS g, count(DISTINCT user_id) AS exact_distinct
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY 1)
    SELECT t.g AS event_type, count(*) AS n_kmv,
           round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                      ELSE 63 * 1152921504606846976.0
                           / CAST(max(t.hh) AS DOUBLE) END, 4)
             AS est_distinct,
           ex.exact_distinct
    FROM topk t JOIN ex ON ex.g = t.g
    GROUP BY t.g, ex.exact_distinct
    """,
)
def kmv_distinct_users_per_type(spark: SparkSession, sf: str) -> DataFrame:
    """KMV distinct-user sketch per event type, alongside the exact
    count. Unlike HLL (approx_count_distinct — engine-specific bias
    tables, only rows-only-checkable), the KMV estimate is a pure
    function of the data, so the DuckDB twin reproduces it bit-for-bit;
    and the per-partition partial pass shuffles O(k·partitions·groups)
    rows instead of every distinct value — the mergeable-sketch shape
    that survives 100 TB."""
    from _data_engineering_pipeline_project_spark.operators.sketches import (
        kmv_distinct,
    )

    ev = table(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    est = kmv_distinct(ev, "event_type", "user_id", k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_kmv", "est_distinct", "exact_distinct"
    )


# log10(1 + 1/d) for d = 1..9, as shared literals: both engines parse the
# same decimal string to the same IEEE double, so no cross-engine
# transcendental-function ulp risk
_BENFORD = (
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
)
# CAST in the VALUES: DuckDB parses bare decimal literals as DECIMAL,
# which would turn the whole chi-square pipeline into decimal arithmetic
_BENFORD_SQL = "VALUES " + ", ".join(
    f"({d + 1}, CAST({v!r} AS DOUBLE))" for d, v in enumerate(_BENFORD)
)


@query(
    "benford_first_digit_orders",
    f"""
    WITH exp(digit, expected) AS ({_BENFORD_SQL}),
    d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18, 2))
                             AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           round(c.n / CAST(t.total AS DOUBLE), 6) AS observed,
           round(e.expected, 6) AS expected,
           round(pow(c.n / CAST(t.total AS DOUBLE) - e.expected, 2)
                 / e.expected, 8) AS chi2_term
    FROM c JOIN exp e ON e.digit = c.digit, t
    """,
)
def benford_first_digit_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law audit of order totals: observed vs expected
    first-significant-digit frequencies with per-digit chi-square terms
    (a fraud/corruption screen for numeric columns). The digit is read
    from the DECIMAL(18,2) string form — identical in both engines,
    where float log10 tricks would carry boundary risk. One groupBy on
    a 9-value key; expected frequencies are broadcast literals."""
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    from _data_engineering_pipeline_project_spark.functions.localrel import (
        local_df,
    )

    exp = local_df(
        spark, [(i + 1, v) for i, v in enumerate(_BENFORD)], "digit int, expected double"
    )
    obs = F.col("n") / F.col("total").cast("double")
    return (
        c.crossJoin(F.broadcast(t))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed"),
            F.round(F.col("expected"), 6).alias("expected"),
            F.round(
                F.pow(obs - F.col("expected"), 2) / F.col("expected"), 8
            ).alias("chi2_term"),
        )
    )


@query(
    "corr_quantity_price_lineitem",
    """
    WITH s AS (SELECT count(*) AS n,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18, 2)))
                           AS DOUBLE) AS sx,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2)))
                           AS DOUBLE) AS sy,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18, 2))
                               * CAST(l_quantity AS DECIMAL(18, 2)))
                           AS DOUBLE) AS sxx,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                               * CAST(l_extendedprice AS DECIMAL(18, 2)))
                           AS DOUBLE) AS syy,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18, 2))
                               * CAST(l_extendedprice AS DECIMAL(18, 2)))
                           AS DOUBLE) AS sxy
               FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL)
    SELECT n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS corr_qty_price
    FROM s
    """,
)
def corr_quantity_price_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation computed from EXACT decimal power sums —
    unlike F.corr/corr() (streaming covariance, accumulation-order-
    dependent across engines and partitionings), decimal sums are exact
    and associative, so the final double formula is a fixed IEEE
    sequence on identical inputs: bit-reproducible on any cluster
    layout. One single-pass aggregate over the fact table (map-side
    partials, 1-row shuffle). Decimal(38,4) headroom bounds n·x² to
    ~1e34 — fine through petabyte row counts at these magnitudes."""
    li = table(spark, sf, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("n", F.round(num / den, 6).alias("corr_qty_price"))


@query(
    "weighted_sample_documents",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 15) AS BIGINT) + 1.0)
                       / 1152921504606846977.0,
                       1.0 / CAST(n_chars AS DOUBLE)), 12) AS sample_key
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0)
    SELECT doc_id, n_chars, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 50
    """,
)
def weighted_sample_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted deterministic sample of 50 documents
    (Efraimidis–Spirakis keys from portable md5 randomness; TakeOrdered
    top-k, no global sort)."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        weighted_sample,
    )

    return weighted_sample(
        table(spark, sf, "documents"), weight_col="n_chars", k=50
    )


@query(
    "semantic_dup_pairs_embeddings",
    """
    WITH seeds AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec,
             md5(CAST(vec_id AS VARCHAR)) AS h
      FROM embeddings ORDER BY h, vec_id LIMIT 16
    ),
    cent AS (
      SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER)
               AS centroid_id, cvec
      FROM seeds
    ),
    cscore AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec, c.centroid_id,
             round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS cos
      FROM embeddings e, cent c
    ),
    assigned AS (
      SELECT vec_id, vec, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cos DESC, centroid_id) AS arnk
        FROM cscore) WHERE arnk = 1
    )
    SELECT a.centroid_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.vec, b.vec)
                 / (sqrt(list_dot_product(a.vec, a.vec))
                    * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
    FROM assigned a JOIN assigned b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec))
                   * sqrt(list_dot_product(b.vec, b.vec))), 6) >= 0.4
    """,
)
def semantic_dup_pairs_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: IVF-cluster first, exact
    cosine only within clusters (quadratic stage bounded per cluster)."""
    return SIM.semantic_dup_pairs(
        table(spark, sf, "embeddings"), threshold=0.4, num_centroids=16,
        dim=64,
    )


@query(
    "binned_quantiles_events_value",
    """
    WITH vals AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                  FROM events WHERE value IS NOT NULL),
    stats AS (SELECT g, min(v) AS lo, max(v) AS hi, count(*) AS n
              FROM vals GROUP BY 1),
    binned AS (
      SELECT v.g,
             CAST(CASE WHEN s.hi = s.lo THEN 0
                  ELSE least(floor((v.v - s.lo) / ((s.hi - s.lo) / 256.0)),
                             255) END AS INTEGER) AS bin,
             count(*) AS cnt
      FROM vals v JOIN stats s ON s.g = v.g
      GROUP BY 1, 2),
    cum AS (SELECT g, bin, cnt,
                   sum(cnt) OVER (PARTITION BY g ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cnt) OVER (PARTITION BY g ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) - cnt AS cum_below
            FROM binned),
    targets AS (SELECT g, lo, hi, n, p.p, p.p * n AS target
                FROM stats, (VALUES (CAST(0.5 AS DOUBLE)),
                                    (CAST(0.9 AS DOUBLE)),
                                    (CAST(0.99 AS DOUBLE))) p(p)),
    hit AS (
      SELECT g, p, lo, hi, target, bin, cnt_d, cum_below_d FROM (
        SELECT t.g, t.p, t.lo, t.hi, t.target, c.bin,
               CAST(c.cnt AS DOUBLE) AS cnt_d,
               CAST(c.cum_below AS DOUBLE) AS cum_below_d,
               row_number() OVER (PARTITION BY t.g, t.p
                                  ORDER BY c.bin) AS rn
        FROM targets t JOIN cum c ON c.g = t.g
        WHERE c.cum >= t.target)
      WHERE rn = 1)
    SELECT g AS event_type, p,
           round(CASE WHEN hi = lo THEN lo
                 ELSE lo + ((hi - lo) / 256.0)
                      * (bin + greatest((target - cum_below_d) / cnt_d,
                                        0.0)) END, 6) AS quantile_est
    FROM hit
    """,
)
def binned_quantiles_events_value(spark: SparkSession, sf: str) -> DataFrame:
    """p50/p90/p99 of event value per type via the mergeable fixed-bin
    histogram sketch (bin counts add associatively across partitions;
    error bounded by range/256; no per-group sort of the values)."""
    from _data_engineering_pipeline_project_spark.operators.sketches import (
        binned_quantiles,
    )

    return binned_quantiles(
        table(spark, sf, "events"), "event_type", "value",
        probs=(0.5, 0.9, 0.99), bins=256,
    )


_TOKS_X = r"string_split_regex(trim(lower(text)), '\s+')"
_SHINGLES_X = (
    "list_distinct(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(generate_series(1, len(toks)-2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [] END)"
)


@query(
    "cross_near_dup_new_vs_corpus",
    rf"""
    WITH doc AS (SELECT doc_id, text,
                        CAST(regexp_extract(source, '(\d+)$', 1) AS INTEGER)
                          >= 10 AS is_new
                 FROM documents),
    tokx AS (SELECT doc_id, is_new, {_TOKS_X} AS toks FROM doc),
    shx AS (SELECT doc_id, is_new, unnest({_SHINGLES_X}) AS shingle
            FROM tokx),
    hxx AS (SELECT doc_id, is_new,
                   CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)
                     % 2147483647 AS x
            FROM shx),
    mhx AS (SELECT doc_id, t.i AS i,
                   min(((2 * t.i + 1) * x + (11 * t.i + 7)) % 2147483647)
                     AS h
            FROM hxx, unnest(generate_series(0, 31)) AS t(i)
            GROUP BY doc_id, t.i),
    bandsx AS (SELECT doc_id, i // 2 AS band,
                      string_agg(CAST(h AS VARCHAR), '-' ORDER BY i) AS sig
               FROM mhx GROUP BY doc_id, i // 2),
    flagged AS (SELECT b.doc_id, b.band, b.sig, d.is_new
                FROM bandsx b JOIN doc d USING (doc_id)),
    cand AS (SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS corpus_doc
             FROM flagged a JOIN flagged b
               ON a.band = b.band AND a.sig = b.sig
              AND a.is_new AND NOT b.is_new),
    sizes AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY doc_id),
    inter AS (SELECT c.new_doc, c.corpus_doc, count(*) AS common
              FROM cand c
              JOIN shx x ON x.doc_id = c.new_doc
              JOIN shx y ON y.doc_id = c.corpus_doc
                        AND y.shingle = x.shingle
              GROUP BY 1, 2)
    SELECT i.new_doc, i.corpus_doc,
           CAST(i.common AS DOUBLE) / (sa.n + sb.n - i.common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.new_doc
    JOIN sizes sb ON sb.doc_id = i.corpus_doc
    WHERE CAST(i.common AS DOUBLE) / (sa.n + sb.n - i.common) >= 0.3
    """,
)
def cross_near_dup_new_vs_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-ingest MinHash near-dup: new-batch documents
    (sources src10+) banded against the standing corpus only — new×new
    and corpus×corpus collisions never materialize, so per-cycle cost
    scales with the batch."""
    d = table(spark, sf, "documents")
    return D.cross_minhash_near_dup(
        d,
        F.regexp_extract("source", r"(\d+)$", 1).cast("int") >= 10,
        threshold=0.3,
    )


# --------------------------------------------------------------------------
# Event-sequence analytics
# --------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL),
    c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT prev_type, sum(n) AS total FROM c GROUP BY 1)
    SELECT c.prev_type, c.next_type, c.n,
           round(c.n / CAST(t.total AS DOUBLE), 6) AS prob
    FROM c JOIN t USING (prev_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition counts + probabilities between
    consecutive event types per user (funnel/journey modeling). One
    window shuffle on user_id for the lag, then two tiny aggregates on
    the (types²)-cardinality key — the per-user sequence never leaves
    its partition. Deterministic ordering via (ts, event_id)."""
    ev = table(spark, sf, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return c.join(t, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("prob"),
    )


@query(
    "attribution_last_touch_events",
    """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
               FROM events
               WHERE event_type = 'purchase' AND user_id IS NOT NULL
                 AND ts IS NOT NULL),
    touch AS (SELECT event_id AS touch_id, user_id, ts AS t_ts, event_type
              FROM events
              WHERE event_type IN ('view', 'click') AND user_id IS NOT NULL
                AND ts IS NOT NULL)
    SELECT purchase_id, touch_id, touch_type,
           CAST(gap_s AS BIGINT) AS gap_s
    FROM (SELECT p.purchase_id, t.touch_id, t.event_type AS touch_type,
                 epoch_us(p.p_ts) // 1000000
                   - epoch_us(t.t_ts) // 1000000 AS gap_s,
                 row_number() OVER (PARTITION BY p.purchase_id
                     ORDER BY t.t_ts DESC, t.touch_id DESC) AS rn
          FROM p JOIN touch t
            ON t.user_id = p.user_id
           AND t.t_ts <= p.p_ts
           AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR)
    WHERE rn = 1
    """,
)
def attribution_last_touch_events(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    view/click by the same user within the preceding hour — the
    point-in-interval join every marketing/conversion pipeline runs.
    The join is user-keyed (co-partitioned fact-fact), the interval
    predicate prunes inside each user's partition, and the per-purchase
    winner is a window over the few in-window touches. Gap reported in
    whole seconds (integer epoch math, exact cross-engine)."""
    ev = table(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        micros.alias("p_us"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
        micros.alias("t_us"),
    )
    joined = p.join(t, "user_id").filter(
        (F.col("t_us") <= F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(3_600_000_000))
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("t_ts").desc(), F.col("touch_id").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "touch_id",
            "touch_type",
            # floor-divide EACH side to whole seconds before differencing,
            # matching the oracle's epoch_us(x) // 1000000 per-operand floor
            F.expr("(p_us div 1000000) - (t_us div 1000000)").alias("gap_s"),
        )
    )


@query(
    "weekly_value_wow_change",
    """
    WITH wk AS (SELECT event_type,
                       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
                       round(sum(value), 2) AS total
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                  AND event_type IS NOT NULL
                GROUP BY 1, 2)
    SELECT event_type, week, total,
           round(CASE WHEN prev IS NULL OR prev = 0 THEN NULL
                 ELSE (total - prev) / prev END, 6) AS wow_change
    FROM (SELECT *, lag(total) OVER (PARTITION BY event_type
                     ORDER BY week) AS prev
          FROM wk)
    """,
)
def weekly_value_wow_change(spark: SparkSession, sf: str) -> DataFrame:
    """Week-over-week change of total value per event type: weekly
    rollup (one shuffle on a bounded key) then a lag window over the
    tiny weekly frame. Totals rounded to cents BEFORE the ratio so both
    engines difference identical values."""
    ev = table(spark, sf, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    wk = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("total").over(w)
    return wk.withColumn(
        "wow_change",
        F.round(
            F.when(
                prev.isNull() | (prev == 0), F.lit(None).cast("double")
            ).otherwise((F.col("total") - prev) / prev),
            6,
        ),
    )


def _redact_sql() -> str:
    expr = "text"
    for pat, tag in TS.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
    return expr


@query(
    "pii_redacted_documents",
    f"""
    SELECT doc_id,
           md5({_redact_sql()}) AS redacted_fp,
           (text <> {_redact_sql()}) AS was_redacted
    FROM documents
    """,
)
def pii_redacted_documents(spark: SparkSession, sf: str) -> DataFrame:
    """The redaction pass itself as a first-class query: emails, phone
    numbers, SSNs and card numbers replaced by typed tags in pattern
    order (longest-first so partial matches don't shadow). The oracle
    compares md5 of the redacted text — the full string round-trips
    through the hash, so any divergence in ANY document fails the gate.
    Pure regexp_replace chain inside codegen; shuffle-free."""
    d = table(spark, sf, "documents")
    red = TS.redact_pii("text")
    return d.select(
        "doc_id",
        F.md5(red).alias("redacted_fp"),
        (F.col("text") != red).alias("was_redacted"),
    )


@query(
    "text_normalize_documents",
    r"""
    WITH norm AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(
               regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
               '\s+', ' ', 'g'))) AS norm_text
      FROM documents)
    SELECT doc_id,
           md5(norm_text) AS norm_fp,
           CAST(length(text) - length(norm_text) AS BIGINT)
             AS chars_removed,
           (text <> norm_text) AS was_changed
    FROM norm
    """,
)
def text_normalize_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic text normalization — the cleanup pass a curation
    pipeline runs before tokenization/dedup (C4/CCNet-style): control
    characters stripped to spaces, whitespace runs collapsed to one
    space, trimmed, lowercased. Unicode NFC/NFKC folding is documented
    out of scope: neither engine ships ICU normalization offline, and a
    pandas-UDF unicodedata pass would have no SQL oracle — the regexp
    form is the cross-engine-exact core. The oracle compares md5 of the
    normalized text (the full string round-trips through the hash, the
    ``pii_redacted_documents`` pattern) plus the exact removed-char
    count. Pure regexp_replace chain inside codegen; shuffle-free at
    any corpus size."""
    d = table(spark, sf, "documents")
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("text"), r"[\x00-\x1f\x7f]", " "
                ),
                r"\s+",
                " ",
            )
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        (F.length("text") - F.length(norm))
        .cast("bigint")
        .alias("chars_removed"),
        (F.col("text") != norm).alias("was_changed"),
    )


@query(
    "cm_frequency_top_users_events",
    """
    WITH rows_ AS (SELECT CAST(user_id AS VARCHAR) AS item
                   FROM events WHERE user_id IS NOT NULL),
    keyed AS (SELECT j.j,
                     CAST('0x' || substr(md5(j.j || ':' || item), 1, 15)
                          AS BIGINT) % 256 AS bucket
              FROM rows_, (VALUES (0), (1), (2), (3)) j(j)),
    counters AS (SELECT j, bucket, count(*) AS cnt
                 FROM keyed GROUP BY 1, 2),
    exact AS (SELECT user_id, count(*) AS exact_n
              FROM events WHERE user_id IS NOT NULL GROUP BY 1
              ORDER BY exact_n DESC, user_id LIMIT 20),
    probes AS (SELECT e.user_id, e.exact_n, j.j,
                      CAST('0x' || substr(md5(j.j || ':'
                           || CAST(e.user_id AS VARCHAR)), 1, 15)
                           AS BIGINT) % 256 AS bucket
               FROM exact e, (VALUES (0), (1), (2), (3)) j(j))
    SELECT p.user_id, p.exact_n, min(coalesce(c.cnt, 0)) AS cm_est
    FROM probes p LEFT JOIN counters c
      ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY 1, 2
    """,
)
def cm_frequency_top_users_events(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min frequency estimates vs exact counts for the 20
    heaviest users. The counter matrix is 4×256 rows whatever the input
    size (mergeable across partitions/days); estimates never
    underestimate — the oracle checks the exact inflation the hash
    collisions produce, bit-for-bit."""
    from _data_engineering_pipeline_project_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_counters,
    )

    ev = table(spark, sf, "events").filter(F.col("user_id").isNotNull())
    counters = cm_sketch_counters(ev, "user_id", depth=4, width=256)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(20)
    )
    est = cm_estimate(exact, counters, "user_id", depth=4, width=256)
    return exact.join(est, "user_id").select("user_id", "exact_n", "cm_est")


@query(
    "token_count_percentiles_per_lang",
    r"""
    WITH tc AS (SELECT lang,
                       CAST(len(string_split_regex(trim(text), '\s+'))
                            AS DOUBLE) AS n_tok
                FROM documents)
    SELECT lang,
           round(quantile_cont(n_tok, 0.50), 6) AS p50,
           round(quantile_cont(n_tok, 0.90), 6) AS p90,
           round(quantile_cont(n_tok, 0.99), 6) AS p99,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM tc GROUP BY lang
    """,
)
def token_count_percentiles_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-length distribution per language — the pre-training
    mixture design statistic (context budgeting per language slice).
    Same bit-exact interpolated-order-statistic convention as
    value_quartiles_per_type; the sketch path for 100 TB is
    binned_quantiles (mergeable, no per-group sort)."""
    tc = table(spark, sf, "documents").select(
        "lang", TS.token_count("text").cast("double").alias("n_tok")
    )
    pcts = F.percentile(
        "n_tok", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        tc.groupBy("lang")
        .agg(pcts.alias("_p"), F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang",
            F.round(F.col("_p")[0], 6).alias("p50"),
            F.round(F.col("_p")[1], 6).alias("p90"),
            F.round(F.col("_p")[2], 6).alias("p99"),
            "n_docs",
        )
    )
