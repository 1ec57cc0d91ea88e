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

from _data_engineering_pipeline_project_spark.functions.localrel import local_df
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


def save_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_files: int | None = None,
) -> None:
    """Persist the BM25 inverted index as a parquet artifact — the
    lexical sibling of the PQ vector artifact (``similarity.py:
    save_pq_index``): tokenize the corpus ONCE in an offline job, then
    any later session serves queries without touching a document.

    Layout IS the index: ``path/postings`` (doc, term, tf, dl) is
    written range-clustered BY TERM (``repartitionByRange`` +
    ``sortWithinPartitions`` — the same mechanics as
    ``operators/layout.py``), so a query-time ``term IN (...)`` scan
    row-group-skips straight to the query bag's postings instead of
    decoding the corpus-sized relation; no auxiliary index structure,
    just parquet min/max statistics doing inverted-list seeks. The doc
    LENGTH rides in the posting row (the classic payload-in-the-
    posting-list design): one extra long per posting at build time
    buys query time a plan with NO doc-sized join — measured, the
    doclens join otherwise dominates serving (SCALE.md r9).
    ``path/dictionary`` (term, df), ``path/stats`` (n_docs, avgdl) and
    ``path/params`` (column names, so a loader can't mismatch)
    complete the artifact. At 100 TB the serving job's input is the
    query terms' postings — the classic inverted-index economics,
    relationally.

    Build shape (VERDICT r9 #1 → r10 brief #3): the corpus-sized
    postings relation is SPILLED TO PARQUET once, never cached. The
    tokenize+groupBy lineage has three would-be consumers (the range-
    boundary sampling job, the clustered postings write, the dictionary
    aggregate); the r9 build kept all three on one tokenize by
    ``.cache()``-ing the relation — correct, but at 100 TB a
    MEMORY_AND_DISK cache of the postings evicts hot caches and doubles
    transient executor storage. Instead: (1) one tokenize writes the
    postings UNCLUSTERED to a ``_build_tmp`` dir; (2) the boundary
    sample + range shuffle + clustered write re-read that columnar
    output (≪ re-tokenizing — compressed integers and dictionary-coded
    terms, no text parse); (3) the dictionary derives from the FINAL
    written postings the same way. Only ``dl`` (one small row per doc)
    stays cached for the build. Measured at the 5M-doc protocol: no
    wall regression vs the cached build (tools/measure_bm25_build.py,
    SCALE.md r10), with zero corpus-sized executor storage."""
    spark = docs.sparkSession
    toks = _token_relation(docs, text_col, id_col)
    dl = docs.select(
        F.col(id_col), TS.token_count(text_col).alias("dl")
    ).cache()
    tmp = f"{path}/_build_tmp"  # underscore: invisible to parquet readers
    try:
        n = num_files or spark.sparkContext.defaultParallelism
        (
            toks.groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .join(dl, id_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        (
            spark.read.parquet(tmp)
            .repartitionByRange(n, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(f"{path}/postings")
        )
        # df per term == distinct docs per term == tf rows per term;
        # derived from the just-written clustered postings (columnar
        # re-scan with map-side partial counts — no third tokenize)
        spark.read.parquet(f"{path}/postings").groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        ).write.mode("overwrite").parquet(f"{path}/dictionary")
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
        local_df(
            spark,
            [(id_col, text_col, "dl-in-postings-v2")],
            "id_col string, text_col string, format string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    finally:
        dl.unpersist()
        _rm_dir(spark, tmp)


def _rm_dir(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API (works for
    any scheme the session can write, not just local paths)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)


def load_bm25_index(spark, path: str) -> dict:
    """Load a :func:`save_bm25_index` artifact → dict of plain parquet
    scans (postings, dictionary, stats) + the params row — no lineage
    back to the corpus. Fails FAST with a rebuild instruction on a
    layout mismatch (e.g. an artifact written before dl moved into the
    posting row) instead of an opaque unresolved-column error at query
    time."""
    try:
        params = spark.read.parquet(f"{path}/params").collect()[0].asDict()
    except Exception as e:
        raise ValueError(
            f"not a BM25 index artifact at {path}: params relation "
            f"missing or unreadable ({type(e).__name__}) — rebuild with "
            "save_bm25_index"
        ) from e
    if params.get("format") != "dl-in-postings-v2" or not params.get(
        "id_col"
    ):
        raise ValueError(
            f"not a BM25 index artifact at {path}: params row "
            f"{params!r} lacks the expected format/id_col — rebuild "
            "with save_bm25_index"
        )
    postings = spark.read.parquet(f"{path}/postings")
    if "dl" not in postings.columns:
        raise ValueError(
            f"BM25 artifact at {path} predates the dl-in-postings layout "
            "(postings lack the 'dl' column) — rebuild with "
            "save_bm25_index"
        )
    return {
        "postings": postings,
        "dictionary": spark.read.parquet(f"{path}/dictionary"),
        "stats": spark.read.parquet(f"{path}/stats"),
        "params": params,
    }


def bm25_scores_from_index(
    index: dict,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """BM25 totals served from a loaded index artifact — identical math
    to :func:`bm25_scores` (same idf/tf-norm expressions over the same
    exact integer inputs, so the served scores match the direct path
    bit-for-bit; test-pinned). The ONLY corpus-sized relation in the
    plan is the term-clustered postings slice for the query bag (dl
    rides in the posting row, so there is no doc-sized join — the
    dictionary slice and the 1-row stats broadcast are term-bag-sized
    and constant)."""
    id_col = index["params"]["id_col"]
    per_term = bm25_per_term_contrib_from_index(
        index, query_terms, k1=k1, b=b
    )
    return per_term.groupBy(id_col).agg(
        F.round(F.sum("contrib"), round_digits).alias("bm25")
    )


def bm25_per_term_contrib_from_index(
    index: dict,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, term, contrib) served from a loaded/maintained index
    artifact — the unsummed form of :func:`bm25_scores_from_index`,
    for callers that combine terms in FIXED written order (the
    cross-engine-exact fusion path: ``hybrid_search_rrf`` and its
    maintained twin). Identical expressions over the same exact
    integer inputs as :func:`bm25_per_term_contrib`'s direct path —
    tf/df/dl are longs from the artifact and avgdl is the same
    long-sum / long-count division ``avg(dl)`` performs — so contribs
    match the direct path bit-for-bit (test-pinned). Plan: the only
    corpus-sized relation is the term-clustered postings slice for
    the query bag; dictionary slice + 1-row stats broadcast."""
    id_col = index["params"]["id_col"]
    qset = [t.lower() for t in query_terms]
    tf = index["postings"].filter(F.col("term").isin(qset))
    df_ = index["dictionary"].filter(F.col("term").isin(qset)).select(
        "term", "df"
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(index["stats"]))
        .select(
            F.col(id_col), F.col("term"), (idf * tf_norm).alias("contrib")
        )
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


def positioned_tokens(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, seq, term) with ``seq`` the 1-based position in the
    EMPTY-FILTERED token sequence (so adjacency is well-defined even when
    the raw split produces empty tokens around repeated whitespace)."""
    raw = docs.select(
        F.col(id_col),
        F.posexplode(TS.tokens(text_col)).alias("pos", "term"),
    ).filter(F.length("term") > 0)
    w = Window.partitionBy(id_col).orderBy("pos")
    return raw.select(
        id_col, F.row_number().over(w).alias("seq"), "term"
    )


def bigram_pmi(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """Corpus-wide adjacent-bigram pointwise mutual information — the
    classic collocation statistic (Church & Hanks 1990) used to mine
    multi-word expressions for tokenizer vocab construction.

    PMI(a,b) = ln( (c_ab/B) / ((c_a/N)(c_b/N)) ) computed as a product of
    three identical double divisions so the oracle twin multiplies the
    same bits in the same order; the ln result is rounded BEFORE ranking
    (the queries_ext2 convention for libm-vs-JVM ulp drift).

    Scale shape: tokens shuffle once by doc for adjacency (row_number +
    lead), then two count aggregations (bigram, unigram) whose partial
    (map-side) combines collapse the token stream before the exchange;
    the unigram count table joins back twice — both sides of that join
    are term-keyed counts, orders of magnitude smaller than the corpus."""
    toks = positioned_tokens(docs, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("seq")
    bigrams = toks.select(
        "term", F.lead("term").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())

    c_ab = bigrams.groupBy("term", "nxt").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c_term"))
    totals = bigrams.agg(F.count(F.lit(1)).alias("b_total")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("n_total"))
    )

    scored = (
        c_ab.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(c_a.withColumnRenamed("term", "t1")), F.col("term") == F.col("t1"))
        .withColumnRenamed("c_term", "c_a")
        .join(F.broadcast(c_a.withColumnRenamed("term", "t2")), F.col("nxt") == F.col("t2"))
        .withColumnRenamed("c_term", "c_b")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("term").alias("w1"),
            F.col("nxt").alias("w2"),
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(
                    (F.col("c_ab") * F.lit(1.0) / F.col("b_total"))
                    * (F.col("n_total") * F.lit(1.0) / F.col("c_a"))
                    * (F.col("n_total") * F.lit(1.0) / F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # TakeOrdered top-N (orderBy+limit = per-partition heaps + driver
    # merge of top_n rows), then rank only the survivors — a global
    # row_number window here would single-partition-sort EVERY scored
    # bigram (unbounded in vocabulary) to extract top_n rows
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(top_n)
    w_rank = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return top.withColumn("rnk", F.row_number().over(w_rank).cast("int"))


def hashed_linear_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    mod: int = 997,
) -> DataFrame:
    """fastText-shaped quality classifier: hashed bag-of-words features
    through a linear layer. Each token maps to a bucket in [0, dim) via
    the portable md5 hash; the per-bucket weight here is a deterministic
    INTEGER function of the bucket id ((bucket %% mod) - mod//2) standing
    in for trained weights, so the per-doc score — mean weight over
    tokens — is exact integer arithmetic until one final division and is
    bit-reproducible in any engine. Swapping in real trained weights is a
    broadcast join against a (bucket, weight) table of size ``dim``.

    Scale shape: explode → project (codegen) → one groupBy(doc). The
    weight lookup is pure expression math (no join at all in the stub
    form); with real weights it is a broadcast hash join — either way the
    corpus shuffles once, keyed by document."""
    from _data_engineering_pipeline_project_spark.operators.dedup import md5_hash60

    toks = _token_relation(docs, text_col, id_col)
    half = mod // 2
    scored = toks.select(
        id_col,
        ((md5_hash60(F.col("term")) % dim % mod) - half).alias("w"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("w_sum"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.round(F.col("w_sum") * F.lit(1.0) / F.col("n_tokens"), 6).alias(
                "quality_score"
            ),
            (F.col("w_sum") > 0).alias("keep"),
        )
    )
