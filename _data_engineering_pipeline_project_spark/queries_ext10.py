"""Round-10: equi-depth (rank-quantized) Z-order layout key; sharded
Bloom-filter membership.

``zorder_key_equidepth_orders`` registers the rank-quantization +
interleave math that ``layout.py:write_zordered_quantized(quantize=
"equi_depth")`` clusters by, so it is oracle-checked bit-for-bit
against DuckDB. The boundaries here are PINNED LITERALS (a geometric
ladder over o_totalprice — the long-tailed column shape equi-depth
exists for — and a linear ladder over o_custkey): rank-quantization
against given boundaries is exact integer counting, reproducible in
any engine. The boundary DERIVATION (approxQuantile, Greenwald-Khanna)
is deliberately outside the oracle — its output is implementation-
defined within the error bound, so no other engine can re-derive it;
the same split ``functions/twopass.py`` pins (boundaries become plan
literals; pytest owns the derivation, the oracle owns the math). The
write path's payoff on a pareto-shaped column — where min/max
quantization measurably fails — is pinned by
``tests/test_round10.py``.

``bloom_membership_audit_documents`` / ``bloom_fp_audit_summary_
documents`` register the sharded Bloom filter (``operators/
membership.py``) end-to-end — build words over the standing corpus's
fingerprints, probe EVERY document, compare against exact membership —
so the whole bit pipeline (md5 double-hash positions, 60-bit word
shards, bit_or build, bool_and probe) is oracle-checked bit-for-bit,
and the false-positive rate / fill ratio the summary reports is the
sizing audit a deployed filter runs continuously (fill only grows with
the corpus; the geometry here is deliberately small enough that sf0.1
shows a non-trivial FP rate while sf0.01 stays near zero — both
exactly reproduced by the oracle, because FP behavior is a pure
function of the hash math). The no-false-negative property and the
artifact/merge lifecycle are pinned by ``tests/test_round10b.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.catalog import table
from _data_engineering_pipeline_project_spark.queries import query

_EQ_BITS = 4  # 2 lanes x 4 bits; ladders below stay under 2^4 buckets

# geometric ladder — the equi-depth shape for a long-tailed money
# column (each bucket doubles the value range, ~equalizing row counts
# under an exponential-ish tail); values are exact small doubles
_PRICE_BOUNDS = [float(1000 * (1 << i)) for i in range(10)]  # 1k..512k
_CUSTKEY_BOUNDS = [250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0, 16000.0]


def _equidepth_sql() -> str:
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk_sql,
    )
    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized_equi_depth_sql,
    )

    qp = quantized_equi_depth_sql("o_totalprice", _PRICE_BOUNDS)
    qc = quantized_equi_depth_sql("o_custkey", _CUSTKEY_BOUNDS)
    return f"""
SELECT o_orderkey,
       CAST({zorderk_sql([qp, qc], _EQ_BITS)} AS BIGINT) AS z_key
FROM orders
"""


@query("zorder_key_equidepth_orders", _equidepth_sql())
def zorder_key_equidepth_orders(spark: SparkSession, sf: str) -> DataFrame:
    """The Morton key an equi-depth z-ordered orders layout clusters
    by: each column rank-quantized against its boundary ladder (bucket
    = count of boundaries <= value, an exact integer the DuckDB twin
    reproduces bit-for-bit), buckets interleaved into one key. The
    count is a JVM-side higher-order size(filter(array_literal)) —
    no Python worker, no shuffle; the whole key is per-row column
    math over the scan."""
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk,
    )
    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized_equi_depth,
    )

    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_custkey"
    )
    # buckets inlined into the interleave: codegen subexpression
    # elimination evaluates each repeated bucket once per row (measured
    # r10 — a staged pre-projection is SLOWER; see
    # layout.quantized_zorder_key)
    qp = quantized_equi_depth(F.col("o_totalprice"), _PRICE_BOUNDS)
    qc = quantized_equi_depth(F.col("o_custkey"), _CUSTKEY_BOUNDS)
    return o.select(
        "o_orderkey", zorderk([qp, qc], _EQ_BITS).alias("z_key")
    )


# --------------------------------------------------------------------------
# Sharded Bloom-filter membership (operators/membership.py)
# --------------------------------------------------------------------------
_BLOOM_M = 1 << 14  # deliberately small: sf0.1 realizes a visible FP rate
_BLOOM_K = 3

_FP_SQL = r"md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))"


def _bloom_ctes() -> str:
    """Shared CTE chain: fingerprints, corpus bloom words, per-
    fingerprint probe flag, exact membership — each step the literal
    twin of membership.py (same md5 slices, double-hash stride, 60-bit
    words, bit_or/bool_and)."""
    from _data_engineering_pipeline_project_spark.operators.membership import (
        MASK_SQL,
        WORD_SQL,
        bloom_pos_sql,
    )

    pos = bloom_pos_sql("fp", _BLOOM_M, _BLOOM_K)
    return f"""
WITH fp AS (
  SELECT doc_id,
         CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER) AS src_n,
         {_FP_SQL} AS fp
  FROM documents
  WHERE text IS NOT NULL),
corpus AS (SELECT DISTINCT fp FROM fp WHERE src_n < 10),
cpos AS (SELECT unnest({pos}) AS pos FROM corpus),
words AS (SELECT {WORD_SQL} AS word_idx, bit_or({MASK_SQL}) AS word
          FROM cpos GROUP BY 1),
ppos AS (SELECT fp, unnest({pos}) AS pos
         FROM (SELECT DISTINCT fp FROM fp)),
pflag AS (
  SELECT ppos.fp,
         bool_and((COALESCE(w.word, 0) & {MASK_SQL}) = {MASK_SQL})
           AS bloom_member
  FROM ppos LEFT JOIN words w ON {WORD_SQL} = w.word_idx
  GROUP BY ppos.fp),
flags AS (
  SELECT f.doc_id, pf.bloom_member,
         (c.fp IS NOT NULL) AS exact_member,
         (pf.bloom_member AND c.fp IS NULL) AS is_false_positive
  FROM fp f
  JOIN pflag pf USING (fp)
  LEFT JOIN corpus c USING (fp))
"""


def _bloom_parts(spark: SparkSession, sf: str) -> tuple:
    """Spark half of the shared pipeline (corpus = sources src0-9, the
    cross_dedup_new_vs_corpus standing-corpus convention): returns
    (flags, words) so the per-document audit and the fill-ratio summary
    consume ONE corpus definition — the two queries previously derived
    words independently and a convention change could silently
    desynchronize them (code-review r10). NULL-text documents are
    excluded on BOTH engines (their fingerprint is NULL; the SQL twin's
    inner join would otherwise drop them only on the oracle side)."""
    from _data_engineering_pipeline_project_spark.operators import (
        membership as M,
    )
    from _data_engineering_pipeline_project_spark.operators import (
        textstats as TS,
    )

    d = table(spark, sf, "documents").withColumn(
        "src_n", F.regexp_extract("source", r"(\d+)$", 1).cast("int")
    )
    fp = d.select("doc_id", "src_n", TS.fingerprint("text").alias("fp")).filter(
        F.col("fp").isNotNull()
    )
    corpus = fp.filter(F.col("src_n") < 10).select("fp").distinct()
    words = M.bloom_build(corpus, F.col("fp"), _BLOOM_M, _BLOOM_K)
    probed = M.bloom_probe(
        words, fp.select("doc_id", "fp"), F.col("fp"), _BLOOM_M, _BLOOM_K
    )
    exact = corpus.withColumn("__exact", F.lit(True))
    flags = (
        probed.join(exact, "fp", "left")
        .select(
            "doc_id",
            "bloom_member",
            F.coalesce(F.col("__exact"), F.lit(False)).alias("exact_member"),
            (F.col("bloom_member") & F.col("__exact").isNull()).alias(
                "is_false_positive"
            ),
        )
    )
    return flags, words


def _bloom_flags(spark: SparkSession, sf: str) -> DataFrame:
    return _bloom_parts(spark, sf)[0]


@query(
    "bloom_membership_audit_documents",
    _bloom_ctes()
    + """
SELECT doc_id, bloom_member, exact_member, is_false_positive FROM flags
""",
)
def bloom_membership_audit_documents(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Per-document Bloom-vs-exact membership: build the corpus filter
    (one explode + one bit_or groupBy, ≤ m/60 output rows), probe every
    document's fingerprint (distinct keys → one word_idx join — AQE
    broadcasts the small words relation — → bool_and), and compare
    against the exact distinct-key semi-join. Every reported bit is a
    pure function of exact integer md5 arithmetic, so the DuckDB twin
    reproduces bloom_member — false positives included — bit-for-bit.
    No false negatives BY CONSTRUCTION (exact_member ⇒ bloom_member);
    the property test re-pins it under hostile keys."""
    return _bloom_flags(spark, sf)


@query(
    "bloom_fp_audit_summary_documents",
    _bloom_ctes()
    + f"""
SELECT (SELECT count(*) FROM flags) AS n_probes,
       (SELECT count(*) FILTER (bloom_member) FROM flags) AS n_bloom_positive,
       (SELECT count(*) FILTER (exact_member) FROM flags) AS n_exact_member,
       (SELECT count(*) FILTER (is_false_positive) FROM flags) AS n_false_positive,
       round((SELECT count(*) FILTER (is_false_positive) FROM flags) * 1.0
             / (SELECT count(*) FILTER (NOT exact_member) FROM flags), 6)
         AS fp_rate,
       (SELECT CAST(sum(bit_count(word)) AS BIGINT) FROM words) AS n_bits_set,
       round((SELECT sum(bit_count(word)) FROM words) * 1.0 / {_BLOOM_M}, 6)
         AS fill_ratio
""",
)
def bloom_fp_audit_summary_documents(
    spark: SparkSession, sf: str
) -> DataFrame:
    """The filter-sizing audit as one row: realized FP rate (false
    positives / true non-members) and fill ratio (set bits / m). This
    is the number a 100 TB deployment watches — fill only grows as the
    corpus absorbs batches, and once it passes ~50% the FP rate climbs
    toward (fill)^k; the fix is a rebuild at larger m (the artifact
    records its geometry for exactly that decision). All counts are
    exact integers; the two ratios are single divisions of exact
    integers, rounded identically in both engines."""
    flags, words = _bloom_parts(spark, sf)
    counts = flags.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count_if(F.col("bloom_member")).alias("n_bloom_positive"),
        F.count_if(F.col("exact_member")).alias("n_exact_member"),
        F.count_if(F.col("is_false_positive")).alias("n_false_positive"),
        F.round(
            F.count_if(F.col("is_false_positive"))
            / F.count_if(~F.col("exact_member")),
            6,
        ).alias("fp_rate"),
    )
    fill = words.agg(
        F.sum(F.bit_count("word")).cast("bigint").alias("n_bits_set"),
        F.round(F.sum(F.bit_count("word")) / F.lit(_BLOOM_M), 6).alias(
            "fill_ratio"
        ),
    )
    return counts.crossJoin(F.broadcast(fill))


# --------------------------------------------------------------------------
# Join-skew audit (operators/skew.py:join_skew_audit)
# --------------------------------------------------------------------------
_AUDIT_P = 32  # the TARGET shuffle width the audit describes


@query(
    "join_skew_audit_events_type",
    f"""
WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
           FROM events GROUP BY 1),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c)
SELECT event_type, n_rows,
       round(n_rows * 1.0 / total, 6) AS share,
       round(n_rows * {_AUDIT_P}.0 / total, 4) AS skew_factor,
       CAST(greatest(1, (n_rows * {_AUDIT_P} + total - 1) // total)
            AS BIGINT) AS recommended_salt
FROM c CROSS JOIN t
ORDER BY n_rows DESC, event_type
LIMIT 10
""",
)
def join_skew_audit_events_type(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy-hitter audit on the events.event_type key at a declared
    32-way shuffle width: per-key rows, share, skew factor (average-
    partitions' worth of rows the key funnels into one task), and the
    salt lane count that levels it — the measured input the skew
    playbook's salted_join/salted_aggregate calls take. A 5-value key
    over the whole relation is exactly the low-cardinality hot-key
    shape salting exists for: every key lands skew_factor ≈ 6.4 and
    recommends ~7 lanes. One count-only shuffle; exact integer math
    throughout (ceil as BIGINT div)."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        join_skew_audit,
    )

    return join_skew_audit(
        table(spark, sf, "events"), ["event_type"], partitions=_AUDIT_P
    )


# --------------------------------------------------------------------------
# Matryoshka (prefix-dimension) truncation recall audit
# --------------------------------------------------------------------------
_MRL_CUTS = (8, 16, 32, 64)
_MRL_K = 5


def _mrl_sql() -> str:
    """Twin of matryoshka_scores + recall join: segmented dots between
    cuts, prefixes accumulated LEFT-TO-RIGHT in the same association as
    the Spark fold (``(d1 + d2) + d3``), cosines rounded to 6 before
    ranking — bit-parity per the vectors.py contract."""
    segs, lo = [], 1
    for c in _MRL_CUTS:
        segs.append((lo, c))
        lo = c + 1

    def cum(parts: list[str]) -> str:
        e = parts[0]
        for p in parts[1:]:
            e = f"({e} + {p})"
        return e

    cos_cols = []
    dparts: list[str] = []
    cparts: list[str] = []
    qparts: list[str] = []
    for lo, hi in segs:
        dparts.append(f"list_dot_product(v[{lo}:{hi}], qv[{lo}:{hi}])")
        cparts.append(f"list_dot_product(v[{lo}:{hi}], v[{lo}:{hi}])")
        qparts.append(f"list_dot_product(qv[{lo}:{hi}], qv[{lo}:{hi}])")
        cos_cols.append(
            f"round({cum(dparts)} / (sqrt({cum(cparts)}) * "
            f"sqrt({cum(qparts)})), 6) AS cos_{hi}"
        )
    tops = ",\n".join(
        f"""top_{m} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_{m} DESC, neighbor_id) AS rnk
        FROM scored) WHERE rnk <= {_MRL_K})"""
        for m in _MRL_CUTS
    )
    full = _MRL_CUTS[-1]
    unions = "\nUNION ALL\n".join(
        f"""SELECT {m} AS prefix_dim, b.query_id,
       CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
       round(count(t.neighbor_id) * 1.0 / {_MRL_K}, 6) AS recall
FROM top_{full} b LEFT JOIN top_{m} t
  ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
GROUP BY b.query_id"""
        for m in _MRL_CUTS
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {", ".join(cos_cols)}
  FROM c, q WHERE c.vec_id <> q.query_id),
{tops}
{unions}
"""


@query("matryoshka_recall_audit_embeddings", _mrl_sql())
def matryoshka_recall_audit_embeddings(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Recall@5 of prefix-truncated cosine retrieval (dims 8/16/32 of
    64) against the full-dimension ranking, per query — the audit that
    decides whether matryoshka-truncated serving (¼ the vector bytes
    and dot work at dim 16) keeps retrieval quality. ONE segmented
    corpus×queries scoring pass produces every cut's cosine (same
    total element work as the plain brute top-k), ranked per cut over
    the same relation; the dim-64 rows are the self-anchoring baseline
    (recall pinned at 1.0). Query set bounded (vec_id < 10) per the
    recall-audit scale contract (lsh_recall_audit_documents)."""
    from _data_engineering_pipeline_project_spark.operators import (
        similarity as SIM,
    )

    emb = table(spark, sf, "embeddings")
    return SIM.matryoshka_recall_audit(
        emb, emb.filter(F.col("vec_id") < 10), _MRL_CUTS, _MRL_K
    )


# --------------------------------------------------------------------------
# Exact covariance audit + PCA (operators/pca.py)
# --------------------------------------------------------------------------
_COV_SCALE2 = float(1 << 20) * float(1 << 20)


@query(
    "embedding_covariance_audit",
    f"""
WITH vq AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(round(x * 1048576.0) AS BIGINT))
              AS v
            FROM embeddings),
terms AS (SELECT i, j, v[i] AS vi, v[j] AS vj
          FROM vq, generate_series(1, 64) g1(i), generate_series(1, 64) g2(j)
          WHERE i < j),
sums AS (SELECT i, j, count(*) AS n,
                CAST(sum(vi) AS DOUBLE) AS si,
                CAST(sum(vj) AS DOUBLE) AS sj,
                CAST(sum(vi * vj) AS DOUBLE) AS sij
         FROM terms GROUP BY i, j),
cov AS (SELECT CAST(i AS INTEGER) AS dim_i, CAST(j AS INTEGER) AS dim_j,
               round((n * sij - si * sj) / (n * n) / {_COV_SCALE2!r}, 8)
                 AS cov
        FROM sums)
SELECT dim_i, dim_j, cov
FROM cov
ORDER BY abs(cov) DESC, dim_i, dim_j
LIMIT 20
""",
)
def embedding_covariance_audit(spark: SparkSession, sf: str) -> DataFrame:
    """The 20 most-correlated embedding dimension pairs by |population
    covariance| — the redundancy audit that decides whether a PCA/OPQ
    rotation is worth training (near-zero off-diagonals = nothing to
    decorrelate). EXACT and oracle-checkable: elements quantized to an
    integer lane (round(x·2^20), the int8 portable-rounding precedent),
    per-pair power sums as exact DECIMAL(38,0) aggregates, the final
    doubles fixed IEEE sequences. One double-posexplode + ONE
    groupBy(i,j) with map-side partials — d(d−1)/2 output rows
    regardless of corpus size; the shuffle carries partial sums, never
    vectors."""
    from _data_engineering_pipeline_project_spark.operators.pca import (
        covariance_pairs,
    )

    # physical form: gram (numpy X^T X per Arrow batch) — bit-identical
    # to the relational explode the DuckDB twin mirrors (parity pinned
    # in test_round10b), measured faster even at d=64 and 8.5x at d=256
    cov = covariance_pairs(
        table(spark, sf, "embeddings"),
        include_diagonal=False,
        method="gram",
        dim=64,
    ).select("dim_i", "dim_j", F.round("cov", 8).alias("cov"))
    return cov.orderBy(
        F.abs(F.col("cov")).desc(), "dim_i", "dim_j"
    ).limit(20)


def _pca_variance_sql() -> str:
    """Deferred twin of the scree report (VERDICT r11 #2 — rows-only
    10 → 9): DuckDB re-derives the covariance/mean INDEPENDENTLY (the
    exact integer-lane relational form pinned bit-for-bit against the
    Spark gram path by ``embedding_covariance_audit``), the same
    bounded ``numpy.eigh`` driver step produces the spectrum, and the
    top-8 (eigenvalue, cumulative fraction) rows are embedded as exact
    IEEE literals — a hash match certifies cross-engine agreement on
    the covariance pipeline feeding the scree, with the eigh step
    shared-by-construction (the ``opq_model_duckdb`` precedent,
    documented honestly there)."""
    from _data_engineering_pipeline_project_spark.queries_ext11 import (
        _ORACLE_SF_DIR,
        pca_model_duckdb,
    )

    model = pca_model_duckdb(f"{_ORACLE_SF_DIR}/embeddings.parquet", 64)
    ev = model["eigenvalues"]
    total = sum(ev) or 1.0
    rows, c = [], 0.0
    for i, e in enumerate(ev[:8]):
        c += e
        rows.append((i + 1, round(e, 8), round(c / total, 6)))
    values = ",\n      ".join(
        f"({comp}, CAST('{e!r}' AS DOUBLE), CAST('{f!r}' AS DOUBLE))"
        for comp, e, f in rows
    )
    return f"""
    SELECT CAST(component AS INTEGER) AS component, eigenvalue, cum_fraction
    FROM (VALUES
      {values}) t(component, eigenvalue, cum_fraction)
"""


@query("pca_variance_explained_embeddings", _pca_variance_sql)  # deferred
def pca_variance_explained_embeddings(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Scree report: top-8 principal components' eigenvalues and
    cumulative variance fraction. The covariance input is the exact
    oracled relation above; the eigendecomposition is a bounded
    driver step (d² doubles — the Lloyd-centroid discipline). Oracled
    since r12 via the deferred-twin machinery (independent DuckDB
    covariance + the identical eigh step, literals at the compare
    scale); pytest additionally pins the spectral invariants:
    Σ eigenvalues = trace(cov), descending order, orthogonal rotation,
    projected covariance diagonal."""
    from _data_engineering_pipeline_project_spark.operators.pca import (
        pca_fit,
        variance_explained,
    )

    model = pca_fit(table(spark, sf, "embeddings"), dim=64, method="gram")
    rows = variance_explained(model)[:8]
    from _data_engineering_pipeline_project_spark.functions.localrel import (
        local_df,
    )

    return local_df(
        spark,
        [(c, round(e, 8), round(f, 6)) for c, e, f in rows],
        "component int, eigenvalue double, cum_fraction double",
    )


# --------------------------------------------------------------------------
# Hilbert layout key (functions/hilbert.py SQL twin; UDF hot path)
# --------------------------------------------------------------------------
_HILBERT_ORDER = 16


def _hilbert_sql() -> str:
    from _data_engineering_pipeline_project_spark.functions.hilbert import (
        hilbert_sql_ctes,
    )

    chain = hilbert_sql_ctes(
        "c_custkey", "c_nationkey", _HILBERT_ORDER, "src", carry=", ck"
    )
    return f"""
WITH src AS (SELECT c_custkey, c_nationkey, c_custkey AS ck FROM customer),
{chain}
SELECT ck AS c_custkey, d AS hilbert_key FROM h{_HILBERT_ORDER}
"""


@query("hilbert_key_customers", _hilbert_sql())
def hilbert_key_customers(spark: SparkSession, sf: str) -> DataFrame:
    """The Hilbert distance a hilbert-clustered customer layout sorts
    by (write_hilbert) — exact integer math, so the numpy-UDF hot path
    (measured 12× faster than the staged expression chain, see
    functions/hilbert.py) is oracle-checked bit-for-bit against the
    16-round CTE twin. Morton's locality sibling: consecutive curve
    positions are always grid neighbors, so clustered files carry
    tighter worst-case per-file ranges on BOTH dimensions."""
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        hilbert_value,
    )

    return table(spark, sf, "customer").select(
        "c_custkey",
        hilbert_value("c_custkey", "c_nationkey", _HILBERT_ORDER).alias(
            "hilbert_key"
        ),
    )


# --------------------------------------------------------------------------
# l-diversity audit (companion to k_anonymity_audit_events)
# --------------------------------------------------------------------------
@query(
    "l_diversity_audit_events",
    """
    WITH q AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(user_id % 10 AS BIGINT) AS user_bucket,
             count(*) AS grp_size,
             count(DISTINCT event_type) AS n_sensitive
      FROM events GROUP BY CAST(ts AS DATE), user_id % 10)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(sum(CASE WHEN n_sensitive < 3 THEN grp_size ELSE 0 END)
                AS BIGINT) AS n_exposed_rows,
           CAST(min(n_sensitive) AS BIGINT) AS l_actual,
           round(sum(CASE WHEN n_sensitive < 3 THEN grp_size ELSE 0 END)
                 / CAST(sum(grp_size) AS DOUBLE), 6) AS exposed_row_ratio
    FROM q
    """,
)
def l_diversity_audit_events(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (l = 3) over the quasi-identifier tuple
    (day, user-bucket) with event_type as the sensitive attribute —
    the k-anonymity companion: a class can be large (k-safe) yet still
    leak if every row shares one sensitive value (the homogeneity
    attack k-anonymity misses). Reports classes below l, the rows they
    expose, and the dataset's actual l (min distinct sensitive values
    per class). One groupBy with a distinct-count + one scalar rollup;
    all-integer until the final ratio."""
    ev = table(spark, sf, "events")
    q = ev.groupBy(
        F.to_date("ts").alias("day"),
        (F.col("user_id") % 10).cast("bigint").alias("user_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("grp_size"),
        F.countDistinct("event_type").alias("n_sensitive"),
    )
    viol = F.col("n_sensitive") < 3
    exposed = F.when(viol, F.col("grp_size")).otherwise(F.lit(0))
    return q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(exposed).cast("bigint").alias("n_exposed_rows"),
        F.min("n_sensitive").cast("bigint").alias("l_actual"),
        F.round(
            F.sum(exposed) / F.sum("grp_size").cast("double"), 6
        ).alias("exposed_row_ratio"),
    )


# --------------------------------------------------------------------------
# Constraint discovery (operators/expectations.py:suggest_expectations)
# --------------------------------------------------------------------------
@query(
    "suggest_expectations_orders",
    """
    WITH p AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nul_k,
             count(DISTINCT o_orderkey) AS dis_k,
             CAST(min(o_orderkey) AS DOUBLE) AS mn_k,
             CAST(max(o_orderkey) AS DOUBLE) AS mx_k,
             CAST(min(o_totalprice) AS DOUBLE) AS mn_t,
             CAST(max(o_totalprice) AS DOUBLE) AS mx_t,
             sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nul_t,
             count(DISTINCT o_totalprice) AS dis_t,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nul_s,
             count(DISTINCT o_orderstatus) AS dis_s,
             list_sort(list(DISTINCT o_orderstatus)) AS set_s,
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nul_p,
             count(DISTINCT o_orderpriority) AS dis_p,
             list_sort(list(DISTINCT o_orderpriority)) AS set_p
      FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS "column", 'not_null' AS suggestion,
             CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
             CAST(NULL AS VARCHAR[]) AS allowed
      FROM p WHERE nul_k = 0
      UNION ALL
      SELECT 'o_orderkey', 'unique', NULL, NULL, NULL
      FROM p WHERE nul_k = 0 AND dis_k = n
      UNION ALL
      SELECT 'o_orderkey', 'in_range', mn_k, mx_k, NULL
      FROM p WHERE nul_k < n
      UNION ALL
      SELECT 'o_totalprice', 'not_null', NULL, NULL, NULL
      FROM p WHERE nul_t = 0
      UNION ALL
      SELECT 'o_totalprice', 'unique', NULL, NULL, NULL
      FROM p WHERE nul_t = 0 AND dis_t = n
      UNION ALL
      SELECT 'o_totalprice', 'in_range', mn_t, mx_t, NULL
      FROM p WHERE nul_t < n
      UNION ALL
      SELECT 'o_orderstatus', 'not_null', NULL, NULL, NULL
      FROM p WHERE nul_s = 0
      UNION ALL
      SELECT 'o_orderstatus', 'unique', NULL, NULL, NULL
      FROM p WHERE nul_s = 0 AND dis_s = n
      UNION ALL
      SELECT 'o_orderstatus', 'in_set', NULL, NULL, set_s
      FROM p WHERE dis_s > 0 AND dis_s <= 10
      UNION ALL
      SELECT 'o_orderpriority', 'not_null', NULL, NULL, NULL
      FROM p WHERE nul_p = 0
      UNION ALL
      SELECT 'o_orderpriority', 'unique', NULL, NULL, NULL
      FROM p WHERE nul_p = 0 AND dis_p = n
      UNION ALL
      SELECT 'o_orderpriority', 'in_set', NULL, NULL, set_p
      FROM p WHERE dis_p > 0 AND dis_p <= 10)
    """,
)
def suggest_expectations_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Constraint discovery over orders: the generator side of the
    expectation suite — emit the contracts the snapshot satisfies
    (not-null, PK-candidate uniqueness, numeric ranges, small enum
    sets as sorted array<string> lists) as evidence for a human to
    promote. TWO BOUNDED scans (code-review r10): the profile scan
    never collects values — distinct counts ride the expand+two-phase
    agg — and the enum scan runs only for columns the profile proved
    are at/under threshold, so no agg buffer can exceed
    enum_threshold values; never a rescan per rule. Complements the
    validating side (expectations_suite_orders) and the FK-mining IND
    audit: profile → suggest → promote → enforce, all in-engine."""
    from _data_engineering_pipeline_project_spark.operators.expectations import (
        suggest_expectations,
    )

    return suggest_expectations(
        table(spark, sf, "orders"),
        numeric_cols=["o_orderkey", "o_totalprice"],
        string_cols=["o_orderstatus", "o_orderpriority"],
        enum_threshold=10,
    )


# --------------------------------------------------------------------------
# Embedding drift audit (two-snapshot distribution monitor)
# --------------------------------------------------------------------------
_DRIFT_SCALE = float(1 << 20)


@query(
    "embedding_drift_audit_embeddings",
    f"""
WITH vq AS (SELECT label,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(round(x * 1048576.0) AS BIGINT))
                     AS v
            FROM embeddings),
terms AS (SELECT CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END AS side,
                 i, v[i] AS vi
          FROM vq, generate_series(1, 64) g(i)),
sums AS (SELECT side, i, count(*) AS n,
                CAST(sum(vi) AS DOUBLE) AS s,
                CAST(sum(vi * vi) AS DOUBLE) AS sii
         FROM terms GROUP BY side, i),
stats AS (SELECT side, i,
                 s / n / {_DRIFT_SCALE!r} AS mu,
                 (n * sii - s * s) / (n * n)
                   / ({_DRIFT_SCALE!r} * {_DRIFT_SCALE!r}) AS var
          FROM sums)
SELECT CAST(a.i AS INTEGER) AS dim,
       round(a.mu, 8) AS mean_a, round(b.mu, 8) AS mean_b,
       round(abs(a.mu - b.mu), 8) AS mean_shift,
       round(a.var, 8) AS var_a, round(b.var, 8) AS var_b,
       round(b.var / a.var, 6) AS var_ratio
FROM stats a JOIN stats b ON a.i = b.i AND a.side = 'a' AND b.side = 'b'
ORDER BY round(abs(a.mu - b.mu), 8) DESC, dim
LIMIT 10
""",
)
def embedding_drift_audit_embeddings(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Two-snapshot embedding drift monitor: per dimension, mean and
    population variance on each side of a split (label parity stands in
    for old-vs-new snapshot) from EXACT integer power sums (the
    covariance_pairs lane), reporting the 10 dims with the largest
    mean shift plus their variance ratio — the value_drift_psi
    discipline extended to embedding space, where a drifting encoder
    shows up as per-dim mean/variance movement long before downstream
    metrics. One quantize + one posexplode + one groupBy(side, dim)
    with map-side partials; 2d output rows regardless of corpus size;
    every reported double derives from exact integers, so the twin
    reproduces even the tie-break order bit-for-bit."""
    from _data_engineering_pipeline_project_spark.operators.pca import (
        quantized_elements,
    )

    emb = table(spark, sf, "embeddings")
    vq = quantized_elements(emb, "label", "embedding").withColumn(
        "side",
        F.when(F.col("label") % 2 == 0, F.lit("a")).otherwise(F.lit("b")),
    )
    dec = "decimal(38,0)"
    sums = (
        vq.select("side", F.posexplode("v").alias("i0", "vi"))
        .groupBy("side", "i0")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("vi").cast(dec)).cast("double").alias("s"),
            F.sum((F.col("vi") * F.col("vi")).cast(dec))
            .cast("double")
            .alias("sii"),
        )
    )
    n = F.col("n")
    stats = sums.select(
        "side",
        "i0",
        (F.col("s") / n / F.lit(_DRIFT_SCALE)).alias("mu"),
        (
            (n * F.col("sii") - F.col("s") * F.col("s"))
            / (n * n)
            / F.lit(_DRIFT_SCALE * _DRIFT_SCALE)
        ).alias("var"),
    )
    a = stats.filter(F.col("side") == "a").select(
        "i0", F.col("mu").alias("mu_a"), F.col("var").alias("var_a")
    )
    b = stats.filter(F.col("side") == "b").select(
        "i0", F.col("mu").alias("mu_b"), F.col("var").alias("var_b")
    )
    return (
        a.join(b, "i0")
        .select(
            (F.col("i0") + 1).cast("int").alias("dim"),
            F.round("mu_a", 8).alias("mean_a"),
            F.round("mu_b", 8).alias("mean_b"),
            F.round(F.abs(F.col("mu_a") - F.col("mu_b")), 8).alias(
                "mean_shift"
            ),
            F.round("var_a", 8).alias("var_a"),
            F.round("var_b", 8).alias("var_b"),
            F.round(F.col("var_b") / F.col("var_a"), 6).alias("var_ratio"),
        )
        .orderBy(F.col("mean_shift").desc(), "dim")
        .limit(10)
    )
