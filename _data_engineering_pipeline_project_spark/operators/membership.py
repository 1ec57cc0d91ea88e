"""Sharded Bloom-filter membership: build, probe, merge, persist.

The missing tier between the exact seen-state join
(``dedup.py:cross-corpus`` / ``streaming/dedupmaint.py`` — always
right, but every probe batch shuffles against the full seen-key
relation) and nothing at all: a Bloom filter is a compact, mergeable,
no-false-negative membership summary, so an ingest pipeline can answer
"definitely new" for the vast majority of incoming documents from a
words table of ``m/60`` longs instead of a corpus-sized key set, and
pay the exact verify join only for the Bloom-positive sliver (the same
candidates-then-verify-once economics as the banded LSH dedup).

Representation — *a Bloom filter as a relation*: ``m`` bits sharded
into 60-bit words, one row ``(word_idx BIGINT, word BIGINT)`` per
NON-EMPTY word. Building is one ``explode(k positions) → groupBy(
word_idx) → bit_or(mask)`` — fully distributed, one shuffle whose
width is ``min(n_keys·k, m/60)`` rows. Merging blooms of the same
geometry is ``union → bit_or`` (a commutative monoid, so incremental
maintenance parallels ``streaming/aggmaint.py``). Probing explodes a
probe key's ``k`` (word_idx, mask) pairs, joins the words relation on
``word_idx`` (broadcast when the filter is small; range-pruned scan
when it is not — ``save_bloom_index`` writes words CLUSTERED by
word_idx exactly so that a probe batch's word working set row-group-
skips, the same layout-is-the-index design as the BM25 postings), and
declares membership when every probed bit is set.

Hash math is EXACT integer arithmetic on md5-derived values, so any
engine reproduces every bit (the ``dedup.py:md5_hash60`` portability
contract): ``h1`` = first 15 md5 hex chars, ``h2`` = hex chars 17..31,
and position ``i`` is Kirsch-Mitzenmacher double hashing

    pos_i = (h1 % m  +  i · (h2 % (m-1) + 1)) % m      for i in 0..k-1

(stride in [1, m-1] so the k probes never degenerate to one bit).
Words are 60 bits wide so every mask is a POSITIVE long — no engine-
dependent signed-shift / two's-complement edge at bit 63. The DuckDB
twins mirror each step: ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``,
``//``, ``%``, ``<<``, ``bit_or(...)``, ``bool_and(...)``.

False positives are a *sizing* outcome, never a correctness one: a
member key is ALWAYS reported member (no false negatives — pinned by a
property test), so ``probe → filter → exact verify join`` returns
exactly the plain join's rows. The registered audit queries
(``queries_ext10.py``) measure the realized FP rate and fill ratio
against the exact answer — the monitoring a deployed filter needs,
because fill only grows as the corpus does.

Reference anchor: the reference pipeline's duplicate/membership checks
are pandas ``isin``/drop-duplicates passes over the full frame
(``project/data_quality_checker.py``); this module is the scale form
of the same "have we seen this key?" question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from _data_engineering_pipeline_project_spark.functions.localrel import local_df

WORD_BITS = 60  # masks stay positive longs; house md5 keys are 60-bit too

# element_at is 1-based; index with (pos % 60) + 1
_MASKS = [1 << b for b in range(WORD_BITS)]


def _h1_h2(key: Column) -> tuple[Column, Column]:
    """Two independent 60-bit integer hashes from ONE md5: hex chars
    1-15 and 17-31 (char 16 is skipped so a typo'd overlap can never
    correlate them). Exact-integer portable — see md5_hash60."""
    h = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
    return h1, h2


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the ``k`` bit positions (in ``[0, m_bits)``) the key
    sets/probes — Kirsch-Mitzenmacher double hashing, exact integer
    math (h1, h2 < 2^60; i·stride < k·m ≪ 2^63, no overflow)."""
    if m_bits < 2:
        raise ValueError("m_bits must be >= 2")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    h1, h2 = _h1_h2(key)
    base = h1 % F.lit(m_bits)
    stride = h2 % F.lit(m_bits - 1) + F.lit(1)
    return F.array(
        *[(base + F.lit(i) * stride) % F.lit(m_bits) for i in range(k)]
    )


def _pairs(df: DataFrame, key: Column, m_bits: int, k: int) -> DataFrame:
    """Explode a key relation into its (word_idx, mask) probe pairs."""
    masks = F.array(*[F.lit(v).cast("long") for v in _MASKS])
    return df.select(
        "*", F.explode(bloom_positions(key, m_bits, k)).alias("pos")
    ).select(
        "*",
        F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
        F.element_at(
            masks, (F.col("pos") % WORD_BITS).cast("int") + F.lit(1)
        ).alias("mask"),
    )


def bloom_build(
    df: DataFrame, key: Column, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build the words relation ``(word_idx, word)`` for the key
    column: one explode + one groupBy(word_idx).bit_or — the only
    shuffle, bounded by ``min(n_keys·k, m_bits/60)`` rows. Empty words
    are not materialized (probe treats absent as all-zero). NULL keys
    are dropped up front — membership of NULL is undefined (the probe
    returns a NULL verdict for them), and without the filter a NULL
    key would materialize a junk (NULL, NULL) words row that violates
    the non-empty-word invariant and would persist into artifacts
    (code-review r10)."""
    return (
        _pairs(
            df.select(key.alias("__k")).filter(F.col("__k").isNotNull()),
            F.col("__k"),
            m_bits,
            k,
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    words: DataFrame,
    df: DataFrame,
    key: Column,
    m_bits: int,
    k: int,
    flag: str = "bloom_member",
) -> DataFrame:
    """Annotate ``df`` with a membership flag: every one of the key's
    ``k`` probed bits set in the words relation. Plan: DISTINCT probe
    keys (dedups the hash work and makes duplicate input rows safe),
    explode k probe pairs, ONE left join on word_idx (AQE broadcasts a
    small filter; a persisted one is word_idx-clustered so the scan
    prunes), bool_and back to one row per key, then a key-equi join
    re-attaches the flag to every input row. Missing word row = zero
    word = not set. No false negatives: a key that was built in always
    probes its own bits.

    Raises on a column-name collision (advice r10): if ``df`` already
    carries ``__k`` (internal join key) or ``flag`` — e.g. probing an
    already-annotated frame twice — the re-attach join would be
    ambiguous / emit duplicate column names downstream; fail loudly
    like the bloom geometry guard instead."""
    if "__k" in df.columns:
        raise ValueError(
            "bloom_probe input already has a column named '__k' "
            "(internal join key); rename it before probing"
        )
    if flag in df.columns:
        raise ValueError(
            f"bloom_probe input already has a column named {flag!r}; "
            "pass a different flag= (probing an annotated frame twice?)"
        )
    keys = df.select(key.alias("__k")).distinct()
    flags = (
        _pairs(keys, F.col("__k"), m_bits, k)
        .join(words, "word_idx", "left")
        .withColumn(
            "__ok",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")))
            == F.col("mask"),
        )
        .groupBy("__k")
        .agg(F.bool_and("__ok").alias(flag))
    )
    return df.join(flags, key == F.col("__k"), "left").drop("__k")


def bloom_merge(*words: DataFrame) -> DataFrame:
    """Merge same-geometry blooms: union → bit_or. Exactly equals the
    bloom of the unioned key sets (bit_or is a commutative monoid) —
    the property incremental maintenance rests on."""
    if not words:
        raise ValueError("need at least one words relation")
    out = words[0]
    for w in words[1:]:
        out = out.unionByName(w)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


# --------------------------------------------------------------------------
# Parquet artifact: persist once, probe from any session
# --------------------------------------------------------------------------
def save_bloom_index(
    df: DataFrame,
    key: Column,
    path: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    num_files: int | None = None,
    row_group_bytes: int = 1 << 20,
) -> None:
    """Persist the filter as ``path/words`` (range-clustered by
    word_idx so a probe batch's word set row-group-skips — layout is
    the index) + ``path/params`` (geometry, so a loader can never
    probe with mismatched (m, k) and silently lose the no-false-
    negative guarantee).

    ``row_group_bytes`` (VERDICT r10 #3): words rows are 16 bytes, and
    probe reads are LOOKUP-shaped — a batch touches ≤ distinct_keys·k
    scattered indices — so the skip granularity that matters is the
    row group, and parquet's 128 MB default would put a whole file's
    words in ONE group (nothing ever skips within a file). Small
    groups make the pushed working-set filter
    (``bloom_probe_index(prune_scan=True)``) decode ~the probed groups
    only — measured at 64 KB groups: a 10-key probe decodes 3.6% of a
    3.3M-word filter (SCALE.md r11) — at ~0.1-1% footer overhead.
    Size it to the SERVING shape: groups of ~rows/probe-batch·k or
    smaller; full-scan merges lose nothing material (same bytes, more,
    smaller groups)."""
    spark = df.sparkSession
    words = bloom_build(df, key, m_bits, k)
    n = num_files or max(1, spark.sparkContext.defaultParallelism // 4)
    (
        words.repartitionByRange(n, "word_idx")
        .sortWithinPartitions("word_idx")
        .write.mode("overwrite")
        .option("parquet.block.size", str(int(row_group_bytes)))
        .parquet(f"{path}/words")
    )
    local_df(
        spark,
        [(int(m_bits), int(k), WORD_BITS, "bloom-words-v1")],
        "m_bits long, k int, word_bits int, format string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def load_bloom_index(spark: SparkSession, path: str) -> dict:
    """Load a :func:`save_bloom_index` artifact → plain parquet scan +
    geometry. Fails fast on a format/word-width mismatch."""
    params = spark.read.parquet(f"{path}/params").collect()[0]
    if params["format"] != "bloom-words-v1" or params["word_bits"] != WORD_BITS:
        raise ValueError(
            f"incompatible bloom artifact at {path}: {params['format']}/"
            f"{params['word_bits']} (rebuild with save_bloom_index)"
        )
    return {
        "words": spark.read.parquet(f"{path}/words"),
        "m_bits": int(params["m_bits"]),
        "k": int(params["k"]),
    }


def probe_word_working_set(
    df: DataFrame, key: Column, m_bits: int, k: int
) -> list[int]:
    """The DISTINCT word indices a probe batch will touch — bounded by
    ``distinct_keys · k`` (each key probes exactly k words). This is
    the scan predicate that makes the word_idx-clustered artifact
    layout pay off: filtering the words scan to this set lets the
    parquet reader row-group-skip everything else."""
    rows = (
        _pairs(
            df.select(key.alias("__k")).filter(F.col("__k").isNotNull()).distinct(),
            F.col("__k"),
            m_bits,
            k,
        )
        .select("word_idx")
        .distinct()
        .collect()
    )
    return sorted(int(r["word_idx"]) for r in rows)


def bloom_probe_index(
    index: dict,
    df: DataFrame,
    key: Column,
    flag: str = "bloom_member",
    prune_scan: bool = False,
    max_probe_words: int = 1 << 12,
) -> DataFrame:
    """Probe against a loaded artifact with its own persisted geometry.

    ``prune_scan=True`` (VERDICT r10 #3) first computes the batch's
    word WORKING SET (:func:`probe_word_working_set` — one bounded job
    over the probe batch, ≤ distinct_keys·k indices) and reads the
    words relation through an ``IN`` filter on it. Because
    ``save_bloom_index`` writes words range-clustered by ``word_idx``
    in small row groups, the pushed filter row-group-skips: a 10-key
    probe against a 3.3M-word filter decodes 3.6% of the relation and
    runs faster end-to-end (measured, SCALE.md r11). This is a
    POINT-LOOKUP optimization: hashing spreads the working set
    uniformly, so once ``distinct_keys·k`` approaches the row-group
    count the set touches every group (measured: a 100-key batch
    decodes 30% and the extra working-set job makes it a wash) — bulk
    ingest batches should keep the default full-scan join, which is
    the right plan for them anyway. Correctness is identical either
    way — a word no probe key touches cannot affect any verdict
    (absent word = all-zero = same as filtered out), pinned by an
    equality test. Working sets past ``max_probe_words`` fall back to
    the full scan (IN-plan build cost grows with the list; measured
    ~1.5 s at 3k values)."""
    if not prune_scan:
        return bloom_probe(
            index["words"], df, key, index["m_bits"], index["k"], flag
        )
    idxs = probe_word_working_set(df, key, index["m_bits"], index["k"])
    words = index["words"]
    if 0 < len(idxs) <= max_probe_words:
        # the IN must reach the parquet footer as POINT predicates:
        # past spark.sql.parquet.pushdown.inFilterThreshold (default
        # 10) Spark pushes only the [min, max] RANGE of the list, and
        # a working set hashed uniformly over the word domain spans
        # ~everything — measured: 721k of 736k rows decoded vs 82k
        # with the points pushed. Runtime-settable SQLConf; raising it
        # only affects IN pushdown strategy, and the working set is
        # already bounded by max_probe_words. Deliberately NOT
        # restored after this call: the returned frame is LAZY — the
        # conf must still hold when it executes — and the change is
        # monotone (raise-only, bounded), affecting only how IN lists
        # reach parquet footers.
        spark = words.sparkSession
        cur = int(
            spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
        )
        if cur < len(idxs):
            spark.conf.set(
                "spark.sql.parquet.pushdown.inFilterThreshold",
                str(int(max_probe_words)),
            )
        words = words.filter(F.col("word_idx").isin(idxs))
    return bloom_probe(words, df, key, index["m_bits"], index["k"], flag)


def bloom_merge_indexes(*indexes: dict) -> dict:
    """Merge LOADED artifacts (:func:`load_bloom_index` dicts) into one
    in-memory index. Geometry is validated FIRST: bit_or of words built
    with different (m_bits, k) is silent garbage — the merged relation
    would answer probes with neither filter's guarantee — so a mismatch
    raises (the maintainer's geometry-guard discipline, extended to the
    artifact-merge path; adversarial-artifact sweep r11)."""
    if not indexes:
        raise ValueError("need at least one index")
    geo = {(ix["m_bits"], ix["k"]) for ix in indexes}
    if len(geo) != 1:
        raise ValueError(
            "bloom geometry mismatch across artifacts: "
            f"{sorted(geo)} — words of different (m_bits, k) cannot be "
            "merged (silent garbage); rebuild at one geometry"
        )
    return {
        "words": bloom_merge(*[ix["words"] for ix in indexes]),
        "m_bits": indexes[0]["m_bits"],
        "k": indexes[0]["k"],
    }


def bloom_prefilter_semi_join(
    corpus_keys: DataFrame,
    probe: DataFrame,
    key: Column,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """The operational composition: rows of ``probe`` whose key exists
    in ``corpus_keys`` (single column), computed as bloom-prefilter →
    exact left_semi verify. Returns EXACTLY the plain semi-join's rows
    (no false negatives; the verify join removes false positives) —
    pinned by test — while the corpus-sized join sees only the Bloom-
    positive sliver. At 100 TB ingest, where most documents are new,
    that sliver IS the cost."""
    words = bloom_build(corpus_keys, F.col(corpus_keys.columns[0]), m_bits, k)
    cand = bloom_probe(words, probe, key, m_bits, k, "__bloom").filter(
        F.col("__bloom")
    ).drop("__bloom")
    return cand.join(
        corpus_keys.withColumnRenamed(corpus_keys.columns[0], "__ck"),
        key == F.col("__ck"),
        "left_semi",
    )


# --------------------------------------------------------------------------
# SQL twins (DuckDB) — mirror every arithmetic step above
# --------------------------------------------------------------------------
def bloom_pos_sql(key_expr: str, m_bits: int, k: int) -> str:
    """DuckDB list of the k positions for ``key_expr`` — the exact twin
    of :func:`bloom_positions` (same md5 slices, same double-hash)."""
    h = f"md5(CAST({key_expr} AS VARCHAR))"
    h1 = f"CAST('0x' || substr({h}, 1, 15) AS BIGINT)"
    h2 = f"CAST('0x' || substr({h}, 17, 15) AS BIGINT)"
    idx = "[" + ", ".join(str(i) for i in range(k)) + "]"
    return (
        f"list_transform({idx}, i -> "
        f"(({h1} % {m_bits}) + i * (({h2} % {m_bits - 1}) + 1)) % {m_bits})"
    )


WORD_SQL = f"(pos // {WORD_BITS})"
MASK_SQL = f"(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INTEGER))"
