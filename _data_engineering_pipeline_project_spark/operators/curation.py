"""LLM training-corpus curation operators beyond dedup/quality scoring:
chunking, repetition scoring, benchmark decontamination, sequence packing.

All hot paths are native column expressions (sequence/transform/substring/
explode run inside whole-stage codegen over the scan — no Python per row);
packing is the one genuinely imperative step and runs as applyInPandas
per salt-partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap —
    the context-window preprocessing step of every RAG/pretraining
    pipeline (token-exact chunking swaps ``substring`` for a tokenizer
    UDF; the distributed shape is identical).

    Native plan: ``sequence()`` generates chunk start offsets per row,
    ``explode`` fans them out inside the stage, ``substring`` slices —
    one scan, no shuffle, no Python. Chunk i starts at i*(chunk-overlap)
    (1-based); a final short chunk keeps the tail. Empty/null docs yield
    zero chunks."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    n_chunks = F.ceil(
        F.greatest(F.length(text_col) - F.lit(overlap), F.lit(1)) / F.lit(stride)
    ).cast("int")
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            text_col,
        )
        .select(
            id_col,
            "chunk_idx",
            F.substring(
                F.col(text_col), F.col("chunk_idx") * stride + 1, chunk_chars
            ).alias("chunk"),
        )
    )


def _word_ngrams(ws: Column, k: int) -> Column:
    """Word k-grams of a MATERIALIZED token-array column. ``ws`` must be
    a plain column attribute, not the split expression itself — Catalyst
    does not CSE inside lambda bodies, so an inline split would re-run
    per element access (O(tokens²) per row; same pitfall
    dedup._shingle_table documents)."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(ws) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, k)),
    )


def repeated_ngram_ratio(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signal: fraction of word n-gram
    OCCURRENCES that are repeats of an n-gram already seen in the same
    document (0 = all distinct, →1 = the doc loops). High values flag
    boilerplate/spam/generation loops for corpus filtering.

    Plan: ZERO shuffles — repetition is a per-document property, so
    total and distinct gram counts are array expressions
    (size / size∘array_distinct) inside whole-stage codegen; the
    explode→groupBy(doc, gram)→groupBy(doc) formulation this replaces
    shuffled every gram occurrence twice for a result each row already
    contains. Staged projections keep split → grams → sizes as separate
    non-collapsed projects (CollapseProject won't duplicate non-cheap
    expressions), so tokenization and gram-building each run once per
    row. ratio = 1 - distinct/total as exact int division."""
    toked = df.filter(F.length(text_col) > 0).select(
        id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("__ws")
    )
    gramd = toked.select(
        id_col, _word_ngrams(F.col("__ws"), n).alias("__g")
    )
    sized = gramd.select(
        id_col,
        F.size("__g").cast("long").alias("total_ngrams"),
        F.size(F.array_distinct("__g")).cast("long").alias("distinct_ngrams"),
    )
    return sized.select(
        id_col,
        "total_ngrams",
        "distinct_ngrams",
        F.round(
            1 - F.col("distinct_ngrams") / F.col("total_ngrams"), 6
        ).alias("repeat_ratio"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Benchmark decontamination: drop training documents sharing ≥
    ``min_hits`` distinct word n-grams with any benchmark/eval document —
    the standard guard against test-set leakage into a training corpus.

    Plan: benchmark n-grams (small) are distinct-collected and BROADCAST;
    the corpus side explodes its n-grams once and semi-joins the
    broadcast set — the 100 TB corpus never shuffles. Token arrays are
    materialized in their own projection before gram-building (see
    ``_word_ngrams``'s no-CSE-in-lambdas note). Returns
    (clean, contaminated) where contaminated carries the hit count."""
    bench_grams = (
        benchmark.filter(F.length(bench_text_col) > 0)
        .select(F.split(F.trim(F.col(bench_text_col)), r"\s+").alias("__ws"))
        .select(F.explode(_word_ngrams(F.col("__ws"), n)).alias("gram"))
        .distinct()
    )
    corpus_grams = (
        corpus.filter(F.length(text_col) > 0)
        .select(id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("__ws"))
        .select(
            id_col,
            F.explode_outer(
                F.array_distinct(_word_ngrams(F.col("__ws"), n))
            ).alias("gram"),
        )
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
        .filter(F.col("n_contaminated_ngrams") >= min_hits)
    )
    contaminated = corpus.join(hits, id_col)
    clean = corpus.join(hits.select(id_col), id_col, "left_anti")
    return clean, contaminated


def pack_sequences(
    df: DataFrame,
    max_len: int = 512,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    num_partitions: int = 32,
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-capacity bins
    (training batches) so short docs share a context window instead of
    padding it — first-fit-decreasing per partition via applyInPandas.

    Distribution note: bins never span partitions (each partition packs
    independently and bin ids are globally disambiguated by partition id),
    so the operator is one hash-repartition + an Arrow-batched pass —
    FFD inside a partition is the imperative step Spark expressions can't
    express. Per-partition packing costs at most one extra bin per
    partition vs a global pack, which is noise at scale. Docs longer than
    ``max_len`` get a singleton bin (truncation is the caller's policy).

    The first-fit search is a leftmost-fit SEGMENT TREE over bin slots
    (internal nodes hold the subtree's max remaining capacity; a
    left-preferring root descent lands on the FIRST bin that fits), so
    a partition packs in O(n log n) instead of the naive scan's
    O(n × bins) — the term the r8 100× sweep surfaced as an 11.8× wall
    ratio (quadratic in docs-per-partition; deployments also scale
    ``num_partitions`` to bound it). The tree returns exactly the bin
    the linear scan would, so assignments are byte-identical."""
    out_schema = f"{id_col} long, bin_id string, bin_fill long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        part = pdf["pid"].iloc[0]
        pdf = pdf.sort_values(len_col, ascending=False)
        lens = pdf[len_col].clip(upper=max_len).astype("int64").tolist()
        size = 1
        while size < max(len(lens), 1):
            size *= 2
        tree = [0] * (2 * size)  # leaves: remaining capacity per bin slot
        nbins = 0
        assign: list[int] = []
        for ln in lens:
            if nbins and tree[1] >= ln:
                i = 1
                while i < size:
                    i = 2 * i if tree[2 * i] >= ln else 2 * i + 1
                placed = i - size
                tree[i] -= ln
            else:
                placed = nbins
                nbins += 1
                i = size + placed
                tree[i] = max_len - ln
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2
            assign.append(placed)
        fills = [max_len - tree[size + b] for b in range(nbins)]
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "bin_id": [f"{part}_{a}" for a in assign],
                "bin_fill": [fills[a] for a in assign],
            }
        )

    prepped = (
        df.select(id_col, len_col)
        .repartition(num_partitions, id_col)
        .withColumn("pid", F.spark_partition_id())
    )
    return prepped.groupBy("pid").applyInPandas(pack, schema=out_schema)


def chunk_by_tokens(
    df: DataFrame,
    chunk_tokens: int = 50,
    overlap_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-boundary chunking: fixed windows of whitespace tokens with
    overlap — splits never land mid-word (the char-based
    ``chunk_documents`` is the byte-budget variant). Same zero-shuffle
    native plan: split → sequence → explode → slice → concat. For a real
    BPE tokenizer, swap the ``split`` for an Arrow-batched tokenizer UDF
    producing the token array; every downstream expression (windowing,
    slicing, joining) is unchanged — the tokenizer is the only seam."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(
        F.greatest(F.size(words) - F.lit(overlap_tokens), F.lit(1)) / F.lit(stride)
    ).cast("int")
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            id_col,
            words.alias("__w"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(
                " ",
                F.slice(F.col("__w"), F.col("chunk_idx") * stride + 1, chunk_tokens),
            ).alias("chunk"),
            F.least(
                F.size("__w") - F.col("chunk_idx") * stride, F.lit(chunk_tokens)
            ).alias("n_tokens"),
        )
    )


def chunk_by_bpe_tokens(
    df: DataFrame,
    merges: list[tuple[bytes, bytes]],
    chunk_tokens: int = 50,
    overlap_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TOKENIZER-exact chunking: fixed windows of real BPE tokens with
    overlap — the production form of ``chunk_by_tokens``'s documented
    seam (functions/bpe.py). Two Arrow-batched UDF hops bracket a fully
    JVM-side windowing core:

      encode (text → array<int>, one UDF pass over each doc)
        → sequence/explode/slice windows (codegen, zero shuffle)
        → decode (id slice → chunk text, one UDF pass per chunk)

    Chunk boundaries are exact in token space (a chunk holds exactly
    ``chunk_tokens`` ids except the tail), and decoding merges byte-level
    tokens back losslessly, so ``concat(chunks)`` minus overlaps
    reconstructs the document byte-for-byte."""
    from _data_engineering_pipeline_project_spark.functions.bpe import (
        bpe_decode,
        bpe_token_ids,
    )

    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    ids = df.filter(F.length(text_col) > 0).select(
        id_col, bpe_token_ids(text_col, merges).alias("__ids")
    )
    n_chunks = F.ceil(
        F.greatest(F.size("__ids") - F.lit(overlap_tokens), F.lit(1)) / F.lit(stride)
    ).cast("int")
    sliced = ids.select(
        id_col,
        F.col("__ids"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        id_col,
        "chunk_idx",
        F.slice(
            F.col("__ids"), F.col("chunk_idx") * stride + 1, chunk_tokens
        ).alias("__chunk_ids"),
    )
    return sliced.select(
        id_col,
        "chunk_idx",
        bpe_decode("__chunk_ids", merges).alias("chunk"),
        F.size("__chunk_ids").alias("n_tokens"),
    )


def dedup_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Corpus-wide line-level deduplication (the CCNet / RefinedWeb
    paragraph-dedup step): a line occurrence survives only if it is the
    FIRST occurrence of that exact line text in the whole corpus, ordered
    by (id, position). Repeats within the same document dedup too.

    Adds a boolean ``kept`` column; callers filter and reassemble with
    :func:`reassemble_documents`.

    Scale shape: ONE shuffle, partitioned by the line text — exactly the
    exact-dup groupBy shape (dedup.py exact path), so boilerplate lines
    (cookie banners, nav menus) that recur across millions of pages
    collapse in a single hash exchange. Skew note: an empty/whitespace
    line repeated corpus-wide is a hot key; at 100 TB pre-filter such
    degenerate lines (or salt them) — the row_number within a line-text
    partition is otherwise a single-task sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(line_col).orderBy(id_col, pos_col)
    return lines.withColumn(
        "kept", F.row_number().over(w) == 1
    )


def reassemble_documents(
    flagged: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "line_no",
    line_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """Rebuild documents from :func:`dedup_lines` output: kept lines are
    re-joined in position order; per-document removal stats come along.

    One groupBy on the document id (the natural partitioning of every
    downstream per-doc op); ``array_sort`` over struct(pos, line) orders
    lines inside the aggregation buffer, so there is no window sort."""
    kept_struct = F.when(
        F.col("kept"), F.struct(F.col(pos_col).alias("p"), F.col(line_col).alias("l"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("n_removed"),
            F.array_sort(
                F.collect_list(kept_struct)
            ).alias("__kept"),
        )
        .select(
            id_col,
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["l"]), sep
            ).alias("text_clean"),
            F.col("n_lines").cast("int").alias("n_lines"),
            F.col("n_removed").cast("int").alias("n_removed"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring deduplication with span REMOVAL — the "dedup at the
    substring level" step of modern pretraining pipelines (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    k-token span that occurs more than once corpus-wide is removed from all
    but its first occurrence, and the surviving tokens are re-joined into
    the cleaned document.

    The reference engines implement this with a corpus-wide suffix array;
    the relational re-expression is a k-gram occurrence table:

    1. per-doc token array (one codegen'd projection, no shuffle);
    2. k-gram occurrences ``(doc, start, gram)`` via
       ``transform(sequence(..)) + posexplode`` — still scan-side;
    3. the FIRST occurrence per gram is a partial-aggregating
       ``groupBy(gram).agg(min(occurrence_key))`` — a hash aggregate, not a
       window, so a corpus-hot gram never forces a per-gram sort (skew in
       the join-back is AQE-split);
    4. every non-first occurrence marks its k token positions covered
       (explode + distinct keyed on (doc, pos) — co-partitioned with the
       token relation by AQE);
    5. covered tokens are anti-joined away and the survivors re-joined in
       position order inside one aggregation buffer.

    Occurrence keys are ``doc_id * 1_000_000 + start`` — exact int64
    ordering reproducible in any engine (positions are bounded far below
    1e6 by the chunking upstream of any realistic corpus; the guard
    asserts nothing silently wraps).

    Output: ``(doc_id, text_clean, n_tokens, n_removed)``; documents
    shorter than ``k`` tokens pass through untouched.
    """
    toks_arr = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("__toks"),
    ).select(id_col, "__toks", F.size("__toks").alias("__n"))

    # (doc, start, gram) occurrences; start is 1-based. Guarded sequence so
    # docs shorter than k contribute no grams (sequence(1,0) would error).
    grams = (
        toks_arr.filter(F.col("__n") >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__n") - k + 1),
                    lambda i: F.array_join(F.slice("__toks", i, k), " "),
                )
            ).alias("__p0", "gram"),
        )
        .select(
            id_col,
            (F.col("__p0") + 1).alias("start"),
            "gram",
            (F.col(id_col) * 1_000_000 + F.col("__p0") + 1).alias("__occ"),
        )
    )
    first_occ = grams.groupBy("gram").agg(F.min("__occ").alias("__first"))
    dup_occ = (
        grams.join(first_occ, "gram")
        .filter(F.col("__occ") != F.col("__first"))
        .select(id_col, "start")
    )
    covered = (
        dup_occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + k - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    token_rel = toks_arr.select(
        id_col, F.posexplode("__toks").alias("__p0", "term")
    ).select(id_col, (F.col("__p0") + 1).alias("seq"), "term")
    kept = token_rel.alias("t").join(
        covered.alias("c"),
        (F.col(f"t.{id_col}") == F.col(f"c.{id_col}"))
        & (F.col("t.seq") == F.col("c.pos")),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("__kept_n"),
    )
    return (
        toks_arr.select(id_col, "__n")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.col("__n").cast("int").alias("n_tokens"),
            (F.col("__n") - F.coalesce("__kept_n", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )
