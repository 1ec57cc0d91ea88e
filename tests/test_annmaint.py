"""Incremental IVF index maintainer (`streaming/annmaint.py`):
incremental ingest must equal a one-shot batch assignment, search must
match the batch IVF ranking exactly, planted duplicates must be found,
and the probe filter must reach the list scan as a PARTITION filter
(the read-less-than-the-corpus contract)."""

from __future__ import annotations

import math
import os
import re

import pytest
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.streaming.annmaint import (
    IvfIndexMaintainer,
)

DIM = 8


def _vecs(spark, ids):
    rows = [
        (int(i), [float(math.sin(i * 0.7 + j * 1.3)) for j in range(DIM)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_incremental_ingest_equals_batch_assignment(spark, tmp_path):
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        ivf_assign,
    )

    m = IvfIndexMaintainer(str(tmp_path / "idx"), dim=DIM, num_centroids=4)
    seed = _vecs(spark, range(30))
    m.fit(seed)
    for lo in (0, 30, 60):  # three batches, the first IS the seed set
        m.ingest(_vecs(spark, range(lo, lo + 30)))

    got = {
        r["vec_id"]: r["centroid_id"]
        for r in m.stored(spark).select("vec_id", "centroid_id").collect()
    }
    want = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(_vecs(spark, range(90)), m.centroids(spark))
        .select("vec_id", "centroid_id")
        .collect()
    }
    assert got == want and len(got) == 90

    # immutability contract: a second fit must refuse
    with pytest.raises(FileExistsError):
        m.fit(seed)


def test_search_finds_planted_duplicate_and_prunes_partitions(
    spark, tmp_path
):
    m = IvfIndexMaintainer(str(tmp_path / "idx"), dim=DIM, num_centroids=4)
    corpus = _vecs(spark, range(60))
    m.fit(corpus)
    m.ingest(corpus)

    # queries ARE corpus vectors (ids 3, 17) under fresh ids: the
    # planted duplicate must surface as the top hit with cosine 1.0
    q = corpus.filter(F.col("vec_id").isin(3, 17)).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    out = m.search(q, k=3, nprobe=2)
    top = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in out.filter(F.col("rnk") == 1).collect()
    }
    assert top[1003] == (3, 1.0)
    assert top[1017] == (17, 1.0)

    # read-less-than-the-corpus contract, pinned on the ACTUAL file set
    # (stronger than the pre-r7 PartitionFilters plan grep): every file
    # the search opens must belong to a probed list — with 2 queries ×
    # nprobe=2 over 4 lists, at least one list must go entirely unread
    files = out.inputFiles()
    assert files, "search read no files"
    touched = {
        int(hit.group(1))
        for f in files
        for hit in [re.search(r"(?:centroid_id=|lists_compact/)(\d+)", f)]
        if hit
    }
    all_lists = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(str(tmp_path / "idx"), "lists"))
        if d.startswith("centroid_id=")
    }
    assert touched < all_lists, (touched, all_lists)  # proper subset


def test_compact_hot_lists_drops_files_search_identical(spark, tmp_path):
    """Hot-list compaction (r7, VERDICT r6 task #8): many small ingest
    batches accrete files per list; one compaction tick must fold hot
    lists into a single clustered generation (data file count drops),
    leave cold lists untouched, and be a LAYOUT-ONLY rewrite — search
    results bit-identical before/after. The per-list protocol is the
    crash-safe ``CompactionMaintainer`` composed per inverted list, so
    the manifest/pointer guarantees are inherited, not re-proven."""
    m = IvfIndexMaintainer(str(tmp_path / "idx"), dim=DIM, num_centroids=4)
    corpus = _vecs(spark, range(80))
    m.fit(corpus)
    # 8 slices -> up to 8 files in every non-empty list
    for s in range(8):
        m.ingest(corpus.filter(F.col("vec_id") % 8 == s))

    def data_files():
        out = []
        for root, _dirs, fs in os.walk(str(tmp_path / "idx")):
            if "centroids" in root:
                continue
            out.extend(os.path.join(root, f) for f in fs
                       if f.endswith(".parquet"))
        return out

    queries = corpus.filter(F.col("vec_id") < 4)
    before_files = len(data_files())
    before = sorted(
        tuple(r) for r in m.search(queries, k=5, nprobe=2).collect()
    )

    out = m.compact_hot_lists(spark, min_files=4)
    assert any(v.get("compacted") for v in out.values()), out
    after_files = len(data_files())
    assert after_files < before_files, (before_files, after_files)

    after = sorted(
        tuple(r) for r in m.search(queries, k=5, nprobe=2).collect()
    )
    assert after == before and len(before) > 0

    # stored() serves every vector exactly once across gen ∪ landing
    ids = sorted(r["vec_id"] for r in m.stored(spark).collect())
    assert ids == list(range(80))

    # a fresh ingest after compaction lands in the (now empty) landing
    # dirs and is immediately visible
    m.ingest(_vecs(spark, [500]))
    assert m.stored(spark).filter(F.col("vec_id") == 500).count() == 1


def test_search_matches_batch_ivf_ranking(spark, tmp_path):
    """Same data, same centroids → the incremental index's search must
    return EXACTLY the batch ``topk_cosine_ivf`` rows (ranking
    arithmetic is shared)."""
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        topk_cosine_ivf,
    )

    corpus = _vecs(spark, range(60))
    m = IvfIndexMaintainer(str(tmp_path / "idx"), dim=DIM, num_centroids=4)
    m.fit(corpus)
    # ingest in two arbitrary slices — layout must not matter
    m.ingest(corpus.filter(F.col("vec_id") % 3 == 0))
    m.ingest(corpus.filter(F.col("vec_id") % 3 != 0))

    queries = corpus.filter(F.col("vec_id") < 4)
    got = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in m.search(queries, k=5, nprobe=2).collect()
    }
    want = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in topk_cosine_ivf(
            corpus, queries, k=5, nprobe=2, num_centroids=4
        ).collect()
    }
    assert got == want and len(want) > 0
