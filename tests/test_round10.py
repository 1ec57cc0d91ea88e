"""Round-10 brief: ADVICE r9 fixes (oracle zero-span guard, zorderk_sql
guard, unsplittable-codec coverage, quantized lane clamp), equi-depth
z-order quantization, BM25 incremental maintenance + de-cached build,
distributed layout audit, and the listing-economy guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --- ADVICE r9 fixes ---------------------------------------------------------


def test_zorderk_sql_guard_matches_spark_twin(spark):
    """Both twins reject k·bits > 62 loudly (ADVICE r9 #2): a caller
    mismatching params must not get silently sign-overflowing BIGINT
    terms in the oracle while the Spark side raises."""
    from _data_engineering_pipeline_project_spark.functions.zorder import (
        zorderk,
        zorderk_sql,
    )

    with pytest.raises(ValueError):
        zorderk_sql(["a", "b"], bits=32)
    with pytest.raises(ValueError):
        zorderk([F.col("a"), F.col("b")], bits=32)
    # the boundary itself is legal in both
    assert zorderk_sql(["a"], bits=62).count(">>") == 62


def test_unsplittable_suffixes_cover_xz_lzma_lzo():
    """ADVICE r9 #3: .xz/.lzma/.lzo are stream-compressed (or
    index-dependent) — one scan partition per file; counting them as
    splittable would overestimate width and skip a needed widen."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        _file_is_splittable,
    )

    for suf in (".xz", ".lzma", ".lzo", ".gz", ".zst"):
        assert not _file_is_splittable(f"/data/part-0.json{suf}")
    # .bz2 is block-splittable in Hadoop — must stay splittable
    assert _file_is_splittable("/data/part-0.json.bz2")
    assert _file_is_splittable("/data/part-0.snappy.parquet")


def test_zorder_oracle_constant_column_parity(spark):
    """ADVICE r9 #1: a constant keyed column (zero span) must agree
    between the Spark path (maps to 0) and the DuckDB oracle twin —
    which previously divided by zero. Runs the REGISTERED oracle SQL
    over a constant-nationkey table in DuckDB against the registered
    Spark query path on the same rows."""
    import duckdb
    import pandas as pd

    from _data_engineering_pipeline_project_spark import queries_ext9 as q9
    from _data_engineering_pipeline_project_spark.operators.layout import (
        with_zorder_key,
    )

    pdf = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_acctbal": [0.0, 10.5, 99.99, 42.0],
            "c_nationkey": [7, 7, 7, 7],  # constant -> zero span
        }
    )
    con = duckdb.connect()
    con.register("customer", pdf)
    oracle = {
        r[0]: r[1] for r in con.execute(q9._zorder_sql()).fetchall()
    }
    df = spark.createDataFrame(pdf)
    got = {
        r["c_custkey"]: r["z_key"]
        for r in with_zorder_key(
            df, ["c_acctbal", "c_nationkey"], bits=16, key_col="z_key"
        )
        .select("c_custkey", "z_key")
        .collect()
    }
    assert got == oracle
    # the constant lane contributes nothing: keys are the acctbal lane only
    assert got[1] == 0  # min of the non-constant lane -> curve origin


# --- equi-depth z-order quantization (VERDICT r10 brief #1) ------------------


def test_quantized_equi_depth_twins_and_null_semantics(spark):
    """Rank-quantization parity: the Spark higher-order count and the
    DuckDB list_filter twin produce identical buckets, including NULL
    (curve origin, bucket 0) and above-top-boundary values (bucket =
    len(bounds) — clamping is structural, the count can't exceed the
    ladder)."""
    import duckdb
    import pandas as pd

    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized_equi_depth,
        quantized_equi_depth_sql,
    )

    bounds = [1.0, 2.5, 10.0, 100.0]
    pdf = pd.DataFrame(
        {"id": [1, 2, 3, 4, 5], "v": [None, 0.5, 2.5, 50.0, 1e12]}
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = dict(
        con.execute(
            "SELECT id, "
            + quantized_equi_depth_sql("v", bounds)
            + " AS q FROM t"
        ).fetchall()
    )
    got = {
        r["id"]: r["q"]
        for r in spark.createDataFrame(pdf)
        .select("id", quantized_equi_depth(F.col("v"), bounds).alias("q"))
        .collect()
    }
    assert got == oracle == {1: 0, 2: 0, 3: 2, 4: 3, 5: 4}


def test_equi_depth_zorder_survives_pareto_where_minmax_fails(spark, tmp_path):
    """The r9 verdict's top-next item, measured: on a long-tailed
    (pareto-shaped) column, min/max quantization maps ~all rows into a
    handful of buckets — the curve degenerates to ordering on the other
    column and a selective predicate in the heavy region decodes the
    whole table. Equi-depth boundaries keep per-file spans tight in
    RANK space (the space row-count skipping actually lives in; raw
    value spans are blind to this failure — both modes look ~0.37),
    restoring the row-group skip. Thresholds sit well clear of the
    measured values (minmax rank-span 0.90 / full decode; equi-depth
    0.41 / ~25% decode at 16 files)."""
    pytest.importorskip("pyarrow")
    import glob

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from _data_engineering_pipeline_project_spark.operators.layout import (
        write_zordered_quantized,
    )
    from tests.test_round9 import _scan_output_rows

    rng = np.random.default_rng(7)
    n = 40_000
    v = np.exp(rng.uniform(0, 14, n))  # ~1 .. 1.2M, mass at the low end
    u = rng.integers(0, 1000, n).astype("int64")
    df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "v": v, "u": u})
    )
    mm, ed = str(tmp_path / "mm"), str(tmp_path / "ed")
    write_zordered_quantized(df, mm, ["v", "u"], bits=8, num_files=16)
    write_zordered_quantized(
        df, ed, ["v", "u"], bits=8, num_files=16, quantize="equi_depth"
    )

    sv = np.sort(v)

    def rank_spans(path):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    cc = md.row_group(rg).column(ci)
                    if cc.path_in_schema == "v" and cc.statistics:
                        st = cc.statistics
                        fmin = st.min if fmin is None else min(fmin, st.min)
                        fmax = st.max if fmax is None else max(fmax, st.max)
            if fmin is not None:
                spans.append(
                    (np.searchsorted(sv, fmax) - np.searchsorted(sv, fmin))
                    / n
                )
        return spans

    rs_mm, rs_ed = rank_spans(mm), rank_spans(ed)
    mm_avg, ed_avg = sum(rs_mm) / len(rs_mm), sum(rs_ed) / len(rs_ed)
    assert mm_avg > 0.7, mm_avg  # minmax demonstrably fails tightness
    assert ed_avg < 0.55, ed_avg  # ~sqrt(1/16) + quantile/sampling noise
    assert ed_avg < mm_avg / 1.6

    # the first-class operator (file_stat_spans_ranked — approxQuantile
    # CDF) agrees with these exact numpy ranks file-for-file, so the
    # honest audit doesn't live only inside this test
    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans_ranked,
    )

    for path, exact in ((mm, rs_mm), (ed, rs_ed)):
        approx = file_stat_spans_ranked(spark, path, "v")
        assert len(approx) == len(exact)
        for x, y in zip(sorted(approx), sorted(exact)):
            assert abs(x - y) < 0.05, (path, x, y)

    # runtime proof: a selective predicate in the HEAVY (low-value)
    # region — where the long tail parked ~all minmax buckets.
    # Thresholds allow for run-to-run row-group geometry drift
    # (repartitionByRange boundary sampling is re-seeded per execution;
    # observed ed decode 25-37% of the table vs minmax's 100%).
    p05 = float(np.quantile(v, 0.05))
    pred = F.col("v") <= p05
    true_n = int((v <= p05).sum())
    mm_rows = _scan_output_rows(spark, mm, pred)
    ed_rows = _scan_output_rows(spark, ed, pred)
    assert ed_rows >= true_n  # skipping never loses matches
    assert mm_rows > 0.9 * n, mm_rows  # minmax decodes ~everything
    assert ed_rows < mm_rows / 2, (ed_rows, mm_rows)

    # layout changes bytes-on-disk order only, never content
    got = sorted(
        map(tuple, spark.read.parquet(ed).select("id", "v", "u").collect())
    )
    want = sorted(map(tuple, df.select("id", "v", "u").collect()))
    assert got == want


def test_equi_depth_rejects_oversized_bits(spark):
    from _data_engineering_pipeline_project_spark.operators.layout import (
        write_zordered_quantized,
    )

    df = spark.range(4).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="equi_depth"):
        write_zordered_quantized(
            df, "/tmp/never-written", ["v"], bits=13, quantize="equi_depth"
        )
    with pytest.raises(ValueError, match="quantize mode"):
        write_zordered_quantized(
            df, "/tmp/never-written", ["v"], quantize="zcurve"
        )


# --- BM25 incremental maintenance (VERDICT r10 brief #2) ---------------------


def test_bm25_maintainer_matches_one_shot_build(spark, tmp_path):
    """N batches merged incrementally serve scores IDENTICAL to a
    one-shot save_bm25_index over the union — postings append (disjoint
    docs), dictionary dfs and n_docs/total_dl merge as monoids, and
    avgdl derives as the same exact-integer division the one-shot
    avg(dl) performs. Also pins: redelivery no-op, restart recovery
    from the pointer, compaction preserving scores, and the
    checkpoint-token guard."""
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_scores_from_index,
        load_bm25_index,
        save_bm25_index,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    terms = ["the", "data", "pipeline"]

    oneshot = str(tmp_path / "oneshot")
    save_bm25_index(docs, oneshot, num_files=4)
    expected = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_scores_from_index(
            load_bm25_index(spark, oneshot), terms
        ).collect()
    )
    assert len(expected) > 0

    base = str(tmp_path / "maint")
    m = Bm25Maintainer(spark, base, files_per_batch=2)
    m.bind_checkpoint("ckpt-A")
    for i in range(3):
        m.merge_batch(docs.filter(F.col("doc_id") % 3 == i), batch_id=i)
    assert m.version == 3

    def served(maint):
        return sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_scores_from_index(maint.serve_index(), terms).collect()
        )

    assert served(m) == expected

    # redelivery watermark: re-merging an old batch id is a no-op
    m.merge_batch(docs.filter(F.col("doc_id") % 3 == 0), batch_id=2)
    assert m.version == 3
    assert served(m) == expected

    # restart recovery: a fresh maintainer over the same dir resumes
    m2 = Bm25Maintainer(spark, base, files_per_batch=2)
    assert m2.version == 3
    assert served(m2) == expected

    # a different streaming checkpoint must fail loudly
    with pytest.raises(ValueError, match="checkpoint mismatch"):
        m2.bind_checkpoint("ckpt-B")

    # compaction folds 3 batch dirs into 1 without changing a score
    m2.compact()
    idx = m2.serve_index()
    assert len(m2._meta["batches"]) == 1
    assert served(m2) == expected
    # dl still rides in the compacted posting rows
    assert "dl" in idx["postings"].columns


def test_bm25_maintainer_streaming_available_now(spark, tmp_path):
    """Stream-driven e2e (the AggMaintainer pattern): document files
    land in a directory, run_available_now drains them through a real
    readStream + foreachBatch with checkpointed file discovery — each
    file folds exactly once across restarts — and the served scores
    match a one-shot build over everything landed."""
    import os

    from pyspark.sql import types as T

    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_scores_from_index,
        load_bm25_index,
        save_bm25_index,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = str(tmp_path / "docs_landing")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    m = Bm25Maintainer(spark, str(tmp_path / "idx"), files_per_batch=1)

    corpus = [
        (1, "spark shuffles data between stages"),
        (2, "an index amortizes the tokenize"),
        (3, "data data data everywhere"),
        (4, "the tokenize cost dominates builds"),
    ]
    for i, row in enumerate(corpus):
        spark.createDataFrame([row], schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
        m.run_available_now(src + "/*/", schema, ckpt)

    # a re-drain with nothing new is a no-op (checkpointed discovery)
    v = m.version
    m.run_available_now(src + "/*/", schema, ckpt)
    assert m.version == v

    oneshot = str(tmp_path / "oneshot")
    save_bm25_index(
        spark.createDataFrame(corpus, schema), oneshot, num_files=1
    )
    terms = ["data", "tokenize"]
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_scores_from_index(
            load_bm25_index(spark, oneshot), terms
        ).collect()
    )
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_scores_from_index(m.serve_index(), terms).collect()
    )
    assert got == want and len(got) == 4


def test_bm25_maintainer_counts_empty_docs_in_stats(spark, tmp_path):
    """A batch containing an empty-text doc still matches the one-shot
    build: the doc contributes no postings but DOES count toward
    n_docs/avgdl (stats derive from the batch dl frame, not the
    postings)."""
    from _data_engineering_pipeline_project_spark.operators.ranking import (
        bm25_scores_from_index,
        load_bm25_index,
        save_bm25_index,
    )
    from _data_engineering_pipeline_project_spark.streaming.bm25maint import (
        Bm25Maintainer,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta"),
            (2, ""),
            (3, "alpha gamma"),
            (4, "beta beta gamma delta"),
        ],
        "doc_id int, text string",
    )
    oneshot = str(tmp_path / "oneshot")
    save_bm25_index(docs, oneshot, num_files=1)
    expected = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_scores_from_index(
            load_bm25_index(spark, oneshot), ["alpha", "beta"]
        ).collect()
    )

    m = Bm25Maintainer(spark, str(tmp_path / "maint"), files_per_batch=1)
    m.merge_batch(docs.filter(F.col("doc_id") <= 2), batch_id=0)  # has empty
    m.merge_batch(docs.filter(F.col("doc_id") > 2), batch_id=1)
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_scores_from_index(
            m.serve_index(), ["alpha", "beta"]
        ).collect()
    )
    assert got == expected
    stats = m.serve_index()["stats"].collect()[0]
    assert stats["n_docs"] == 4  # the empty doc counts


# --- distributed layout audit (VERDICT r10 brief #4) -------------------------


def test_file_stat_spans_distributed_equals_driver_loop(spark, tmp_path):
    """The mapInPandas footer audit returns the same spans as the
    driver loop (both funnel through _footer_min_max), so graduating
    the audit from test harness to operational tool changes scale, not
    answers."""
    pytest.importorskip("pyarrow")
    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans,
        file_stat_spans_distributed,
        write_zordered_quantized,
    )

    src = spark.read.parquet(f"{SF}/customer.parquet")
    path = str(tmp_path / "z")
    write_zordered_quantized(src, path, ["c_acctbal", "c_nationkey"], num_files=8)
    for col in ("c_acctbal", "c_nationkey"):
        a = sorted(file_stat_spans(spark, path, col))
        b = sorted(file_stat_spans_distributed(spark, path, col))
        assert a == b and len(a) == 8
    with pytest.raises(ValueError, match="no parquet footer statistics"):
        file_stat_spans_distributed(spark, path, "no_such_column")


# --- listing-economy guard (VERDICT r10 brief #5) ----------------------------


def test_listing_economy_policy():
    """The pure threshold: a listing that over-returns by more than
    64x the wanted count is abandoned for per-file getFileStatus."""
    from _data_engineering_pipeline_project_spark.operators.dedup import (
        _listing_is_economical,
    )

    assert _listing_is_economical(8, 8)  # table dir: list it
    assert _listing_is_economical(8, 512)  # boundary: still list
    assert not _listing_is_economical(8, 513)  # shared landing dir
    assert not _listing_is_economical(8, 500_000)
    assert _listing_is_economical(0, 50)  # degenerate guard (max(1, .))


def test_listed_file_lengths_correct_in_overreturning_dir(spark, tmp_path):
    """8 wanted files inside a 600-entry shared dir: the guard routes
    to per-file getFileStatus and the lengths are still exact; a
    monkeypatched sentinel proves the listing path was NOT iterated."""
    from _data_engineering_pipeline_project_spark.operators import dedup as D

    d = tmp_path / "shared"
    d.mkdir()
    want = []
    for i in range(600):
        f = d / f"f{i:04d}.bin"
        f.write_bytes(b"x" * (i + 1))
        if i % 75 == 0:
            want.append(str(f))
    assert len(want) == 8
    calls = []
    orig = D._listing_is_economical

    def spy(n_wanted, n_listed):
        r = orig(n_wanted, n_listed)
        calls.append((n_wanted, n_listed, r))
        return r

    D._listing_is_economical = spy
    try:
        out = D._listed_file_lengths(spark, want)
    finally:
        D._listing_is_economical = orig
    assert calls == [(8, 600, False)]  # listing fetched once, rejected
    assert out == {p: int(p.rsplit("f", 1)[1][:4]) + 1 for p in want}


# --- compaction + z-order layout as ONE job (VERDICT r10 brief #6) -----------


def test_compaction_with_quantized_zorder_layout(spark, tmp_path):
    """The compactor's optional layout pass: folding small files with
    quantize='minmax' produces a generation whose per-file footer
    spans pass the same tightness assertion as a standalone
    write_zordered_quantized — compaction and clustering as one job —
    with row content preserved bit-exactly. Doubles cluster directly
    (the native zorder_value key cannot take them)."""
    pytest.importorskip("pyarrow")
    import numpy as np

    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans,
    )
    from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
        CompactionMaintainer,
    )
    from tests.test_compactmaint import _append_batch

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    m = CompactionMaintainer(
        landing,
        table,
        ["a", "b"],
        min_files=8,
        target_rows_per_file=1500,
        quantize="minmax",
        quantize_bits=8,
    )
    rng = np.random.default_rng(11)
    expect = []
    for batch in range(10):
        rows = [
            (float(x), float(y))
            for x, y in zip(
                rng.uniform(0, 10_000, 1200), rng.uniform(0, 500, 1200)
            )
        ]
        expect.extend(rows)
        _append_batch(spark, landing, rows, schema="a double, b double")

    out = m.run_once(spark)
    assert out["compacted"] and out["rows"] == 12_000
    gen = os.path.join(table, f"gen_v{out['version']}")
    n_files = out["output_files"]
    assert n_files == 8
    for col in ("a", "b"):
        spans = file_stat_spans(spark, gen, col)
        avg = sum(spans) / len(spans)
        # ~sqrt(1/8) per dim for a 2-D curve over 8 files (+ noise);
        # un-clustered landing files span ~the whole range
        assert avg < 0.62, (col, avg)
    got = sorted(tuple(r) for r in m.read_current(spark).collect())
    assert got == sorted(expect)

    # follow-up ticks keep clustering as data accretes (equi_depth too)
    m2 = CompactionMaintainer(
        landing,
        str(tmp_path / "table2"),
        ["a"],
        min_files=2,
        target_rows_per_file=1500,
        quantize="equi_depth",
        quantize_bits=8,
    )
    for batch in range(2):
        rows = [(float(np.exp(x)), 0.0) for x in rng.uniform(0, 9, 1200)]
        _append_batch(spark, landing, rows, schema="a double, b double")
    out2 = m2.run_once(spark)
    assert out2["compacted"] and out2["rows"] == 2400


def test_compaction_quantize_validation():
    from _data_engineering_pipeline_project_spark.streaming.compactmaint import (
        CompactionMaintainer,
    )

    with pytest.raises(ValueError, match="quantize mode"):
        CompactionMaintainer("/l", "/tmp/t-q1", ["a"], quantize="zcurve")
    with pytest.raises(ValueError, match="1..4"):
        CompactionMaintainer(
            "/l", "/tmp/t-q2", list("abcde"), quantize="minmax"
        )
    with pytest.raises(ValueError, match="1 or 2"):
        CompactionMaintainer("/l", "/tmp/t-q3", ["a", "b", "c"])


# --- Iceberg merge seam (VERDICT r10 brief #8, stretch) ----------------------


def test_scd2_merge_into_iceberg_without_runtime_raises_cleanly(spark):
    from _data_engineering_pipeline_project_spark.operators.scd2 import (
        _have_iceberg,
        scd2_merge_into_iceberg,
    )

    if _have_iceberg(spark):
        pytest.skip("iceberg runtime present; covered by the e2e test")
    from datetime import datetime

    inc = spark.createDataFrame([(1, "a")], "id int, v string")
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        scd2_merge_into_iceberg(
            spark, inc, "local.db.t", "local.db.h", ["id"], datetime(2024, 1, 1)
        )


def test_scd2_merge_into_iceberg_e2e(spark, tmp_path):
    """Ready-to-enable (mirrors the Delta e2e): with the Iceberg
    runtime + a catalog configured, the SQL MERGE path must match the
    parquet-versioned path batch for batch."""
    from datetime import datetime

    from _data_engineering_pipeline_project_spark.operators.scd2 import (
        Scd2Table,
        _have_iceberg,
        scd2_merge_into_iceberg,
    )

    if not _have_iceberg(spark):
        pytest.skip("iceberg-spark-runtime not on classpath")

    pk = ["id"]
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    b2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id int, v string")
    ts1, ts2 = datetime(2024, 1, 1), datetime(2024, 1, 2)

    ref = Scd2Table(spark, str(tmp_path / "parquet"), pk)
    ref.merge(b1, ts1)
    ref.merge(b2, ts2)

    tgt, hist = "local.db.scd2_t", "local.db.scd2_h"
    for b, ts in ((b1, ts1), (b2, ts2)):
        scd2_merge_into_iceberg(spark, b, tgt, hist, pk, ts)

    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(spark.table(tgt).select(*ref.current().columns)) == key(
        ref.current()
    )
    assert key(spark.table(hist).select(*ref.history().columns)) == key(
        ref.history()
    )


def test_quantized_max_stays_in_lane(spark):
    """ADVICE r9 #4: col = mx maps to maxq or maxq-1, never ABOVE the
    lane (the interleave would corrupt neighboring dimensions). Spans
    chosen so (mx-mn)·maxq is NOT exactly representable."""
    from _data_engineering_pipeline_project_spark.operators.layout import (
        quantized,
    )

    rows = [(0.1,), (0.3,), (1.0 / 3.0,), (0.7,)]
    df = spark.createDataFrame(rows, "v double")
    for bits in (8, 16):
        maxq = (1 << bits) - 1
        out = df.select(
            quantized(
                F.col("v"), F.lit(0.1), F.lit(1.0 / 3.0), bits
            ).alias("q")
        ).collect()
        qs = [r["q"] for r in out]
        assert all(q <= maxq for q in qs), (bits, qs)
        # the mx row lands at the top of the lane (exact or one below)
        mx_q = df.filter(F.col("v") == 1.0 / 3.0).select(
            quantized(F.col("v"), F.lit(0.1), F.lit(1.0 / 3.0), bits).alias("q")
        ).collect()[0]["q"]
        assert mx_q in (maxq, maxq - 1)
