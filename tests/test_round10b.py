"""Round-10 wave 2: sharded Bloom-filter membership
(operators/membership.py).

The oracle queries (queries_ext10.py) pin the bit arithmetic against
DuckDB; these tests pin the PROPERTIES the oracle can't state —
no false negatives under hostile keys, prefilter-join exactness,
merge = build-of-union, and the artifact lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators import membership as M

M_BITS = 1 << 12
K = 3

HOSTILE_KEYS = [
    "",
    " ",
    "a",
    "ünïcode-ké y",
    "emoji 🙂🚀 key",
    "line\nbreak\ttab",
    "0",
    "-1",
    "9" * 500,
    "the same words in a different order",
    "order different a in words same the",
    "null",
    "None",
]


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_no_false_negatives_on_hostile_keys(spark):
    """Every inserted key probes member — the Bloom contract, under
    empty/unicode/emoji/huge/lookalike keys."""
    df = _keys_df(spark, HOSTILE_KEYS)
    words = M.bloom_build(df, F.col("k"), M_BITS, K)
    probed = M.bloom_probe(words, df, F.col("k"), M_BITS, K)
    rows = probed.collect()
    assert len(rows) == len(HOSTILE_KEYS)
    assert all(r["bloom_member"] for r in rows)


def test_probe_is_duplicate_row_safe(spark):
    """Duplicate probe rows each keep their row and flag (the probe
    dedups KEYS internally, not rows)."""
    df = _keys_df(spark, ["dup", "dup", "dup", "other"])
    words = M.bloom_build(_keys_df(spark, ["dup"]), F.col("k"), M_BITS, K)
    out = M.bloom_probe(words, df, F.col("k"), M_BITS, K).collect()
    assert len(out) == 4
    assert sum(1 for r in out if r["k"] == "dup" and r["bloom_member"]) == 3


def test_merge_equals_build_of_union(spark):
    """bit_or is a monoid: merging per-batch blooms yields EXACTLY the
    words of building over the union — the incremental-maintenance
    property."""
    a = _keys_df(spark, [f"a{i}" for i in range(200)])
    b = _keys_df(spark, [f"b{i}" for i in range(200)])
    wa = M.bloom_build(a, F.col("k"), M_BITS, K)
    wb = M.bloom_build(b, F.col("k"), M_BITS, K)
    merged = {
        (r["word_idx"], r["word"]) for r in M.bloom_merge(wa, wb).collect()
    }
    union = {
        (r["word_idx"], r["word"])
        for r in M.bloom_build(
            a.unionByName(b), F.col("k"), M_BITS, K
        ).collect()
    }
    assert merged == union


def test_prefilter_semi_join_equals_plain_semi_join(spark):
    """bloom_prefilter_semi_join returns exactly the plain semi-join's
    rows: no false negatives means the prefilter can't drop a match,
    and the verify join removes every false positive. A deliberately
    TINY filter (high FP pressure) stresses the verify stage."""
    corpus = _keys_df(spark, [f"k{i}" for i in range(300)]).select(
        F.col("k").alias("ck")
    )
    probe = _keys_df(spark, [f"k{i}" for i in range(250, 600)])
    got = sorted(
        r["k"]
        for r in M.bloom_prefilter_semi_join(
            corpus, probe, F.col("k"), m_bits=64, k=2
        ).collect()
    )
    want = sorted(
        r["k"]
        for r in probe.join(
            corpus, probe["k"] == corpus["ck"], "left_semi"
        ).collect()
    )
    assert got == want and len(want) == 50


def test_artifact_round_trip_and_geometry_guard(spark, tmp_path):
    """save → load → probe equals the in-memory probe; a foreign
    artifact layout fails fast."""
    df = _keys_df(spark, [f"k{i}" for i in range(500)])
    path = str(tmp_path / "bloom")
    M.save_bloom_index(df, F.col("k"), path, m_bits=M_BITS, k=K)

    idx = M.load_bloom_index(spark, path)
    assert idx["m_bits"] == M_BITS and idx["k"] == K

    probe = _keys_df(spark, [f"k{i}" for i in range(400, 900)])
    served = {
        (r["k"], r["bloom_member"])
        for r in M.bloom_probe_index(idx, probe, F.col("k")).collect()
    }
    direct_words = M.bloom_build(df, F.col("k"), M_BITS, K)
    direct = {
        (r["k"], r["bloom_member"])
        for r in M.bloom_probe(
            direct_words, probe, F.col("k"), M_BITS, K
        ).collect()
    }
    assert served == direct
    assert all(m for k, m in served if int(k[1:]) < 500)  # no false negs

    # geometry guard: corrupt params → loud failure
    spark.createDataFrame(
        [(int(M_BITS), K, 64, "bloom-words-v999")],
        "m_bits long, k int, word_bits int, format string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    with pytest.raises(ValueError, match="incompatible bloom artifact"):
        M.load_bloom_index(spark, path)


def test_words_are_bounded_and_positive(spark):
    """The words relation never exceeds ceil(m/60) rows and every word
    is a positive long (60-bit masks — no signed-bit edge)."""
    df = _keys_df(spark, [f"k{i}" for i in range(2000)])
    words = M.bloom_build(df, F.col("k"), M_BITS, K).collect()
    n_words_max = -(-M_BITS // M.WORD_BITS)
    assert len(words) <= n_words_max
    assert all(0 < r["word"] < (1 << 60) for r in words)
    assert all(0 <= r["word_idx"] < n_words_max for r in words)


def test_param_validation():
    with pytest.raises(ValueError):
        M.bloom_positions(F.lit("x"), 1, 3)
    with pytest.raises(ValueError):
        M.bloom_positions(F.lit("x"), 64, 0)
    with pytest.raises(ValueError):
        M.bloom_positions(F.lit("x"), 64, 17)


# --------------------------------------------------------------------------
# Matryoshka recall audit + join-skew audit (round-10 wave 2)
# --------------------------------------------------------------------------
def test_matryoshka_baseline_anchors_and_one_scan(spark):
    """The full-dimension rows pin recall = 1.0 (self-anchoring), every
    recall is in [0, 1], and the segmented scorer runs ONE
    corpus×queries join — not one per cut (the plan has exactly one
    BroadcastNestedLoopJoin)."""
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators import (
        similarity as SIM,
    )
    from pyspark.sql import functions as F

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 4)
    out = SIM.matryoshka_recall_audit(emb, qs, (8, 16, 64), k=3).collect()
    assert len(out) == 3 * 4
    for r in out:
        assert 0.0 <= r["recall"] <= 1.0
        if r["prefix_dim"] == 64:
            assert r["recall"] == 1.0 and r["n_overlap"] == 3

    plan = SIM.matryoshka_scores(emb, qs, (8, 16, 64))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_join_skew_audit_recommends_leveling_salt(spark):
    """On a 90%-hot key the audit reports skew_factor ≈ P·share and a
    salt that splits the key back to ~average task size; a uniform key
    recommends 1 lane (no pointless salting)."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        join_skew_audit,
    )

    rows = [("hot",)] * 900 + [(f"u{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    audit = {r["k"]: r for r in join_skew_audit(df, ["k"], partitions=10).collect()}
    hot = audit["hot"]
    assert hot["n_rows"] == 900
    assert hot["share"] == 0.9
    assert hot["skew_factor"] == 9.0
    assert hot["recommended_salt"] == 9
    cold = [r for k, r in audit.items() if k != "hot"]
    assert cold and all(r["recommended_salt"] == 1 for r in cold)


# --------------------------------------------------------------------------
# BloomMaintainer: incremental filter maintenance
# --------------------------------------------------------------------------
def _bm(spark, tmp_path, name="bm", **kw):
    from _data_engineering_pipeline_project_spark.streaming.bloommaint import (
        BloomMaintainer,
    )

    return BloomMaintainer(spark, str(tmp_path / name), m_bits=M_BITS, k=K, **kw)


def test_bloom_maintainer_equals_one_shot_build(spark, tmp_path):
    """N incremental batches produce EXACTLY the words of a one-shot
    build over the union (the monoid property through the maintainer
    lifecycle), and every accepted key probes member."""
    m = _bm(spark, tmp_path)
    batches = [
        _keys_df(spark, [f"b{b}k{i}" for i in range(150)]) for b in range(4)
    ]
    for b, df in enumerate(batches):
        m.merge_batch(df, batch_id=b)
    assert m.version == 4

    all_keys = batches[0]
    for df in batches[1:]:
        all_keys = all_keys.unionByName(df)
    one_shot = {
        (r["word_idx"], r["word"])
        for r in M.bloom_build(all_keys, F.col("k"), M_BITS, K).collect()
    }
    maintained = {
        (r["word_idx"], r["word"]) for r in m.current().collect()
    }
    assert maintained == one_shot

    probed = m.probe(all_keys, "k").collect()
    assert all(r["bloom_member"] for r in probed)


def test_bloom_maintainer_redelivery_and_recovery(spark, tmp_path):
    """A redelivered batch id is a no-op; a fresh handle over the same
    base_dir resumes at the committed version; mismatched geometry on
    reopen fails loudly."""
    from _data_engineering_pipeline_project_spark.streaming.bloommaint import (
        BloomMaintainer,
    )

    m = _bm(spark, tmp_path)
    m.merge_batch(_keys_df(spark, ["a", "b"]), batch_id=0)
    m.merge_batch(_keys_df(spark, ["c"]), batch_id=1)
    v = m.version
    m.merge_batch(_keys_df(spark, ["SHOULD-NOT-MERGE"]), batch_id=1)
    assert m.version == v  # watermark no-op

    m2 = _bm(spark, tmp_path)
    assert m2.version == v and m2._last_batch_id == 1
    got = {r["k"]: r["bloom_member"] for r in m2.probe(_keys_df(spark, ["a", "b", "c"]), "k").collect()}
    assert got == {"a": True, "b": True, "c": True}

    with pytest.raises(ValueError, match="geometry mismatch"):
        BloomMaintainer(spark, str(tmp_path / "bm"), m_bits=M_BITS * 2, k=K)


def test_bloom_maintainer_vacuum_keeps_current(spark, tmp_path):
    m = _bm(spark, tmp_path)
    for b in range(4):
        m.merge_batch(_keys_df(spark, [f"v{b}"]), batch_id=b)
    removed = m.vacuum_versions(keep_last=2)
    assert sorted(removed) == ["words_v1", "words_v2"]
    assert m.current().count() > 0


# --------------------------------------------------------------------------
# PCA: exact covariance + driver spectral step (operators/pca.py)
# --------------------------------------------------------------------------
def _synth_lowrank(spark, n=400, d=16, rank=4, noise=0.05):
    """Deterministic low-rank-plus-noise embeddings: strong cross-dim
    correlation (what PCA exists for; iid synthetic data has none)."""
    import math

    rows = []
    for i in range(n):
        lat = [math.sin(0.7 * i * (k + 1)) for k in range(rank)]
        vec = []
        for j in range(d):
            v = sum(
                lat[k] * math.cos(0.3 * (k + 1) * (j + 1)) for k in range(rank)
            )
            v += noise * math.sin(12.9898 * i + 78.233 * j)  # det. "noise"
            vec.append(v)
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pca_spectral_invariants(spark):
    """Eigenvalue sum = trace of the covariance (both from the exact
    relation), eigenvalues descend, components are orthonormal."""
    import numpy as np

    from _data_engineering_pipeline_project_spark.operators import pca as P

    df = _synth_lowrank(spark)
    cov_rows = P.covariance_pairs(df).collect()
    trace = sum(r["cov"] for r in cov_rows if r["dim_i"] == r["dim_j"])
    model = P.pca_fit(df, dim=16)
    ev = model["eigenvalues"]
    assert abs(sum(ev) - trace) < 1e-9 * max(1.0, abs(trace))
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    C = np.array(model["components"])
    assert np.allclose(C @ C.T, np.eye(16), atol=1e-9)


def test_pca_rotation_preserves_geometry_and_concentrates_variance(spark):
    """Full-rank projection preserves pairwise dots (orthogonal
    rotation of centered vectors), and on correlated data the top-4
    PCA dims reconstruct far better than the first 4 RAW dims — the
    truncated-serving case (vs. matryoshka raw prefixes) and the
    decorrelation OPQ rests on."""
    import numpy as np

    from _data_engineering_pipeline_project_spark.operators import pca as P

    df = _synth_lowrank(spark)
    model = P.pca_fit(df, dim=16)

    X = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()]
    )
    mu = np.array(model["mean"])
    Xc = X - mu

    proj = P.pca_project(df, model, r=16).orderBy("vec_id").collect()
    Pfull = np.array([r["projected"] for r in proj])
    # orthogonal rotation: Gram matrices match
    assert np.allclose(Pfull @ Pfull.T, Xc @ Xc.T, atol=1e-6)

    C4 = np.array(model["components"][:4])
    recon_pca = (Xc @ C4.T) @ C4
    mse_pca = float(np.mean((Xc - recon_pca) ** 2))
    raw = np.zeros_like(Xc)
    raw[:, :4] = Xc[:, :4]
    mse_raw = float(np.mean((Xc - raw) ** 2))
    assert mse_pca < 0.25 * mse_raw, (mse_pca, mse_raw)

    # projected covariance is diagonal: rotated dims are decorrelated,
    # which is why per-subspace PQ codebooks spend bits on variance
    S = (Pfull.T @ Pfull) / len(Pfull)
    off = S - np.diag(np.diag(S))
    assert np.max(np.abs(off)) < 1e-6 * max(1.0, np.max(np.diag(S)))


# --------------------------------------------------------------------------
# Hilbert key: expression spec == UDF hot path (functions/hilbert.py)
# --------------------------------------------------------------------------
def test_hilbert_expression_matches_udf_including_hostile_inputs(spark):
    """The staged-expression specification and the numpy-UDF hot path
    are bit-identical — including negative values (floored modulo) and
    NULLs (→ 0, the UDF's fillna discipline)."""
    from _data_engineering_pipeline_project_spark.functions.hilbert import (
        with_hilbert_key,
    )
    from _data_engineering_pipeline_project_spark.operators.sampling import (
        hilbert_value,
    )

    rows = [(0, 0), (-1, 5), (65535, 65535), (65536, 1), (None, 3),
            (7, None), (None, None), (123456789, -987654321)]
    df = spark.createDataFrame(rows, "a long, b long")
    expr = with_hilbert_key(df, "a", "b", 16, "hk")
    udf = df.withColumn("hk2", hilbert_value("a", "b", 16))
    j = (
        expr.join(udf, ["a", "b"])
        .filter(
            (F.col("hk") != F.col("hk2"))
            | F.col("hk").isNull()
            | F.col("hk2").isNull()
        )
        .count()
    )
    assert j == 0

    rnd = spark.range(3000).select(
        (F.col("id") * 2654435761 % 70000 - 2000).alias("a"),
        (F.col("id") * 40503 % 65536).alias("b"),
    )
    mism = (
        with_hilbert_key(rnd, "a", "b", 16, "hk")
        .join(rnd.withColumn("hk2", hilbert_value("a", "b", 16)), ["a", "b"])
        .filter(F.col("hk") != F.col("hk2"))
        .count()
    )
    assert mism == 0


def test_hilbert_locality_beats_morton_worst_case(spark):
    """The reason Hilbert exists: along consecutive curve positions,
    steps are ALWAYS unit grid moves (max |dx|+|dy| == 1), where the
    Morton curve jumps at quadrant seams."""
    from _data_engineering_pipeline_project_spark.functions.hilbert import (
        with_hilbert_key,
    )

    order = 4
    n = 1 << order
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "a long, b long"
    )
    keyed = with_hilbert_key(grid, "a", "b", order, "hk").collect()
    by_d = sorted(keyed, key=lambda r: r["hk"])
    assert [r["hk"] for r in by_d] == list(range(n * n))  # bijection
    steps = [
        abs(p["a"] - q["a"]) + abs(p["b"] - q["b"])
        for p, q in zip(by_d, by_d[1:])
    ]
    assert max(steps) == 1


def test_opq_balanced_rotation_beats_plain_and_naive_pq(spark):
    """The OPQ composition, measured: on correlated data, PQ after the
    eigenvalue-BALANCED rotation quantizes markedly better than PQ on
    raw vectors, while naive PCA-then-PQ (unbalanced) is WORSE than
    doing nothing — the anti-pattern opq_allocate exists to prevent.
    Rotation is orthogonal, so MSE in the rotated space is directly
    comparable to MSE in the original space."""
    import numpy as np

    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    d, m, sub = 64, 4, 16
    df = _synth_lowrank(spark, n=400, d=d, rank=6)

    def pq_mse(frame):
        cb = pq_codebooks(frame, m=m, sub_dim=sub, ksub=8)
        codes = pq_encode(frame, cb, m=m, sub_dim=sub)
        recs = codes.join(cb, ["subspace", "code"]).collect()
        recon = {}
        for r in recs:
            recon.setdefault(r["vec_id"], {})[r["subspace"]] = list(r["cvec"])
        X = {r["vec_id"]: r["embedding"] for r in frame.collect()}
        errs = [
            float(
                np.mean(
                    (
                        np.array(X[vid])
                        - np.array([x for s in sorted(subs) for x in subs[s]])
                    )
                    ** 2
                )
            )
            for vid, subs in recon.items()
        ]
        return float(np.mean(errs))

    mse_plain = pq_mse(df)
    model = P.pca_fit(df, dim=d)
    mse_naive = pq_mse(
        P.pca_project(df, model, r=d, out_col="embedding")
    )
    bal = P.opq_allocate(model, m=m, sub_dim=sub)
    mse_opq = pq_mse(P.pca_project(df, bal, r=d, out_col="embedding"))

    assert mse_opq < 0.7 * mse_plain, (mse_opq, mse_plain)
    assert mse_naive > mse_plain, (mse_naive, mse_plain)  # the anti-pattern

    with pytest.raises(ValueError, match="exceeds dim"):
        P.opq_allocate(model, m=5, sub_dim=16)


# --------------------------------------------------------------------------
# Constraint discovery (expectations.suggest_expectations)
# --------------------------------------------------------------------------
def test_suggest_expectations_promote_roundtrip_and_one_scan(spark):
    """The discovery→enforcement loop closes: every suggestion, promoted
    into run_expectations, passes on the data that generated it; a
    nullable column is NOT suggested not_null; a high-cardinality
    string gets no in_set; the plan scans the input exactly once."""
    from _data_engineering_pipeline_project_spark.operators import (
        expectations as E,
    )

    rows = [
        (i, float(i % 7) + 0.5, "ok" if i % 3 else None, f"u{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, val double, st string, uid string")
    sugg = E.suggest_expectations(
        df,
        numeric_cols=["id", "val"],
        string_cols=["st", "uid"],
        enum_threshold=10,
    )
    got = {(r["column"], r["suggestion"]): r for r in sugg.collect()}

    assert ("id", "unique") in got and ("id", "not_null") in got
    assert got[("id", "in_range")]["lo"] == 0.0
    assert got[("id", "in_range")]["hi"] == 59.0
    assert ("st", "not_null") not in got  # nullable column
    assert ("st", "in_set") in got and list(got[("st", "in_set")]["allowed"]) == ["ok"]
    assert ("uid", "in_set") not in got  # 60 distinct > threshold
    assert ("uid", "unique") in got

    # promote: every suggestion holds on the generating data
    specs = []
    for (c, s), r in got.items():
        if s == "not_null":
            specs.append(E.not_null(f"{c}_nn", c))
        elif s == "unique":
            specs.append(E.unique(f"{c}_uq", c))
        elif s == "in_range":
            specs.append(E.in_range(f"{c}_rng", c, r["lo"], r["hi"]))
        elif s == "in_set":
            specs.append(E.in_set(f"{c}_set", c, list(r["allowed"])))
    report = E.run_expectations(df, specs).collect()
    assert all(r["passed"] for r in report)

    # bounded-buffer redesign (code-review r10): the profile scan never
    # collects values, and the enum scan exists only for columns the
    # profile proved are at/under threshold — so no agg buffer can
    # exceed enum_threshold values. The output relation is assembled
    # from the two bounded profile rows.


def test_bloom_maintainer_streaming_available_now(spark, tmp_path):
    """Stream-driven e2e (the sibling-maintainer pattern): key files
    land in a directory, run_available_now drains them through a real
    readStream + foreachBatch with checkpointed discovery — each file
    folds exactly once across restarts — and the maintained words
    EXACTLY equal a one-shot build over everything landed."""
    import os

    from pyspark.sql import types as T

    from _data_engineering_pipeline_project_spark.streaming.bloommaint import (
        BloomMaintainer,
    )

    schema = T.StructType([T.StructField("k", T.StringType())])
    src = str(tmp_path / "keys_landing")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    m = BloomMaintainer(spark, str(tmp_path / "idx"), m_bits=M_BITS, k=K)

    batches = [[f"s{b}k{i}" for i in range(50)] for b in range(3)]
    for b, keys in enumerate(batches):
        spark.createDataFrame([(x,) for x in keys], schema).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{b}"))
        m.run_available_now(src + "/*/", schema, ckpt)

    v = m.version
    m.run_available_now(src + "/*/", schema, ckpt)  # nothing new: no-op
    assert m.version == v

    all_keys = [x for keys in batches for x in keys]
    one_shot = {
        (r["word_idx"], r["word"])
        for r in M.bloom_build(
            _keys_df(spark, all_keys), F.col("k"), M_BITS, K
        ).collect()
    }
    maintained = {
        (r["word_idx"], r["word"]) for r in m.current().collect()
    }
    assert maintained == one_shot
    assert all(
        r["bloom_member"]
        for r in m.probe(_keys_df(spark, all_keys), "k").collect()
    )


def test_write_hilbert_quantized_narrows_spans_and_preserves_rows(spark, tmp_path):
    """The hilbert × quantized cell of the layout matrix: after a
    hilbert-clustered write on (c_acctbal, c_nationkey), per-file
    footer spans in EACH dimension are a fraction of the full range
    (round-robin spans ~everything), and row content is unchanged."""
    pytest.importorskip("pyarrow")
    from _data_engineering_pipeline_project_spark.operators.layout import (
        file_stat_spans,
        write_hilbert_quantized,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    hpath, rpath = str(tmp_path / "hilb"), str(tmp_path / "rrobin")
    write_hilbert_quantized(
        src, hpath, ["c_acctbal", "c_nationkey"], num_files=8
    )
    src.repartition(8).write.parquet(rpath)

    for col in ("c_acctbal", "c_nationkey"):
        h = file_stat_spans(spark, hpath, col)
        r = file_stat_spans(spark, rpath, col)
        assert len(h) == 8 and len(r) == 8
        havg, ravg = sum(h) / len(h), sum(r) / len(r)
        assert ravg > 0.75, (col, ravg)
        assert havg < 0.62, (col, havg)
        assert havg < ravg / 1.5, (col, havg, ravg)

    back = sorted(
        tuple(r) for r in spark.read.parquet(hpath).collect()
    )
    want = sorted(tuple(r) for r in src.collect())
    assert back == want

    with pytest.raises(ValueError, match="exactly two"):
        write_hilbert_quantized(src, hpath, ["c_acctbal"], num_files=2)


def test_covariance_gram_form_is_bit_identical(spark):
    """The gram-batches physical form (numpy int64 XᵀX per Arrow
    batch, decimal partial sums) produces BIT-IDENTICAL covariance
    doubles to the relational explode form — integer sums are
    order-free, so the physical plan is pure performance (8.5× at
    d=256, SCALE.md r10)."""
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators import pca as P

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in P.covariance_pairs(emb).collect()
    }
    b = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in P.covariance_pairs(emb, method="gram", dim=64).collect()
    }
    assert a == b and len(a) == 64 * 65 // 2

    with pytest.raises(ValueError, match="requires dim"):
        P.covariance_pairs(emb, method="gram")


def test_pca_model_artifact_round_trip(spark, tmp_path):
    """save→load reproduces the model bit-for-bit (parquet stores IEEE
    doubles): projections from the loaded model equal the in-memory
    model's exactly, OPQ permutation included; a foreign dir fails
    loudly."""
    from _data_engineering_pipeline_project_spark.operators import pca as P

    df = _synth_lowrank(spark, n=100, d=16, rank=3)
    model = P.opq_allocate(P.pca_fit(df, dim=16), m=2, sub_dim=8)
    path = str(tmp_path / "pca_model")
    P.save_pca_model(spark, model, path)
    loaded = P.load_pca_model(spark, path)

    assert loaded["eigenvalues"] == model["eigenvalues"]
    assert loaded["components"] == model["components"]
    assert loaded["mean"] == model["mean"]
    assert loaded["opq_permutation"] == model["opq_permutation"]

    a = {(r["vec_id"], tuple(r["projected"])) for r in P.pca_project(df, model, r=8).collect()}
    b = {(r["vec_id"], tuple(r["projected"])) for r in P.pca_project(df, loaded, r=8).collect()}
    assert a == b

    spark.createDataFrame(
        [("junk", 0, [1.0])], "kind string, idx int, vals array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="not a PCA model artifact"):
        P.load_pca_model(spark, str(tmp_path / "bad"))


def test_review_fixes_round10_wave2(spark, tmp_path):
    """Code-review regression pins: (a) gram dim mismatch fails loudly
    instead of returning silently-wrong covariance; (b) gram rejects
    NULL elements with a clear error; (c) bloom_build drops NULL keys
    (no junk (NULL, NULL) words row); (d) all-NULL numeric columns get
    NO in_range suggestion; (e) enum values containing commas
    round-trip exactly through the array-typed allowed list;
    (f) pca_fit(method='gram') equals pca_fit(method='explode')."""
    import pytest as _pytest
    from pyspark.errors import PySparkException

    from _data_engineering_pipeline_project_spark.operators import (
        expectations as E,
    )
    from _data_engineering_pipeline_project_spark.operators import pca as P

    emb = spark.createDataFrame(
        [(i, [float(i), float(i * 2), 1.0, 0.5]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    # (a) declared dim != width -> loud executor error, never garbage
    with _pytest.raises(PySparkException, match="does not match declared"):
        P.covariance_pairs(emb, method="gram", dim=3).collect()
    # (b) NULL element -> loud error with the tolerant-alternative hint
    nullelem = spark.createDataFrame(
        [(0, [1.0, None, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(PySparkException, match="non-null fixed-width"):
        P.covariance_pairs(nullelem, method="gram", dim=4).collect()

    # (c) NULL build key produces no junk words row
    keys = spark.createDataFrame([("a",), (None,)], "k string")
    words = M.bloom_build(keys, F.col("k"), 1 << 10, 3).collect()
    assert all(
        r["word_idx"] is not None and r["word"] is not None for r in words
    )

    # (d) all-NULL numeric column: not suggested not_null OR in_range
    nulls = spark.createDataFrame(
        [(i, None) for i in range(5)], "id long, dead double"
    )
    got = {
        (r["column"], r["suggestion"])
        for r in E.suggest_expectations(nulls, numeric_cols=["dead"]).collect()
    }
    assert ("dead", "in_range") not in got
    assert ("dead", "not_null") not in got

    # (e) comma-containing enum values survive promotion
    enum = spark.createDataFrame(
        [("a,b",), ("c",), ("a,b",)], "st string"
    )
    sugg = {
        r["suggestion"]: r
        for r in E.suggest_expectations(enum, string_cols=["st"]).collect()
    }
    allowed = list(sugg["in_set"]["allowed"])
    assert allowed == ["a,b", "c"]
    report = E.run_expectations(
        enum, [E.in_set("st_set", "st", allowed)]
    ).collect()
    assert all(r["passed"] for r in report)

    # (f) gram and explode fits agree exactly
    df = _synth_lowrank(spark, n=80, d=16, rank=3)
    a = P.pca_fit(df, dim=16)
    b = P.pca_fit(df, dim=16, method="gram")
    assert a["mean"] == b["mean"]
    assert a["eigenvalues"] == b["eigenvalues"]


def test_opq_improves_adc_retrieval_recall(spark):
    """The OPQ claim at the RETRIEVAL level, not just quantization MSE:
    on correlated data, PQ-ADC top-10 recall against exact L2 ground
    truth improves materially after the eigenvalue-balanced rotation
    (measured 0.37 → 0.64 at this geometry; asserted with margin).
    Rotation preserves L2 on centered vectors, so exact neighbor sets
    are identical in both spaces and the comparison is apples-to-
    apples."""
    import numpy as np

    from _data_engineering_pipeline_project_spark.operators import pca as P
    from _data_engineering_pipeline_project_spark.operators.similarity import (
        pq_adc_topk,
    )

    d, m, sub, K = 64, 4, 16, 10
    df = _synth_lowrank(spark, n=500, d=d, rank=6)
    X = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()])
    qids = list(range(10))

    def exact_topk(Xs):
        out = {}
        for q in qids:
            d2 = ((Xs - Xs[q]) ** 2).sum(axis=1)
            d2[q] = np.inf
            out[q] = set(np.argsort(d2, kind="stable")[:K].tolist())
        return out

    def recall(frame, Xs):
        got = {}
        qs = frame.filter(F.col("vec_id") < 10)
        for r in pq_adc_topk(frame, qs, k=K, m=m, sub_dim=sub, ksub=8).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ex = exact_topk(Xs)
        return sum(len(got.get(q, set()) & ex[q]) for q in qids) / (
            K * len(qids)
        )

    r_plain = recall(df, X)
    model = P.pca_fit(df, dim=d)
    bal = P.opq_allocate(model, m=m, sub_dim=sub)
    rot = P.pca_project(df, bal, r=d, out_col="embedding")
    Xc = X - np.array(model["mean"])
    Xrot = Xc @ np.array(bal["components"]).T
    r_opq = recall(rot, Xrot)
    assert r_opq > r_plain + 0.1, (r_plain, r_opq)


def test_rotating_bloom_ages_out_old_windows(spark, tmp_path):
    """The retention ring: keys inserted G rotations ago age out when
    their slot is reused, recent windows keep the no-false-negative
    guarantee over the OR of live slots, and a fresh handle recovers
    the ring position. Probe equals a bloom over the union of LIVE
    generations' keys exactly."""
    from _data_engineering_pipeline_project_spark.streaming.bloommaint import (
        RotatingBloomMaintainer,
    )

    base = str(tmp_path / "ring")
    r = RotatingBloomMaintainer(
        spark, base, m_bits=M_BITS, k=K, generations=3
    )
    windows = []
    for w in range(5):  # slots: w0->0, w1->1, w2->2, w3->0(reuse), w4->1
        keys = [f"w{w}k{i}" for i in range(30)]
        windows.append(keys)
        if w > 0:
            r.rotate()
        r.merge_batch(_keys_df(spark, keys), batch_id=0)

    live = windows[2] + windows[3] + windows[4]
    aged = windows[0] + windows[1]
    flags = {
        row["k"]: row["bloom_member"]
        for row in r.probe(_keys_df(spark, live + aged), "k").collect()
    }
    assert all(flags[k] for k in live)  # no false negatives in-window
    # aged-out windows lost their slots; at this fill (~90 keys in
    # 2^12 bits) false positives are overwhelmingly unlikely, so the
    # aged keys must read non-member
    assert sum(1 for k in aged if flags[k]) <= 2

    # probe == bloom over the union of live generations
    want_words = {
        (row["word_idx"], row["word"])
        for row in M.bloom_build(
            _keys_df(spark, live), F.col("k"), M_BITS, K
        ).collect()
    }
    got_words = {
        (row["word_idx"], row["word"]) for row in r.live_words().collect()
    }
    assert got_words == want_words

    # recovery: a fresh handle lands on the same slot and rotation count
    r2 = RotatingBloomMaintainer(
        spark, base, m_bits=M_BITS, k=K, generations=3
    )
    assert r2.current_slot == r.current_slot
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ring geometry mismatch"):
        RotatingBloomMaintainer(spark, base, m_bits=M_BITS, k=K, generations=4)
