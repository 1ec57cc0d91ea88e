"""Scale-toolkit tests: salted join/aggregate equivalence, bucketed-join
shuffle elimination, range-join correctness vs a naive inequality join."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from _data_engineering_pipeline_project_spark.operators.rangejoin import (
    range_join_within,
)
from _data_engineering_pipeline_project_spark.operators.skew import (
    bucketed_table,
    salted_aggregate,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # one dominant key (90% of rows) — the salting target
    left = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 100 + k) for k in range(2, 12)],
        "k int, payload int",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 12)], "k int, attr string"
    )
    plain = sorted(
        (r["k"], r["payload"], r["attr"])
        for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["attr"])
        for r in salted_join(left, right, ["k"], buckets=4).collect()
    )
    assert salted == plain


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [(1, float(i)) for i in range(50)] + [(2, 5.0), (3, 7.0)],
        "k int, v double",
    )
    plain = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    skewsafe = {
        r["k"]: (r["total"], r["n"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": F.sum("v"), "c": F.count(F.lit(1))},
            {"total": F.sum("s"), "n": F.sum("c")},
        ).collect()
    }
    assert skewsafe == plain


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") * 3)
    write_bucketed(a, "bk_a", ["id"], num_buckets=4)
    write_bucketed(b, "bk_b", ["id"], num_buckets=4)
    joined = bucketed_table(spark, "bk_a").join(bucketed_table(spark, "bk_b"), "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: no shuffle exchange under the sort-merge join
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 1000


def test_range_join_pre_epoch_timestamps(spark):
    # negative epoch seconds: cast-truncation would mis-bucket these
    t0 = datetime(1965, 6, 1)
    rows = [(i, 1, t0 + timedelta(seconds=100 * i)) for i in range(30)]
    ev = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp")
    naive = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") != F.col("b.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 250 SECONDS")),
        )
        .count()
    )
    fast = (
        range_join_within(ev, ev, ["user_id"], "ts", "ts", 250)
        .filter(F.col("l_event_id") != F.col("r_event_id"))
        .count()
    )
    assert fast == naive


def test_range_join_matches_naive(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(i, 1, t0 + timedelta(seconds=37 * i)) for i in range(40)] + [
        (100 + i, 2, t0 + timedelta(seconds=911 * i)) for i in range(10)
    ]
    ev = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp")
    naive = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") != F.col("b.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 120 SECONDS")),
        )
        .select(F.col("a.event_id").alias("x"), F.col("b.event_id").alias("y"))
    )
    fast = range_join_within(
        ev, ev, ["user_id"], "ts", "ts", 120
    ).filter(F.col("l_event_id") != F.col("r_event_id")).select(
        F.col("l_event_id").alias("x"), F.col("r_event_id").alias("y")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_write_clustered_narrows_rowgroup_stats(spark, tmp_path):
    """Clustered writes must produce files whose min/max key ranges are
    narrow slices (skippable), not all spanning the global range."""
    import os

    import pyarrow.parquet as pq

    from _data_engineering_pipeline_project_spark.operators.sampling import (
        write_clustered,
    )

    df = spark.range(0, 10000).selectExpr(
        "id", "cast(id % 997 as long) as k", "id * 2.0 as v"
    )
    dest = str(tmp_path / "clustered")
    write_clustered(df, dest, ["id"], n_files=8)

    files = sorted(
        os.path.join(dest, f) for f in os.listdir(dest) if f.endswith(".parquet")
    )
    assert len(files) == 8
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        stats = md.row_group(0).column(0).statistics
        spans.append((stats.min, stats.max))
    spans.sort()
    # ranges are disjoint slices of [0, 10000): each file covers ~1/8th,
    # and consecutive files don't overlap
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
        assert hi1 - lo1 < 10000 / 4  # narrow, not global
    # functional equivalence: clustered read == original under a filter
    back = spark.read.parquet(dest).filter("id between 100 and 200")
    assert back.count() == 101


def test_zorder_write_localizes_both_dimensions(spark, tmp_path):
    """Z-ordered files must cover narrow ranges in BOTH columns; a 1-D
    sort by x leaves y spanning the global range in every file."""
    import os

    import pyarrow.parquet as pq

    from _data_engineering_pipeline_project_spark.operators.sampling import (
        write_zordered,
        zorder_value,
    )

    # morton key unit checks (numpy path == python reference)
    df1 = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long")
    got = [r[0] for r in df1.select(zorder_value("x", "y")).collect()]

    def ref(x, y):
        z = 0
        for i in range(31):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(0, 0), ref(1, 0), ref(0, 1), ref(3, 5)]

    # 64x64 grid, z-ordered into 16 files -> each file's (x, y) ranges
    # must both be narrow (a 1-D sort would leave one dimension global)
    grid = spark.range(64 * 64).selectExpr(
        "id % 64 as x", "cast(id / 64 as long) as y", "id as payload"
    )
    dest = str(tmp_path / "z")
    write_zordered(grid, dest, "x", "y", n_files=16)
    files = [
        os.path.join(dest, f) for f in os.listdir(dest) if f.endswith(".parquet")
    ]
    assert len(files) == 16
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: md.row_group(0)
            .column(i)
            .statistics
            for i in range(md.row_group(0).num_columns)
        }
        x_span = cols["x"].max - cols["x"].min
        y_span = cols["y"].max - cols["y"].min
        # each of 16 files holds 1/16 of a 64x64 grid = a 16x16 z-block
        # (or two adjacent ones) — far below the 63 a 1-D sort gives
        assert x_span <= 32 and y_span <= 32, (f, x_span, y_span)


def test_hilbert_write_locality(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from _data_engineering_pipeline_project_spark.operators.sampling import (
        hilbert_value,
        write_hilbert,
    )

    # unit: vectorized transform matches the scalar reference (Wikipedia
    # xy2d) on a small grid
    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select("x", "y", hilbert_value("x", "y", order=3).alias("h")).collect()
    }
    assert got == {(x, y): xy2d(8, x, y) for x, y in pts}
    # Hilbert property: consecutive distances are grid neighbors
    by_d = sorted(pts, key=lambda p: got[p])
    assert all(
        abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1 for a, b in zip(by_d, by_d[1:])
    )

    # layout: 64x64 grid into 16 Hilbert-clustered files -> narrow spans
    # in BOTH dimensions (same bound as the Morton test)
    grid = spark.range(64 * 64).selectExpr(
        "id % 64 as x", "cast(id / 64 as long) as y", "id as payload"
    )
    dest = str(tmp_path / "h")
    write_hilbert(grid, dest, "x", "y", n_files=16, order=6)
    for f in os.listdir(dest):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(dest, f)).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: md.row_group(0)
            .column(i)
            .statistics
            for i in range(md.row_group(0).num_columns)
        }
        assert cols["x"].max - cols["x"].min <= 32
        assert cols["y"].max - cols["y"].min <= 32


def test_cap_group_width_bounds_pair_explosion(spark):
    """The basket cap removes hyper-active keys entirely: pair volume
    from the capped relation is bounded by max_width² per key."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        cap_group_width,
    )
    from pyspark.sql import functions as F

    rows = [("bot", f"i{i}") for i in range(50)] + [
        ("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "c")
    ]
    df = spark.createDataFrame(rows, "cust string, part string")
    capped = cap_group_width(df, "cust", max_width=10)
    keys = {r["cust"] for r in capped.select("cust").distinct().collect()}
    assert keys == {"u1", "u2"}
    pairs = capped.alias("a").join(
        capped.alias("b"),
        (F.col("a.cust") == F.col("b.cust"))
        & (F.col("a.part") < F.col("b.part")),
    )
    assert pairs.count() == 2  # (a,b) for u1, (a,c) for u2 — no bot pairs


def test_salted_aggregate_spreads_hot_key(spark):
    """VERDICT r7 #1: the pre-r8 salt hashed the GROUP KEY alone —
    constant per group, zero spread. The per-row salt must fan a hot
    key's BYTE-IDENTICAL rows across ≥ buckets/2 distinct partial
    lanes (same bar as salted_join's duplicate-spread test)."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        _row_spread_salt,
    )

    buckets = 8
    hot = spark.createDataFrame([(1, 0.5)] * 64, "k int, v double")
    salt = _row_spread_salt(hot, buckets * 64, None)
    n_lanes = hot.select(salt.alias("s")).distinct().count()
    assert n_lanes >= buckets // 2, n_lanes


def test_salted_aggregate_unique_cols_matches_plain(spark):
    """Content-deterministic salt path (retry-safe): same values as the
    plain aggregate, and the salt is a pure function of the named
    unique column — two independent evaluations agree row-for-row."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        _row_spread_salt,
    )

    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(50)] + [(2, 100, 5.0), (3, 101, 7.0)],
        "k int, rid int, v double",
    )
    plain = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    skewsafe = {
        r["k"]: (r["total"], r["n"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": F.sum("v"), "c": F.count(F.lit(1))},
            {"total": F.sum("s"), "n": F.sum("c")},
            unique_cols=["rid"],
        ).collect()
    }
    assert skewsafe == plain
    # determinism: re-evaluating the salt over a re-shuffled copy of the
    # frame yields the identical rid→salt mapping (content, not position)
    salted = df.select(
        "rid", _row_spread_salt(df, 512, ["rid"]).alias("s")
    )
    re_df = df.repartition(7, "v")
    re_salted = re_df.select(
        "rid", _row_spread_salt(re_df, 512, ["rid"]).alias("s")
    )
    a = {r["rid"]: r["s"] for r in salted.collect()}
    b = {r["rid"]: r["s"] for r in re_salted.collect()}
    assert a == b
    # and it spreads the hot key k=1 across many lanes (rid is unique)
    hot_lanes = len({a[i] for i in range(50)})
    assert hot_lanes >= 4, hot_lanes


def test_salted_aggregate_holistic_collect_set(spark):
    """The documented use case the built-in map-side partial agg does
    NOT cover: bounded-width collect_set partials per (key, salt),
    flattened + deduped in the final phase."""
    rows = [(1, i % 10) for i in range(200)] + [(2, 99)]
    df = spark.createDataFrame(rows, "k int, v int")
    out = {
        r["k"]: sorted(r["vals"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": F.collect_set("v")},
            {"vals": F.array_distinct(F.flatten(F.collect_list("s")))},
        ).collect()
    }
    assert out == {1: list(range(10)), 2: [99]}


def test_track_query_caches_bounds_live_generations(spark):
    """ADVICE r7 #4: per-call caches must not accumulate across a
    sweep. Registering a new (query, sf) releases every other query's
    cached frames; re-registering the same key keeps the (plan-shared)
    entry; a DIFFERENT query whose frame shares a plan with the new
    registration is NOT evicted."""
    from _data_engineering_pipeline_project_spark.queries_ext import (
        track_query_caches,
    )

    def cached(df):
        return df.storageLevel.useMemory or df.storageLevel.useDisk

    d1 = spark.range(10).withColumn("a", F.col("id") * 2).cache()
    d1.count()
    track_query_caches(spark, "qA", "sfX", [d1])
    assert cached(d1)

    # same key re-registered: entry survives (same plan → same entry)
    track_query_caches(spark, "qA", "sfX", [d1])
    assert cached(d1)

    # a different query takes over: qA's generation is released
    d2 = spark.range(10).withColumn("b", F.col("id") + 1).cache()
    d2.count()
    track_query_caches(spark, "qB", "sfX", [d2])
    assert not cached(spark.range(10).withColumn("a", F.col("id") * 2))
    assert cached(d2)

    # qC caches the SAME plan as qB's frame (the fellegi/blocking-audit
    # shared-feed shape): releasing qB must not evict the shared entry
    d3 = spark.range(10).withColumn("b", F.col("id") + 1).cache()
    d3.count()
    track_query_caches(spark, "qC", "sfX", [d3])
    assert cached(d3)

    # cleanup
    track_query_caches(spark, "qDone", "sfX", [])


def test_operator_internal_caches_join_query_generation(spark):
    """Operator-INTERNAL cached frames (the SimHash signature frame —
    created inside ``simhash_near_dup_pairs``, invisible to the query
    function) must be attributed to the invoking registered query's
    generation and released when the next query registers, exactly like
    query-level per-call caches (functions/cachetrack.py)."""
    sf_dir = "/root/testdata/sf0.001"
    from _data_engineering_pipeline_project_spark import queries as q
    from _data_engineering_pipeline_project_spark.queries_ext import (
        _QUERY_LOCAL_CACHES,
        track_query_caches,
    )

    app = spark.sparkContext.applicationId
    key = (app, "simhash_near_dup_documents", sf_dir)
    _QUERY_LOCAL_CACHES.pop(key, None)
    q.QUERIES["simhash_near_dup_documents"](spark, sf_dir).count()
    frames = _QUERY_LOCAL_CACHES.get(key)
    assert frames, "internal signature cache was not attributed"
    assert any(
        f.storageLevel.useMemory or f.storageLevel.useDisk for f in frames
    )

    # next query's generation releases the signature frame
    track_query_caches(spark, "qNext", sf_dir, [])
    assert key not in _QUERY_LOCAL_CACHES
    lvl = frames[0].storageLevel
    assert not (lvl.useMemory or lvl.useDisk)

    # library use outside a registered query stays untracked
    from _data_engineering_pipeline_project_spark.catalog import table
    from _data_engineering_pipeline_project_spark.operators import dedup as D

    D.simhash_near_dup_pairs(table(spark, sf_dir, "documents"), max_hamming=8)
    assert not any(k[1] == "simhash_near_dup_pairs" for k in _QUERY_LOCAL_CACHES)
    track_query_caches(spark, "qDone2", sf_dir, [])


def test_nested_registered_queries_share_outer_generation(spark):
    """Nesting rule (functions/cachetrack.py): when a registered query
    invokes another registered query, the INNER invocation inherits the
    outer collection context — every operator-internal cache lands in
    the OUTER query's generation, and nothing is released mid-build."""
    from _data_engineering_pipeline_project_spark import queries as q
    from _data_engineering_pipeline_project_spark.functions.cachetrack import (
        note_query_cache,
    )
    from _data_engineering_pipeline_project_spark.queries_ext import (
        _QUERY_LOCAL_CACHES,
        track_query_caches,
    )

    app = spark.sparkContext.applicationId

    @q.query("__test_inner")
    def inner(sp, sf):
        d = sp.range(5).withColumn("i", F.col("id") + 1).cache()
        note_query_cache(d)
        return d

    @q.query("__test_outer")
    def outer(sp, sf):
        d = q.QUERIES["__test_inner"](sp, sf)
        e = sp.range(5).withColumn("o", F.col("id") * 2).cache()
        note_query_cache(e)
        return d.join(e, "id")

    try:
        q.QUERIES["__test_outer"](spark, "sfN").count()
        okey = (app, "__test_outer", "sfN")
        ikey = (app, "__test_inner", "sfN")
        assert ikey not in _QUERY_LOCAL_CACHES, "inner opened its own generation"
        assert len(_QUERY_LOCAL_CACHES.get(okey, [])) == 2, (
            "outer generation must hold BOTH caches (inner's included)"
        )
        track_query_caches(spark, "qDone3", "sfN", [])
        assert okey not in _QUERY_LOCAL_CACHES
    finally:
        q.QUERIES.pop("__test_inner", None)
        q.QUERIES.pop("__test_outer", None)


def test_broadcast_row_gate_derivation(spark):
    """VERDICT r7 #5: the triangle / union-find / semdecon gates derive
    from autoBroadcastJoinThreshold — raising the conf moves them all;
    disabling broadcast (-1) routes every gated site to its shuffle
    path (gate 0)."""
    from _data_engineering_pipeline_project_spark.functions.gates import (
        broadcast_row_gate,
        broadcast_threshold_bytes,
    )

    key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, str(16 * 1024 * 1024))
        assert broadcast_threshold_bytes(spark) == 16 * 1024 * 1024
        base = broadcast_row_gate(spark, est_row_bytes=40, build_factor=10.0)
        assert base == int(16 * 1024 * 1024 * 10.0 / 40)  # ~4.19M edges
        spark.conf.set(key, "32m")  # suffix spelling
        assert broadcast_row_gate(
            spark, est_row_bytes=40, build_factor=10.0
        ) == 2 * base
        spark.conf.set(key, "-1")  # broadcast disabled
        assert broadcast_row_gate(spark, est_row_bytes=40) == 0
    finally:
        spark.conf.set(key, saved)


def test_pinned_checkpoint_upgrades_to_reliable(spark, tmp_path):
    """ADVICE r7 #2: localCheckpoint blocks are unreplicated — on a
    cluster, configuring a checkpoint dir must upgrade every pinned
    frame to a RELIABLE checkpoint (files on the checkpoint FS); with
    no dir configured the local fallback still materializes."""
    import os

    from _data_engineering_pipeline_project_spark.functions.persist import (
        pinned_checkpoint,
    )

    sc = spark.sparkContext
    assert sc._jsc.sc().getCheckpointDir().isEmpty()
    df = spark.range(100).withColumn("v", F.col("id") * 3)
    local = pinned_checkpoint(df)
    assert local.count() == 100  # local fallback, no dir needed

    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        reliable = pinned_checkpoint(df)
        assert reliable.count() == 100
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(ckdir)
            for f in fs
        ]
        assert files, "reliable checkpoint wrote no files"
    finally:
        # restore the no-dir state so later tests keep the local path
        none = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(none)


def test_explode_ordered_pairs_complete_and_quadratic_shape(spark):
    """All C(n,2) id-ordered pairs, each exactly once, regardless of
    array order — and the plan is sort+slice explodes (no per-element
    array re-filter: the filter-lambda form is O(|set|³) per group,
    measured 2× slower than a self-join on ~100-wide baskets)."""
    from _data_engineering_pipeline_project_spark.operators.skew import (
        explode_ordered_pairs,
    )

    df = spark.createDataFrame([([5, 1, 9, 3],), ([2, 7],), ([4],)],
                               "ps array<int>")
    got = sorted(
        (r["a"], r["b"])
        for r in explode_ordered_pairs(df, "ps", "a", "b").collect()
    )
    import itertools

    want = sorted(
        p
        for arr in ([5, 1, 9, 3], [2, 7], [4])
        for p in itertools.combinations(sorted(arr), 2)
    )
    assert got == want
    plan = explode_ordered_pairs(df, "ps", "a", "b")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "slice" in plan and "array_sort" in plan
    assert "filter(" not in plan.lower() or "lambdafunction" not in plan
