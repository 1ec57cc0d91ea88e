"""Global-window policy pin (docs/SCALE.md): no registered query may
carry an ORDERED UNPARTITIONED window over unbounded input. The bucketed
two-pass (`functions/twopass.py`) exists precisely so prefix/rank work
never single-partition-sorts; the only global-ordered windows allowed
are the whitelisted bounded classes below — each over a frame whose size
is fixed by a LIMIT, a seed count, or a value grid, never by row count.

A new query that trips this test either adopts the two-pass or adds a
whitelist entry with a justification the next reviewer can check.
"""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"

# query -> why its ordered-global window is bounded (frame-size proof)
WHITELIST = {
    # TakeOrdered pattern: orderBy().limit(N) FIRST, then rank the N
    # survivors — the window input is ≤ N rows by construction
    "bigram_pmi_top20": "rank after limit(20)",
    "market_basket_part_pairs": "rank after limit(25)",
    "seasonal_residual_events": "rank after limit(50)",
    "top_customers_by_revenue": "rank after limit(10)",
    "top_session_paths_events": "rank after limit(15)",
    "hybrid_search_rrf": "3 ranks, each after limit(20)/limit(10)",
    "hybrid_search_rrf_maintained": (
        "3 ranks, each after limit(20)/limit(10) — the maintained "
        "serving twin fuses the same TakeOrdered frames"
    ),
    "rag_retrieval_pipeline": "3 ranks, each after limit(k)",
    "rag_retrieval_maintained": (
        "3 ranks, each after limit(k) — maintained-lexical twin of "
        "rag_retrieval_pipeline, same TakeOrdered frames"
    ),
    "vocab_coverage_top30": "rank + cum share after limit(30)",
    "dsir_importance_resample_documents": "rank after limit(100)",
    # seed/centroid frames: deterministic TakeOrdered seeds, so the
    # window input is ≤ num_centroids / ksub rows (8-64)
    "embedding_topk_ivf": "seed row_number over ≤num_centroids rows",
    "embedding_topk_filtered_ivf": "seed row_number over ≤num_centroids rows (same seed frame as embedding_topk_ivf; the label filter sits in the probe join, not the window)",
    "embedding_topk_ivf_refined": "seed windows per Lloyd round, ≤centroids",
    "embedding_topk_ivfpq": "IVF seeds + PQ codebook seeds, ≤64 rows",
    "embedding_topk_ivfopq": "IVF seeds + PQ codebook seeds over the rotated corpus, ≤64 rows",
    "embedding_topk_pq": "PQ codebook seeds, ≤ksub rows",
    "embedding_topk_opq": "PQ codebook seeds over the rotated corpus, ≤ksub rows",
    "bottomk_sample_documents": "rank after bottom-k limit(64)",
    "semantic_dup_pairs_embeddings": "centroid seed frame, ≤centroids",
    "semantic_decontamination_ivf_embeddings": "seed row_number over ≤8 rows",
    # value-grid frames: the ordered input is one row per distinct
    # day — bounded by the calendar span, not the row count
    "concurrent_open_orders_daily": "daily delta grid cumsum",
}

_WINDOW_RE = re.compile(r"Window \[(.*?)\], \[(.*?)\](?:, \[(.*?)\])?")


def _global_ordered_windows(plan: str) -> list[str]:
    out = []
    for m in _WINDOW_RE.finditer(plan):
        g = m.groups()
        # two bracket groups where the second is an ORDERING (carries
        # NULLS FIRST/LAST markers) = unpartitioned ordered window;
        # partition-only windows (no ordering) shard fine
        if g[2] is None and "NULLS" in (g[1] or ""):
            out.append(m.group(0)[:120])
    return out


_PLAN_CACHE: dict[str, str] = {}


def _registry_plans(spark) -> dict[str, str]:
    """Physical plan of every registered query, built ONCE per test
    session (the policy tests below all read from this map)."""
    if _PLAN_CACHE:
        return _PLAN_CACHE
    import __spark_entry__ as entry

    for name, fn in sorted(entry.queries().items()):
        try:
            _PLAN_CACHE[name] = (
                fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception:
            continue  # env-gated constructions surface in their own tests
    return _PLAN_CACHE


def test_registry_has_no_unwhitelisted_global_ordered_windows(spark):
    offenders: dict[str, list[str]] = {}
    for name, plan in _registry_plans(spark).items():
        hits = _global_ordered_windows(plan)
        if hits and name not in WHITELIST:
            offenders[name] = hits
    assert not offenders, (
        "global-ordered windows outside the whitelist — use the bucketed "
        f"two-pass or whitelist with a bound proof: {offenders}"
    )


def test_registry_has_no_cartesian_products(spark):
    """No registered query may compile to a CartesianProductExec — the
    all-pairs physical join that is quadratic in ROW COUNT and the
    classic 100 TB killer. (`crossJoin` against a broadcast single-row
    aggregate compiles to BroadcastNestedLoopJoin with a 1-row build
    side, which is a per-row constant and NOT flagged here; an
    unbroadcastable cross join degrades to CartesianProduct and IS.)"""
    offenders = [
        name
        for name, plan in _registry_plans(spark).items()
        if "CartesianProduct" in plan
    ]
    assert not offenders, (
        f"CartesianProductExec in physical plans: {offenders} — broadcast "
        "the small side or re-shape the join"
    )


def test_whitelist_entries_still_exist(spark):
    import __spark_entry__ as entry

    registered = set(entry.queries())
    stale = [q for q in WHITELIST if q not in registered]
    assert not stale, f"whitelist entries for unregistered queries: {stale}"
