"""Drift → re-bootstrap policy (VERDICT r11 #8).

The monitoring loop has existed since r11 — ``DriftMaintainer`` emits
the per-dimension drift report and ``opq_balance_audit`` re-checks the
OPQ allocation's energy balance — but SCALE.md told the operator to
re-bootstrap "past threshold" BY HAND. This operator encodes the
policy: consume the two bounded audit relations, apply explicit
thresholds, and emit a one-row DECISION relation carrying the verdict,
the thresholds it was judged against, the evidence (which dimensions,
which values), and the artifact paths an accepted decision swaps — the
row a scheduler persists next to the index so every re-bootstrap is
attributable to recorded evidence, not an operator's mood.

Triggers (any one suffices — OR semantics, the conservative direction
for an index whose quality decays silently):

- **mean shift**: ≥ ``min_drifted_dims`` dimensions moved more than
  ``mean_shift_threshold`` from the pinned baseline (an encoder change
  or corpus composition shift — frozen codebooks now quantize the new
  mass with the old geometry).
- **variance ratio**: any dimension's variance ratio left
  ``var_ratio_bounds`` (spread/collapse — the rotation's balanced
  allocation no longer matches the spectrum even if means held).
- **balance spread**: the live allocation's max−min per-subspace
  ``log_energy`` exceeds ``balance_spread_threshold`` (the quantity
  ``opq_allocate`` balanced at train time has re-widened — PQ codes
  are again spending bits on noise subspaces).
- **recall floor** (r12): the serving-quality metric itself — mean
  recall@k over the fixed query panel (the
  ``ivfopq_recall_audit_embeddings`` relation) fell below
  ``min_recall``. The drift monitors are PROXIES for this number;
  when ground-truth recall is measured on a schedule, it is the
  trigger of record.

Everything is driver-bounded by construction: the drift report is
≤ d rows, the balance audit is m rows (the Lloyd-centroid collect
discipline), and the decision is one row. No corpus scan happens here
— the inputs are the maintained monitors' outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = (
    "decision boolean, n_drifted_dims int, drifted_dims string, "
    "max_mean_shift double, worst_var_ratio double, "
    "balance_spread double, mean_shift_threshold double, "
    "var_ratio_low double, var_ratio_high double, "
    "balance_spread_threshold double, mean_recall double, "
    "min_recall double, evidence string, artifacts string"
)


def rebootstrap_decision(
    spark: SparkSession,
    drift_report: DataFrame,
    balance_audit: DataFrame | None = None,
    *,
    recall_audit: DataFrame | None = None,
    min_recall: float | None = None,
    mean_shift_threshold: float = 0.25,
    var_ratio_bounds: tuple[float, float] = (0.5, 2.0),
    min_drifted_dims: int = 1,
    balance_spread_threshold: float | None = None,
    artifacts: dict[str, str] | None = None,
) -> DataFrame:
    """One decision row from the maintained monitors.

    ``drift_report``: ``DriftMaintainer.drift_report()`` shape
    (dim, mean_a, mean_b, mean_shift, var_a, var_b, var_ratio).
    ``balance_audit``: the ``opq_balance_audit_embeddings`` shape
    (subspace, n_dims, sum_eigenvalue, variance_share, log_energy);
    optional — pass None to judge on drift alone.
    ``recall_audit``: the ``ivfopq_recall_audit_embeddings`` shape
    (query_id, hits, recall) — one row per panel query; with
    ``min_recall`` set, a mean panel recall below the floor triggers
    on its own (bounded: the panel is a fixed query set by contract).
    ``artifacts``: name → path of what an accepted decision swaps
    (e.g. ``{"opq_index": ".../opq", "ivf_lists": ".../ivf"}``) —
    recorded verbatim in the row so the swap job needs no side
    channel."""
    lo, hi = var_ratio_bounds
    if not (0 < lo < hi):
        raise ValueError(f"var_ratio_bounds must be 0 < lo < hi, got {lo, hi}")

    rows = drift_report.select(
        "dim", "mean_shift", "var_ratio"
    ).collect()  # bounded: ≤ d rows by the report's contract
    shifted = sorted(
        (r["dim"] for r in rows if r["mean_shift"] >= mean_shift_threshold)
    )
    var_escaped = sorted(
        (
            r["dim"]
            for r in rows
            if r["var_ratio"] is not None
            and not (lo <= r["var_ratio"] <= hi)
        )
    )
    max_shift = max((r["mean_shift"] for r in rows), default=0.0)
    # "worst" = farthest from 1 in log space (0.25× is as bad as 4×)
    worst_ratio = None
    for r in rows:
        v = r["var_ratio"]
        if v is not None and v > 0:
            if worst_ratio is None or abs_log(v) > abs_log(worst_ratio):
                worst_ratio = v

    spread = None
    if balance_audit is not None:
        energies = [
            r["log_energy"]
            for r in balance_audit.select("log_energy").collect()
        ]  # bounded: m rows
        if energies:
            spread = max(energies) - min(energies)

    mean_recall = None
    if recall_audit is not None:
        recalls = [
            r["recall"] for r in recall_audit.select("recall").collect()
        ]  # bounded: fixed panel size by contract
        if not recalls:
            # an empty panel is a monitoring failure, not evidence of
            # health — the broken-serving-path case is exactly when the
            # floor matters most (r12 review finding). Fail loudly.
            raise ValueError(
                "recall_audit has no rows: the query panel is empty or "
                "the audit pipeline is broken; refusing to report "
                "'within thresholds' on missing evidence. Fix the "
                "panel, or omit recall_audit to judge on drift alone."
            )
        mean_recall = sum(recalls) / len(recalls)

    reasons = []
    if (
        min_recall is not None
        and mean_recall is not None
        and mean_recall < min_recall
    ):
        reasons.append(
            f"mean panel recall {round(mean_recall, 6)} < floor "
            f"{min_recall} (ground truth outranks proxies)"
        )
    if len(shifted) >= min_drifted_dims and shifted:
        reasons.append(
            f"mean shift >= {mean_shift_threshold} on dims {shifted} "
            f"(max {max_shift})"
        )
    if var_escaped:
        reasons.append(
            f"variance ratio outside [{lo}, {hi}] on dims {var_escaped} "
            f"(worst {worst_ratio})"
        )
    if (
        balance_spread_threshold is not None
        and spread is not None
        and spread > balance_spread_threshold
    ):
        reasons.append(
            f"subspace log-energy spread {round(spread, 6)} > "
            f"{balance_spread_threshold} (allocation re-widened)"
        )

    decision = bool(reasons)
    evidence = (
        "; ".join(reasons)
        if reasons
        else "all monitors within thresholds — keep serving frozen index"
    )
    art = (
        ", ".join(f"{k}={v}" for k, v in sorted(artifacts.items()))
        if artifacts
        else ""
    )
    from _data_engineering_pipeline_project_spark.functions.localrel import (
        local_df,
    )

    return local_df(
        spark,
        [
            (
                decision,
                len(shifted),
                ",".join(str(d) for d in shifted),
                float(max_shift),
                float(worst_ratio) if worst_ratio is not None else None,
                float(spread) if spread is not None else None,
                float(mean_shift_threshold),
                float(lo),
                float(hi),
                float(balance_spread_threshold)
                if balance_spread_threshold is not None
                else None,
                float(mean_recall) if mean_recall is not None else None,
                float(min_recall) if min_recall is not None else None,
                evidence,
                art,
            )
        ],
        _SCHEMA,
    )


def abs_log(x: float) -> float:
    import math

    return abs(math.log(x))
