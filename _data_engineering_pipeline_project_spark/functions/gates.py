"""Adaptive small-side gates derived from the session's
``spark.sql.autoBroadcastJoinThreshold``.

Several operators pick between a broadcast-shaped plan and a
shuffle-shaped plan at runtime, after MATERIALIZING the small side's
row count (triangle counting's edge relation, connected components'
driver-side union-find bound, semantic decontamination's bench side).
Those gates used to be magic row-count constants (4M edges / 200k edges
/ 100k vectors — VERDICT r7 task #5); a cluster operator who raised the
broadcast threshold for bigger executors moved none of them. Deriving
every gate as ``threshold_bytes × build_factor / est_row_bytes`` moves
them all coherently with one conf.

``build_factor`` is deliberately per-site and can exceed 1: the conf
bounds the optimizer's SPECULATIVE conversions, which act on plan-time
size ESTIMATES that can be badly wrong (the r7 100× sweep OOM'd on
exactly that — see session.py). These gates fire on an exact, already-
materialized count of a relation whose row width is known, so a site
may safely allow a build several times the speculative bound (narrow
two-long rows), or stay under it (fat vector rows, driver collects).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}

_DEFAULT_THRESHOLD = 10 * 1024 * 1024  # Spark's own default (10 MB)


def size_conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """A byte-size session conf as an int (parses the ``10m`` / ``512k``
    / ``134217728b`` / plain-integer spellings Spark accepts; negative
    values pass through so callers can treat them as "disabled")."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    if raw.endswith("b"):
        raw = raw[:-1]
    mult = 1
    if raw and raw[-1] in _SUFFIX:
        mult = _SUFFIX[raw[-1]]
        raw = raw[:-1]
    try:
        return int(raw) * mult
    except ValueError:
        return default


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (parses the
    ``10m`` / ``512k`` / plain-integer spellings; -1 = disabled stays
    negative so callers can route to the shuffle path)."""
    return size_conf_bytes(
        spark, "spark.sql.autoBroadcastJoinThreshold", _DEFAULT_THRESHOLD
    )


def broadcast_row_gate(
    spark: SparkSession, est_row_bytes: int, build_factor: float = 1.0
) -> int:
    """Max row count for which a relation of ``est_row_bytes``-wide rows
    should take a site's broadcast/collect path.

    ``threshold × build_factor / est_row_bytes``, floored; 0 when
    broadcasting is disabled (threshold ≤ 0) so every gated site falls
    through to its shuffle plan."""
    thr = broadcast_threshold_bytes(spark)
    if thr <= 0:
        return 0
    return int(thr * build_factor / est_row_bytes)
