"""Table normalization (M4) — 1NF→3NF split with surrogate keys.

The reference splits the raw ``geolocation`` table into
``geo_city_state`` / ``geo_zip`` / ``geo_coordinates`` with pandas
``drop_duplicates`` + ``index+1`` surrogate keys + a per-row ``apply``
dict lookup (reference project/etl2.py:204-243). The engine generalizes
this to :func:`extract_dimension`: dedup the dimension attributes, assign
deterministic surrogate keys, join the mapping back (AQE picks
broadcast-hash when the dimension is measurably small; no forced hint).

Scale note: surrogate keys are assigned with the bucketed two-pass rank
(`functions/twopass.py`) — the DataFrame-native partition-offset
assignment (per-bucket row_number + stitched offsets), so even a
billion-row dimension (user dims, URL dims extracted from a 100 TB
fact table) never funnels through a single-partition sort; the fact
table side only sees a broadcast hash join (no shuffle) when the
dimension is small, a regular hash join when it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_dimension(
    df: DataFrame,
    dim_cols: list[str],
    key_col: str,
    broadcast: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``dim_cols`` out of ``df`` into a keyed dimension table.

    Returns ``(dim, mapped)`` where ``dim`` has one row per distinct
    ``dim_cols`` combination with surrogate ``key_col`` = row_number
    ordered by the attributes (deterministic — the reference's
    ``index + 1`` depends on file order, etl2:211), and ``mapped`` is
    ``df`` with ``key_col`` attached via an equi-join on the attributes
    (the reference's per-row dict ``apply``, etl2:213-217).

    ``broadcast`` controls the map-back join strategy:

    - ``None`` (default) — NO hint; Catalyst/AQE picks broadcast-hash
      when the dimension's measured size is under
      ``spark.sql.autoBroadcastJoinThreshold`` and a shuffled hash/
      sort-merge join otherwise. This is the only safe default at
      100 TB: a billion-row dimension (user dims, URL dims extracted
      from the fact table) force-broadcast would OOM every executor.
    - ``True`` — force ``F.broadcast(dim)`` when the CALLER knows the
      dimension is small (e.g. a fixed geography) and wants to skip
      AQE's size estimation.

    The numbering runs on the bucketed two-pass rank
    (`functions/twopass.py`, string leading keys bin by zero-padded
    byte prefix) — dimension cardinality is usually modest, but a
    surrogate-keyed dimension extracted from a 100 TB fact table is
    exactly where "dimension-sized" stops being small, and the two-pass
    costs nothing extra when it is small."""
    from _data_engineering_pipeline_project_spark.functions.twopass import (
        bucketed_cumulative,
    )

    dim = (
        bucketed_cumulative(
            df.select(*dim_cols).dropDuplicates(), list(dim_cols),
            rank_col=key_col,
        )
        .withColumn(key_col, F.col(key_col).cast("int"))
        .select(key_col, *dim_cols)
    )
    dim_side = F.broadcast(dim) if broadcast else dim
    mapped = df.join(dim_side, on=dim_cols, how="left")
    return dim, mapped


def normalize_geolocation(geo: DataFrame) -> dict[str, DataFrame]:
    """The reference's exact 3NF split (etl2:204-243), on its column names:

    - ``geo_city_state(city_id, city, state)`` — dedup city/state pairs +
      surrogate key (etl2:206-211)
    - ``geo_zip(zip_code, city_id)`` — one row per zip (etl2:220-224)
    - ``geo_coordinates(zip_code, longitude, latitude)`` (etl2:226-233)
    """
    dim, mapped = extract_dimension(
        geo.withColumnRenamed("geolocation_city", "city").withColumnRenamed(
            "geolocation_state", "state"
        ),
        ["city", "state"],
        "city_id",
    )
    # one row per zip; the reference keeps the first file-order occurrence
    # (etl2:221) — nondeterministic at scale, so the engine keeps min(city_id)
    geo_zip = (
        mapped.select(
            F.col("geolocation_zip_code_prefix").alias("zip_code"), F.col("city_id")
        )
        .groupBy("zip_code")
        .agg(F.min("city_id").alias("city_id"))
    )
    geo_coordinates = mapped.select(
        F.col("geolocation_zip_code_prefix").alias("zip_code"),
        F.col("geolocation_lng").alias("longitude"),
        F.col("geolocation_lat").alias("latitude"),
    ).dropDuplicates()
    return {
        "geo_city_state": dim,
        "geo_zip": geo_zip,
        "geo_coordinates": geo_coordinates,
    }
