"""Dimension enrichment via broadcast joins.

The reference *designed* a two-level static-reference lookup — broadcast
equi-join on (country_code, city_pattern), then fallback broadcast join on
country_code with ``coalesce`` of region names (``DESCRIPTION.md:871-893``)
— but shipped fat-event denormalization instead (``FLOW.md:42-55``). This
module implements the designed join path as the engine's enrichment
operator: at 100 TB you cannot re-emit fat events, you broadcast the dims.

Scale posture: dimension tables are small (country/city mappings, users,
products) → ``F.broadcast`` pins BroadcastHashJoin, zero shuffle on the
fact side, and the fact scan keeps its partitioning for downstream aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | None = None,
    how: str = "left",
    condition=None,
) -> DataFrame:
    """Left broadcast equi-join of a fact stream/table with a dimension."""
    return fact.join(F.broadcast(dim), on=on if condition is None else condition, how=how)


def two_level_region_lookup(
    fact: DataFrame,
    city_map: DataFrame,
    country_map: DataFrame,
    country_col: str = "country_code",
    city_col: str = "city",
    out_col: str = "region_name",
    default: str = "Unknown",
) -> DataFrame:
    """Two-level region resolution (DESCRIPTION.md:871-893).

    1. broadcast join on (country_code, city_pattern prefix match) — the
       city level handles splits like US East/West;
    2. fallback broadcast join on country_code alone;
    3. ``coalesce(city_region, country_region, 'Unknown')``.
    """
    city_dim = city_map.select(
        F.col("country_code").alias("__cm_country"),
        F.col("city_pattern").alias("__cm_pattern"),
        F.col("region_name").alias("__cm_region"),
    )
    country_dim = country_map.select(
        F.col("country_code").alias("__co_country"),
        F.col("region_name").alias("__co_region"),
    )
    from pyspark.sql import Window

    tagged = fact.withColumn("__fact_id", F.monotonically_increasing_id())
    step1 = tagged.join(
        F.broadcast(city_dim),
        (tagged[country_col] == F.col("__cm_country"))
        & tagged[city_col].startswith(F.col("__cm_pattern")),
        "left",
    )
    # Overlapping patterns ('San' and 'San Antonio') can both match one
    # fact row; keep only the most specific (longest) pattern so the
    # join never multiplies fact rows.
    best = Window.partitionBy("__fact_id").orderBy(
        F.length(F.col("__cm_pattern")).desc_nulls_last(), F.col("__cm_pattern").asc_nulls_last()
    )
    step1 = (
        step1.withColumn("__cm_rank", F.row_number().over(best))
        .filter(F.col("__cm_rank") == 1)
        .drop("__cm_rank")
    )
    step2 = step1.join(
        F.broadcast(country_dim), step1[country_col] == F.col("__co_country"), "left"
    )
    return step2.withColumn(
        out_col, F.coalesce(F.col("__cm_region"), F.col("__co_region"), F.lit(default))
    ).drop("__cm_country", "__cm_pattern", "__cm_region", "__co_country", "__co_region", "__fact_id")
