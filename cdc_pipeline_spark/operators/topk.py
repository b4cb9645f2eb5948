"""Sort / limit / top-k operators (SURVEY.md §2.7).

The reference does its ranking driver-side after ``collect()`` (Python
``sorted`` in ``region_aggregator.py:53-65``; ``orderBy().limit(n)`` in
``kpi_aggregator.py:60-67``, ``activity_enricher.py:19-26``). The engine
keeps ranking distributed: global ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject (per-partition heap + tiny driver merge — no full
sort, no full shuffle), and grouped top-k uses a ``row_number`` window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject. Pass deterministic
    tie-breaker columns; at scale a non-deterministic limit is a flaky
    test and an irreproducible result."""
    return df.orderBy(*order_by).limit(k)


def latest(df: DataFrame, time_order: list[Column]) -> DataFrame:
    """Latest-row pick (reference's per-batch `.limit(1)` pattern)."""
    return top_k(df, time_order, 1)


def grouped_top_k(df: DataFrame, partition_by: list[str], order_by: list[Column], k: int, rank_col: str = "rank") -> DataFrame:
    """Top-k within each group via ``row_number`` — one shuffle on the
    group key; at scale prefer this over per-group collects."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
