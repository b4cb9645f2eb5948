"""Trend computation — current vs previous period percent change.

The reference computes KPI trends driver-side against a Redis hourly
snapshot with a 2h TTL (``kpi_aggregator.py:28-51,74-95``); SURVEY §2.6
notes the relational form is ``lag(value) over (order by period)``. The
engine implements the relational form: it is testable, exact, and at
scale it is a tiny post-aggregation window over a handful of period rows
(the input here is already aggregated — #periods rows, not raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.rounding import round_half_up


def period_over_period(
    df: DataFrame,
    time_col: str,
    value_cols: list[str],
    period: str = "hour",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Percent change of each value column vs the previous period.

    ``trend = round((cur - prev) / prev * 100, 2)`` with NULL when there is
    no previous period or prev == 0 (the reference returns 0.0 trend when
    the baseline is missing, kpi_aggregator.py:33-39 — callers can
    ``coalesce`` to 0.0 to match).

    The unpartitioned ``Window.orderBy`` is safe here because the input is
    post-aggregation (one row per period[, group]); pass ``partition_by``
    to keep the window parallel when trending per group.
    """
    bucket = F.date_trunc(period, F.col(time_col)).alias("period_start")
    aggs = [round_half_up(F.sum(c), 2).alias(c) for c in value_cols]
    grouped = df.groupBy(bucket, *[F.col(c) for c in (partition_by or [])]).agg(*aggs)

    w = Window.partitionBy(*(partition_by or [])).orderBy("period_start")
    out = grouped
    for c in value_cols:
        prev = F.lag(F.col(c)).over(w)
        out = out.withColumn(
            f"{c}_trend",
            F.when(
                prev.isNotNull() & (prev != 0),
                round_half_up((F.col(c) - prev) / prev * 100.0, 2),
            ),
        )
    return out.withColumn("period_start", F.col("period_start").cast("long"))
