"""Partitioning utilities shared by expression-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition to the session's default parallelism (or an explicit
    count) before expensive per-row work — shingling, hashing, all-pairs
    scoring, Arrow decode.

    Small single-file parquet inputs arrive as ONE partition and would
    otherwise serialize the whole operator onto one core (measured 10s →
    0.6s for sf0.1 shingling). Uses an explicit numPartitions so AQE does
    not coalesce it away.
    """
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism)
