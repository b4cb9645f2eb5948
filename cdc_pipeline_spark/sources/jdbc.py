"""JDBC batch snapshots (dimension bootstrap / backfill).

Reference: one-shot Postgres table read (S9, ``kafka_sources.py:171-180``)
used as the dimension fallback. The engine adds the two things that
matter at scale: predicate-partitioned parallel reads (a single-threaded
JDBC scan of a big table is a non-starter) and explicit pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    fetch_size: int = 10_000,
) -> DataFrame:
    """One-shot table read; pass partition_column + bounds to fan the scan
    out over num_partitions range predicates."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads require lower_bound and upper_bound "
                "(e.g. SELECT min/max of the partition column first)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
