"""Skew mitigation: salted aggregation.

At 100 TB a handful of hot keys (the viral product, the default region,
the null user) concentrate a shuffle partition onto one executor. AQE's
skew-join splitting handles joins; for aggregations the classic fix is
two-phase salted aggregation:

  phase 1: groupBy(key, salt = hash(row) % n_salts) — partial state
           spreads over n_salts × |keys| groups;
  phase 2: groupBy(key) merges the salted partials.

Only aggregates with a distributive merge (sum/count/min/max — or any
algebraic pair the caller supplies) are eligible; avg must be expressed
as sum+count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    partials per keys (referencing the partial output column names).
    The salt derives from a deterministic hash of ``salt_source`` (or,
    absent one, of every input column) so re-runs and stage retries are
    stable — identical rows share a salt, which spreads hot *keys*
    (the point) even though exact duplicate rows stay together.

    Example — skew-proof revenue per region:
        salted_agg(df, ["region"],
                   [F.sum("amount").alias("s"), F.count(F.lit(1)).alias("c")],
                   [F.round(F.sum("s"), 2).alias("revenue"),
                    F.sum("c").alias("orders")])
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    salted = df.withColumn("__salt", salt)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)
