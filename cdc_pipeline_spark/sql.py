"""SQL surface.

The reference has no SQL entry point (queries are statically wired
DataFrame programs, SURVEY §3); Spark gives us one for free. This module
registers the engine's tables and curated views so users can work in
pure ANSI SQL (`spark.sql(...)`) against the same Catalyst plans the
DataFrame API builds — predicate pushdown, broadcast joins and AQE apply
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_pipeline_spark import schemas as schema_registry
from cdc_pipeline_spark.sources.files import load_table


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> list[str]:
    """Register every testdata table as a temp view (same names the
    DuckDB oracle uses, so any oracle SQL in the workload is also
    runnable — modulo dialect — through spark.sql)."""
    names = names or schema_registry.TESTDATA_TABLE_NAMES
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(names)


def register_views(spark: SparkSession) -> list[str]:
    """Curated derived views over the registered tables."""
    views = {
        # CDC-style latest event per user (mirrors operators.cdc.latest_state)
        "events_latest": """
            SELECT * EXCEPT (__rn) FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
                FROM events
            ) WHERE __rn = 1
        """,
        # enriched order facts
        "orders_enriched": """
            SELECT o.*, c.c_mktsegment, n.n_name AS nation_name
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
    }
    for name, sql in views.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
    return list(views)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin convenience wrapper (symmetry with the DataFrame builders)."""
    return spark.sql(query)
