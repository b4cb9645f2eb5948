"""SQL entry point: registered views must serve ANSI SQL with the same
results as the DataFrame builders."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipeline_spark import sql as sql_surface
from cdc_pipeline_spark import workload

SF_DIR = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_builder(spark):
    sql_surface.register_tables(spark, SF_DIR)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    expect = (
        workload.QUERIES["q1_pricing_summary"](spark, SF_DIR)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .collect()
    )
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got) == key(expect)


def test_curated_views(spark):
    sql_surface.register_tables(spark, SF_DIR)
    sql_surface.register_views(spark)
    latest = spark.sql("SELECT count(*) AS n FROM events_latest").collect()[0].n
    users = spark.sql("SELECT count(DISTINCT user_id) AS n FROM events").collect()[0].n
    assert latest == users  # exactly one latest row per user
    seg = spark.sql(
        "SELECT count(*) AS n FROM orders_enriched WHERE c_mktsegment IS NOT NULL"
    ).collect()[0].n
    assert seg > 0
