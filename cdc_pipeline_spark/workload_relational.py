"""Extended relational workload: the remaining TPC-H-shaped plan
patterns over the reduced testdata star schema.

The testdata lacks ``partsupp`` and the commit/receipt date columns, so
each query keeps the ORIGINAL's plan shape (what the optimizer must do)
with predicates adapted to the columns that exist:

  * q2  — aggregate-in-subquery joined back on the grouping key + value
          (min-cost supplier shape, decorrelated to a broadcast join);
  * q4  — EXISTS semi-join with a non-equi residual, then group-count;
  * q8  — multi-way star join (dual nation roles) + conditional-ratio
          "market share" per year;
  * q9  — profit expression over a 5-way join, grouped nation × year;
  * q11 — group-agg HAVING against a global scalar aggregate;
  * q13 — left outer join with an ON-clause filter, then a distribution
          (aggregate of an aggregate);
  * q15 — derived revenue view joined to its own MAX (scalar subquery);
  * q16 — multi-NOT filters + IN-list, count(DISTINCT) per group;
  * q17 — correlated per-key average subquery gating a global sum;
  * q20 — IN-subquery whose body is itself a grouped HAVING;
  * q21 — "only late supplier in a multi-supplier order" (the
          EXISTS / NOT-EXISTS pair, expressed as per-order counters —
          one pass, no self-join explosion);
  * q22 — anti join + global scalar average gate, grouped totals.

All entries follow the workload conventions (identical aliases both
sides, shared floor-form rounding via ``rewrite_sql_rounds`` /
``round_half_up``, no LIMIT without a total ORDER BY).

Scale notes (100 TB): every small side (part/supplier/nation/region and
every scalar or per-group aggregate used as a gate) is broadcast —
the only shuffles are the unavoidable fact-table aggregations; q21 is
deliberately the counter formulation because the textbook
EXISTS/NOT-EXISTS pair plans as two extra lineitem self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.rounding import round_half_up
from cdc_pipeline_spark.workload import _t, register


@register(
    "q2_min_price_per_type",
    """
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM part p
    WHERE p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
    """,
)
def q2_min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: pick the row(s) holding the per-group minimum.
    Decorrelated explicitly: 6-row (p_type, min) aggregate broadcast
    back against the base table — no shuffle of `part` at any scale."""
    part = _t(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_type").alias("m_type")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (F.col("p_type") == F.col("m_type"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q4_priority_late_orders",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (equi key + non-equi
    residual l_shipdate > o_orderdate+30d), then priority counts.
    Semi join keeps each order once regardless of matching line count."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q8_nation_market_share",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_7'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN region    ON r_regionkey = n1.n_regionkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
    JOIN part      ON p_partkey = l_partkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY o_year
    """,
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-way star join with nation in two roles
    (customer side restricts the market, supplier side labels the
    competitor), then a conditional-sum ratio per order year. All dims
    broadcast; lineitem→orders is the single shuffle pair."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")

    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("c_rkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nkey") == F.col("s_nationkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round_half_up(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_nation_year_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
    """,
)
def q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit expression over a 5-way join grouped by
    supplier nation × order year. No partsupp table here, so supply
    cost is modeled as 0.6 × retail price (expression shape identical:
    revenue minus a cost term multiplied by quantity).

    The profit term is summed as DECIMAL(18,6) on BOTH sides: a double
    sum's value depends on fold order (partition count), and at sf0.01
    this query's NATION_12/2000 group lands exactly on a .005 rounding
    boundary — decimal summation is order-independent, so the engines
    agree bit-for-bit before the final round."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            round_half_up(
                F.sum(profit.cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_profit")
        )
    )


@register(
    "q11_top_value_parts",
    """
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5)
                        AS BIGINT)) AS raw_micros
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(CAST(raw_micros AS DOUBLE) / 1000000.0, 2) AS part_value
    FROM per_part
    WHERE raw_micros * 10000 > (SELECT sum(raw_micros) * 6 FROM per_part)
    """,
)
def q11_top_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped value HAVING > fraction-of-global-total.

    The HAVING compares sums of MICRO-QUANTIZED LONGS, not doubles:
    integer addition is exact and associative, so Spark's partial+final
    fold order and DuckDB's sequential fold produce identical sums and
    the row SET is engine-stable even for parts that sit within
    double-noise of the threshold (SCALE.md determinism policy: integer
    sums first). The per-row half-up micro quantization is the only
    rounding and is identical in both engines. The 0.0006 fraction is
    applied as an integer cross-multiply (raw·10000 > total·6) so no
    fractional arithmetic exists anywhere in the compare; long sums also
    keep the aggregation on the fast codegen path the earlier
    decimal(28,6) variant fell off (~4× slower per bench). Bounds: total
    micros ≈ 2.3e15 at sf0.1 and the cross-multiply peaks ~1.4e16, both
    well inside int64; a >sf100 deployment would move the sums to
    decimal(38,0).

    ONE lineitem scan: the global total re-aggregates the per-part sums
    (exact, since integer addition is associative) instead of
    re-scanning the fact table; the one-row threshold is broadcast into
    the filter."""
    li = _t(spark, sf_dir, "lineitem")
    vol_micros = F.floor(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * F.lit(1000000.0)
        + F.lit(0.5)
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(vol_micros).alias("raw_micros"))
    total = per_part.agg((F.sum("raw_micros") * F.lit(6)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("raw_micros") * F.lit(10000) > F.col("threshold"))
        .select(
            "l_partkey",
            round_half_up(
                F.col("raw_micros").cast("double") / F.lit(1000000.0), 2
            ).alias("part_value"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with an ON-clause filter on the
    right side (customers with zero matching orders still count with
    c_count=0), then the distribution of the per-customer counts —
    an aggregate of an aggregate. Second agg is over ≤ a few thousand
    distinct counts → trivially small shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_revenue_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived per-supplier revenue view joined to
    its own MAX (scalar subquery). The revenue view is computed once and
    reused for both sides; max is a one-row broadcast. Revenue is
    rounded (shared floor-form) BEFORE the max/equality so the
    tie-compare is engine-stable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(
        round_half_up(F.sum(vol), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: negated filters + IN-list on the dim, then
    count(DISTINCT supplier) per (brand, type, size). Distinct-agg
    expands to a two-phase plan; part side broadcast into lineitem."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_avg_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (
          SELECT 0.5 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_qty_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average gating a global sum.
    Decorrelated: per-part averages computed once over the brand's
    lineitems (the correlation key is a part attribute, so restricting
    to the brand's partkeys preserves each per-part average), broadcast
    back. Single-row output."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = _t(spark, sf_dir, "lineitem")
    brand_lines = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    per_part_avg = brand_lines.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        brand_lines.join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(round_half_up(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "q20_bulk_part_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey < 13
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 30
      )
    """,
)
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN-subquery whose body is itself a grouped
    HAVING (suppliers who moved > 30 units of some PROMO part in the
    year) — planned as agg → left-semi join into the supplier dim."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    bulk = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
    )
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    # the HAVING output is a small, highly-selective key set — broadcast
    # it into the dim-side semi join rather than shuffling the dim
    return supp.join(
        F.broadcast(bulk.select("l_suppkey").distinct()),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


@register(
    "q21_sole_late_supplier",
    """
    WITH l AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    o AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
        FROM l GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM l
    JOIN o USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE l.is_late = 1 AND o.n_supp > 1 AND o.n_late = 1
    GROUP BY s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier in a
    multi-supplier finished order (late = shipped > 60 days after the
    order date; the schema has no receipt/commit dates). The textbook
    EXISTS + NOT-EXISTS pair would plan as two extra lineitem
    self-joins; this computes per-(order, supplier) lateness once, then
    derives the per-order counters with a window over l_orderkey — one
    lineitem scan and no derived-table self-join (the oracle SQL keeps
    the two-CTE join formulation; semantics are identical)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_supp = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_customer_balance",
    """
    SELECT c_mktsegment AS segment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY segment
    """,
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in selected
    segments with no RECENT orders (every customer has some order in
    this dataset) — global scalar average (one-row broadcast) +
    left-anti join against the date-filtered orders, then grouped
    totals. The date filter is pushed to the orders scan before the
    anti join builds."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_pos_bal")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_half_up(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
