"""Classic relational coverage: aggregation pipelines, broadcast joins,
top-k, rollup, and JSON flattening (K2's dataset-level analogue).

These cover the gap list of SURVEY §2.9 — operators the reference lacks but
a complete engine needs: multi-table joins, grouped aggregation with
map-side combine, grouping-sets rollup, global top-k, semi-structured
flattening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped aggregation with map-side partial aggregation
    (check 'partial_' aggregates in .explain). Sums rounded 2dp for
    cross-engine FP stability."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with an explicitly broadcast dimension
    (customer is small — never shuffle the fact side for it), grouped
    revenue, global top-10.

    Join ORDER matters at scale: orders x broadcast(customer) runs FIRST,
    so the BUILDING-segment selectivity (~1/5) cuts the orders side before
    lineitem joins — the big fact table shuffles against a pre-filtered
    orders, not the full one (AQE cannot reorder across the aggregate)."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    building_orders = orders.join(F.broadcast(cust),
                                  orders.o_custkey == cust.c_custkey)
    return (li.join(building_orders, li.l_orderkey == building_orders.o_orderkey)
            .groupBy("o_orderkey")
            .agg(F.round(F.sum(revenue), 2).alias("revenue"),
                 F.min("o_orderdate").cast("date").cast("string").alias("orderdate"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10)
            .withColumnRenamed("o_orderkey", "orderkey"))


TOP_REVENUE_ORDERS_SQL = """
SELECT o_orderkey AS orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(min(o_orderdate)::DATE AS VARCHAR) AS orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (returnflag, linestatus) — subtotals + grand
    total; NULL group markers coalesced to 'ALL' for stable comparison."""
    li = table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count("*").alias("n_rows"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "sum_qty", "n_rows")
            .orderBy("returnflag", "linestatus"))


ROLLUP_PRICING_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def k2_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured flattening — the dataset-level analogue of the KIE
    dict->fields flatten (kie/donut_runner.py:261-345): pull typed values
    out of the JSON props column."""
    ev = table(spark, sf_dir, "events")
    return (ev.select("event_id",
                      F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"))
            .orderBy("event_id"))


K2_JSON_FLATTEN_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
FROM events
ORDER BY event_id
"""


def set_ops_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations coverage (EXCEPT / anti-join shape): users who crossed
    the mid-value band (>300) but never the high band (>380) — the value
    distribution tails make this non-trivially non-empty at every sf."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 300).select("user_id").distinct()
    b = ev.filter(F.col("value") > 380).select("user_id").distinct()
    return a.exceptAll(b).orderBy("user_id")


SET_OPS_DEDUP_SQL = """
SELECT DISTINCT user_id FROM events WHERE value > 300
EXCEPT
SELECT DISTINCT user_id FROM events WHERE value > 380
ORDER BY user_id
"""


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the six-table star join — customer/orders/lineitem
    fact chain equi-joined with the supplier side co-located on nationkey,
    dimension tables (nation, region) broadcast. Per-nation revenue for
    one region and one order year. Exercises join reordering + broadcast
    selection + partial aggregation in a single plan."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (cust
            .join(orders, cust.c_custkey == orders.o_custkey)
            .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
            .join(li, F.col("o_orderkey") == li.l_orderkey)
            .join(sup, (li.l_suppkey == sup.s_suppkey)
                  & (cust.c_nationkey == sup.s_nationkey))
            .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .filter(F.col("r_name") == "ASIA")
            .groupBy("n_name")
            .agg(F.round(F.sum(revenue), 2).alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy(F.col("revenue").desc(), "n_name"))


TPCH_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
