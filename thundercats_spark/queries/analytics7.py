"""Tenth query wave (r09): the two relational surfaces VERDICT r08
identified as having no registry representative, filling the rotation's
exactly-2 slack slots (see the capacity policy in queries/__init__.py).

1. SCD2 interval construction (slowly-changing-dimension type 2):
   collapse a per-customer stream of observations into validity
   intervals [valid_from, valid_to) over which the observed attribute
   was constant — the gaps-and-islands pattern (change flag via LAG →
   running-sum segment id → per-segment MIN/MAX → LEAD for the closing
   bound). The natural companion of orders_latest_per_customer's
   snapshot view: that query answers "state now", this one answers
   "state as of any time T".

2. Nested array-of-structs analytics via higher-order functions:
   build each order's lineitems as a SORTED array<struct> and derive
   per-order facts with filter / exists / transform / aggregate — the
   HOF surface (SparkSQL lambda functions) no other registry entry
   exercises. The DuckDB oracle computes the same facts with plain
   grouped aggregation, which is the exactness point: HOFs over a
   per-key array must agree with the flat GROUP BY.

Cross-engine exactness discipline: money math in DECIMAL end-to-end
(array `aggregate` folds in array order — float would make the fold
order-sensitive, decimal is exact and order-free), surfaced as DOUBLE;
dates out as 'yyyy-MM-dd' strings; every aggregate aliased identically
in both engines; total output order via key columns.

Reference parity: composes the reference's Window/Group surfaces
(physical/Op.scala:30-150); SCD2 and nested-array analytics are
brief-mandated completeness (large-scale pipeline operations), not a
reference port.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# SCD2: customer order-priority validity intervals.
# --------------------------------------------------------------------------

SCD2_SQL = """
WITH e AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN LAG(o_orderpriority) OVER w IS NULL
                OR LAG(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
s AS (
  SELECT o_custkey, o_orderdate, o_orderpriority,
         SUM(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS seg
  FROM e
),
g AS (
  SELECT o_custkey, seg,
         MIN(o_orderpriority) AS priority,
         MIN(o_orderdate) AS vf,
         COUNT(*) AS n_obs
  FROM s GROUP BY o_custkey, seg
)
SELECT o_custkey,
       CAST(seg AS BIGINT) AS seg_id,
       priority,
       strftime(vf, '%Y-%m-%d') AS valid_from,
       COALESCE(
         strftime(LEAD(vf) OVER (PARTITION BY o_custkey ORDER BY seg),
                  '%Y-%m-%d'),
         '9999-12-31') AS valid_to,
       CAST(n_obs AS BIGINT) AS n_obs
FROM g ORDER BY o_custkey, seg_id
"""

# SCD2 operator machinery lives in operators/scd2.py (review r09);
# re-exported here so existing imports of this query-wave module keep
# working (tests, examples, and the r09 SURVEY references).
from thundercats_spark.operators.scd2 import (  # noqa: F401
    scd2_apply_batch,
    scd2_as_of,
    scd2_intervals,
    scd2_join_facts,
    scd2_state,
    scd2_update_parquet,
)

@register("customer_scd2_intervals", SCD2_SQL)
def customer_scd2_intervals(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")["orders"]
    return scd2_intervals(
        orders.select("o_custkey", "o_orderkey", "o_orderdate",
                      "o_orderpriority"),
        key="o_custkey", ts="o_orderdate", attr="o_orderpriority",
        tiebreak="o_orderkey",
    )


# --------------------------------------------------------------------------
# Nested array-of-structs per order + higher-order functions.
# --------------------------------------------------------------------------

NESTED_SQL = """
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS big_qty_items,
       BOOL_OR(l_returnflag = 'R') AS has_return,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS net_revenue,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS max_item_net
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


def nested_lineitem_facts(li):
    """Per-order facts derived ENTIRELY from a nested array<struct> via
    higher-order functions — size / filter / exists / transform /
    aggregate — checked against the flat GROUP BY oracle.

    The array is sorted on the (unique-per-order) line number so every
    array-order-dependent step is deterministic; the `aggregate` fold
    accumulates DECIMAL, so even the fold order cannot matter. All
    lambda work is JVM whole-stage-codegen expression evaluation — no
    Python UDF anywhere.

    Scale posture: ONE shuffle (groupBy orderkey, collect_list) builds
    the nested rows; every HOF then runs narrow over the grouped row —
    this is exactly the layout a document/training-record store keeps,
    where the nesting is already materialized and the HOF pass is
    shuffle-free. Arrays are bounded by lines-per-order (≤7 in TPC-H),
    not data volume.
    """
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").alias("qty"),
        _dec("l_extendedprice").alias("price"),
        _dec("l_discount").alias("disc"),
        F.col("l_returnflag").alias("rf"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(item)).alias("items")
    )
    net = lambda x: x["price"] * (F.lit(1) - x["disc"])  # noqa: E731
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.size(F.filter("items", lambda x: x["qty"] >= 30))
        .cast("long")
        .alias("big_qty_items"),
        F.exists("items", lambda x: x["rf"] == "R").alias("has_return"),
        F.aggregate(
            "items",
            F.lit(0).cast("decimal(30,4)"),
            lambda acc, x: (acc + net(x)).cast("decimal(30,4)"),
        )
        .cast("double")
        .alias("net_revenue"),
        F.array_max(F.transform("items", net))
        .cast("double")
        .alias("max_item_net"),
    ).orderBy("l_orderkey")


@register("orders_nested_lineitems", NESTED_SQL)
def orders_nested_lineitems(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return nested_lineitem_facts(li)
