"""Relational-core queries (SURVEY.md §2.1) — each exercises a library
operator (thundercats_spark.physical.ops / preprocess) on the driver's
tables, paired with its ANSI-SQL oracle. These are the reference-parity
checks: Join.{inner,left,outer,broadcast,expr}, Group.agg (both
strategies), Filter.{where,na,by_range}, Order.by, F_.add_col,
Agg.{reduce,by_key}, Transform.{select,rename}, Text.trim."""

from __future__ import annotations

from pyspark.sql import functions as F

from thundercats_spark.physical.ops import Agg, F_, Filter, Group, Join, Order, Transform
from thundercats_spark.preprocess.text import trim as text_trim
from thundercats_spark.queries import load, register

# -- joins -------------------------------------------------------------------

JOIN_INNER_SQL = """
SELECT o_orderkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("join_inner", JOIN_INNER_SQL)
def join_inner(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    joined = Join.inner(
        t["orders"], t["customer"], F.col("o_custkey") == F.col("c_custkey")
    ).get
    return joined.select("o_orderkey", "c_name", "o_totalprice")


JOIN_LEFT_SQL = """
SELECT c_custkey, c_name, o_orderkey
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


@register("join_left", JOIN_LEFT_SQL)
def join_left(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    joined = Join.left(
        t["customer"], t["orders"], F.col("c_custkey") == F.col("o_custkey")
    ).get
    return joined.select("c_custkey", "c_name", "o_orderkey")


JOIN_OUTER_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
           FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, n_customers, n_suppliers
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


@register("join_outer", JOIN_OUTER_SQL)
def join_outer(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "supplier")
    c = Agg.by_key_df(
        t["customer"].select(F.col("c_nationkey").alias("nationkey"), F.lit(1).alias("one")),
        "nationkey", "one", "count",
    ).withColumnRenamed("one", "n_customers")
    s = Agg.by_key_df(
        t["supplier"].select(F.col("s_nationkey").alias("nationkey"), F.lit(1).alias("one")),
        "nationkey", "one", "count",
    ).withColumnRenamed("one", "n_suppliers")
    return Join.outer(c, s, ["nationkey"]).get.select("nationkey", "n_customers", "n_suppliers")


JOIN_BROADCAST_SQL = """
SELECT p_brand, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register("join_broadcast", JOIN_BROADCAST_SQL)
def join_broadcast(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "part")
    # align the key name for the equi-join on the broadcast side
    part = t["part"].withColumnRenamed("p_partkey", "l_partkey")
    joined = Join.broadcast_df(
        t["lineitem"], part, on=["l_partkey"], right_columns=["p_brand"],
    )
    return Group.agg_df(
        joined, ["p_brand"],
        [
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        ],
    )


JOIN_EXPR_SQL = """
SELECT o_orderkey, c_custkey
FROM orders JOIN customer
  ON o_custkey = c_custkey AND o_totalprice > c_acctbal
"""


@register("join_expr", JOIN_EXPR_SQL)
def join_expr(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    cond = (F.col("o_custkey") == F.col("c_custkey")) & (
        F.col("o_totalprice") > F.col("c_acctbal")
    )
    return Join.inner(t["orders"], t["customer"], cond).get.select("o_orderkey", "c_custkey")


# -- group/agg ----------------------------------------------------------------

GROUP_AGG_MAP_SQL = """
SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       MAX(l_discount) AS max_disc
FROM lineitem GROUP BY l_returnflag
"""


@register("group_agg_map", GROUP_AGG_MAP_SQL)
def group_agg_map(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    li = li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(12,2)"))
    out = Group.agg_map_df(li, ["l_returnflag"], {"l_quantity": "sum", "l_discount": "max"})
    out = Transform.rename(
        out, {"sum(l_quantity)": "sum_qty", "max(l_discount)": "max_disc"}
    ).get
    return out.withColumn("sum_qty", F.col("sum_qty").cast("double"))


GROUP_AGG_COLS_SQL = """
SELECT o_orderstatus,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM orders GROUP BY o_orderstatus
"""


@register("group_agg_cols", GROUP_AGG_COLS_SQL)
def group_agg_cols(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return Group.agg_df(
        o, ["o_orderstatus"],
        [
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        ],
    )


# -- filters ------------------------------------------------------------------

FILTER_WHERE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
"""


@register("filter_where", FILTER_WHERE_SQL)
def filter_where(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    out = Filter.where(li, (F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).get
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


FILTER_NA_SQL = """
SELECT c_custkey, o_orderkey
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
WHERE o_orderkey IS NOT NULL
"""


@register("filter_na", FILTER_NA_SQL)
def filter_na(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    joined = Join.left(
        t["customer"], t["orders"], F.col("c_custkey") == F.col("o_custkey")
    ).get.select("c_custkey", "o_orderkey")
    return Filter.na(joined, ["o_orderkey"]).get


FILTER_RANGE_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders WHERE o_totalprice >= 1000 AND o_totalprice <= 5000
"""


@register("filter_range", FILTER_RANGE_SQL)
def filter_range(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return Filter.by_range(o, "o_totalprice", (1000, 5000)).get.select(
        "o_orderkey", "o_totalprice"
    )


# -- order / project / columns -------------------------------------------------

ORDER_BY_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


@register("order_by", ORDER_BY_SQL)
def order_by(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"].select("o_orderkey", "o_totalprice")
    # orderBy+limit plans as TakeOrdered — no global sort at scale.
    return Order.by(o, [F.desc("o_totalprice"), F.asc("o_orderkey")]).get.limit(100)


ADD_COLUMN_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
"""


@register("add_column", ADD_COLUMN_SQL)
def add_column(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    out = F_.add_col(
        li, "net_price", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).get
    return out.select("l_orderkey", "l_linenumber", "net_price")


# -- whole-column / by-key reductions -------------------------------------------

AGG_REDUCE_SQL = """
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       MAX(l_extendedprice) AS max_price
FROM lineitem
"""


@register("agg_reduce", AGG_REDUCE_SQL)
def agg_reduce(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    # Declarative twin of reference Agg.on (RDD reduce): partial agg, one row.
    return li.agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


AGG_BY_KEY_SQL = """
SELECT l_suppkey, MIN(l_quantity) AS l_quantity
FROM lineitem GROUP BY l_suppkey
"""


@register("agg_by_key", AGG_BY_KEY_SQL)
def agg_by_key(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return Agg.by_key(li, "l_suppkey", "l_quantity", "min").get


SELECT_RENAME_SQL = """
SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
FROM customer
"""


@register("select_rename", SELECT_RENAME_SQL)
def select_rename(spark, sf_dir):
    c = load(spark, sf_dir, "customer")["customer"]
    out = Transform.select(c, ["c_custkey", "c_name", "c_mktsegment"]).get
    return Transform.rename(
        out, {"c_custkey": "id", "c_name": "name", "c_mktsegment": "segment"}
    ).get


TEXT_TRIM_SQL = """
SELECT doc_id, TRIM(text) AS text
FROM documents
"""


@register("text_trim", TEXT_TRIM_SQL)
def text_trim_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return text_trim(d, "text").get.select("doc_id", "text")


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
FROM events
"""


@register("events_json_extract", JSON_EXTRACT_SQL)
def events_json_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
