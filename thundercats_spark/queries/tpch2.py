"""Fourth query wave: the remaining TPC-H shapes adaptable to the
driver's reduced schema (no partsupp, no receipt/commit dates, no
phone/container columns — predicates re-targeted to existing columns,
query SHAPE preserved).

Q8  market share        — two-level dimension join + conditional share
Q11 important parts     — pre-agg + scalar-subquery threshold
Q13 order distribution  — left join + double groupBy (histogram of counts)
Q16 supplier variety    — anti join + COUNT(DISTINCT) multi-key group
Q17 small-qty revenue   — correlated per-group average threshold
Q19 disjunctive preds   — OR-of-conjunctions pushdown over a join
Q20 volume suppliers    — semi-join chain over a HAVING pre-agg
Q21 waiting suppliers   — EXISTS / NOT EXISTS double correlation
Q22 idle customers      — scalar avg subquery + anti join + group

Exactness discipline per tpch.py: money sums accumulate in DECIMAL and
surface as DOUBLE on both engines; averages are exact-decimal-sum /
count; counts surface as BIGINT; dates compare as native timestamps in
predicates and never appear in output unformatted.

Scale posture (100 TB): region/nation always broadcast; filtered part /
supplier subsets broadcast (selective predicates keep them small
relative to lineitem); fact-fact joins shuffle on their keys with AQE
handling skew; every pre-agg is partial-aggregatable (no collect_list).
Reference parity: these reuse only Join/Group/Filter primitives from
physical/Op.scala (Op.scala:30-150) — the shapes themselves exercise
the composition surface.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec, _sum_exact

# --------------------------------------------------------------------------
# Q8 — national market share: share of NATION_7 in ASIA's PROMO import
# volume, by order year. Two-sided dimension closure (customer region,
# supplier nation) around the lineitem-orders fact join.
# --------------------------------------------------------------------------

Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS total_volume,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
              AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey  = l_partkey
JOIN customer ON c_custkey  = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", Q8_SQL)
def q8_market_share(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "orders", "part", "customer",
             "supplier", "nation", "region")
    # Customer-side dimension closure: nations restricted to ASIA, joined
    # down to customers. All broadcastable (region/nation are fixed-size;
    # customer is pruned to 2 key columns).
    asia_nations = (
        t["nation"].alias("n1")
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n1.n_nationkey").alias("cn_key"))
    )
    cust = (
        t["customer"].select("c_custkey", "c_nationkey")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        t["supplier"].select("s_suppkey", "s_nationkey")
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    promo = t["part"].where(F.col("p_type") == "PROMO").select("p_partkey")
    ords = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))

    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    joined = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        joined.groupBy("o_year")
        .agg(
            _sum_exact(nation_vol).alias("nation_volume"),
            _sum_exact(vol).alias("total_volume"),
            (F.sum(nation_vol).cast("double") / F.sum(vol).cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q11 — important parts: parts whose lineitem revenue exceeds a fraction
# of TOTAL revenue (partsupp-free adaptation; keeps the scalar-subquery-
# over-the-same-pre-agg shape). The pre-agg is computed once and reused
# for both the per-part values and the global threshold.
# --------------------------------------------------------------------------

Q11_SQL = """
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.0006 FROM pv)
ORDER BY part_value DESC, l_partkey
"""


@register("q11_important_parts", Q11_SQL)
def q11_important_parts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    pv = (
        li.select("l_partkey", "l_extendedprice", "l_discount")
        .groupBy("l_partkey")
        .agg(F.sum(vol).alias("val"))
    )
    # One shuffle for the pre-agg; the global threshold is a tiny second
    # agg over the pre-agg, broadcast back as a 1-row cross join.
    total = pv.agg((F.sum("val").cast("double") * F.lit(0.0006)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT JOIN keeps zero-order
# customers, then a histogram of per-customer counts. COUNT(o_orderkey)
# (not *) so null-matches count as 0.
# --------------------------------------------------------------------------

Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", Q13_SQL)
def q13_order_distribution(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"].select("c_custkey")
        .join(
            t["orders"].where(F.col("o_orderpriority") != "1-URGENT")
            .select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q16 — supplier variety per part class: distinct suppliers that shipped
# each (brand, type, size) combo, excluding flagged suppliers (NOT IN →
# broadcast anti join). partsupp-free: the supplier-part relation is
# derived from lineitem.
# --------------------------------------------------------------------------

Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type  <> 'LARGE'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_variety", Q16_SQL)
def q16_supplier_variety(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "part", "supplier")
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "LARGE")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = t["supplier"].where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    li = (
        t["lineitem"].select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        li.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: lineitems below 20% of their
# part's average quantity. The correlated scalar subquery becomes a
# per-part pre-agg joined back. Average is exact (decimal sum / count)
# so the threshold compare is bit-identical across engines.
# --------------------------------------------------------------------------

Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("q17_small_quantity", Q17_SQL)
def q17_small_quantity(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "part")
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#5").select("p_partkey")
    # Restrict lineitem to the brand's parts FIRST (broadcast semi join) —
    # the per-part average over that subset equals the full-table
    # correlated average because the correlation key IS the part key.
    li = (
        t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))))
        .alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue: OR-of-conjunctions across the
# join boundary. Expressed as one filter AFTER the join so Catalyst can
# still push the common `p_brand IN (...)` / quantity-range residuals
# into both scans.
# --------------------------------------------------------------------------

Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
       AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", Q19_SQL)
def q19_disjunctive_revenue(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "part")
    part = t["part"].select("p_partkey", "p_brand", "p_size")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(clause)
        .agg(_sum_exact(vol).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q20 — heavy-volume suppliers in a nation: semi-join chain supplier →
# (supplier, part) shipments exceeding a quantity threshold in a year,
# over widget-family parts. HAVING pre-agg feeds an IN (→ semi join).
# --------------------------------------------------------------------------

Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 45
  )
ORDER BY s_suppkey
"""


@register("q20_volume_suppliers", Q20_SQL)
def q20_volume_suppliers(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    widgets = t["part"].where(F.col("p_name").like("%widget")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(F.broadcast(widgets), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 45)
        .select("l_suppkey")
        .distinct()
    )
    nat = t["nation"].where(F.col("n_name") == "NATION_3").select("n_nationkey")
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (receipt-date-free adaptation:
# "late" = shipped > 90 days after the order date). Keeps the EXISTS /
# NOT EXISTS double correlation: multi-supplier finished orders where
# exactly ONE supplier was late. numwait counts late lineitems, per the
# TPC-H per-l1-row semantics.
# --------------------------------------------------------------------------

Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_suppliers", Q21_SQL)
def q21_waiting_suppliers(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    ords = t["orders"].where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).cast("int"),
        )
    )
    # Collapse to (order, supplier) grain, then resolve both correlated
    # EXISTS checks with ONE window over the order key — no self-joins,
    # one shuffle (reused by groupBy-free window aggregation).
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").alias("late_cnt")
    )
    w = Window.partitionBy("l_orderkey")
    resolved = per_os.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "n_late_supp", F.sum((F.col("late_cnt") > 0).cast("int")).over(w)
    )
    waiting = resolved.where(
        (F.col("late_cnt") > 0) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_cnt").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# --------------------------------------------------------------------------
# Q22 — idle high-balance customers (phone-prefix-free adaptation:
# nation-key subset): customers in selected nations with above-average
# positive balance and no RECENT orders. Scalar avg subquery + anti
# join + group, per the original shape.
# --------------------------------------------------------------------------

Q22_SQL = """
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9)
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("q22_idle_customers", Q22_SQL)
def q22_idle_customers(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    pool = t["customer"].where(F.col("c_nationkey").isin(1, 3, 5, 7, 9)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = pool.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].where(
                F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _sum_exact(_dec("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
