"""Second wave of analytic queries (SURVEY.md §2.2 extension): more
TPC-H shapes (Q4/Q6/Q12/Q14/Q18 adaptations) plus the analytic-pattern
coverage a full engine needs — semi/anti joins, rollup hierarchies,
running windows, explode/word-count, statistical aggregates, string
distance. Same exactness discipline as tpch.py (decimal sums → double,
string dates, round(6) for genuinely floating measures)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.physical.ops import Join
from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _avg_exact, _day_str, _dec, _sum_exact

# --------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan+filter+agg; pushdown showcase)
# --------------------------------------------------------------------------

Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", Q6_SQL)
def q6_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_sum_exact(_dec("l_extendedprice") * _dec("l_discount")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q4 adaptation — order priority count with EXISTS (left-semi join)
# --------------------------------------------------------------------------

Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_priority_semi", Q4_SQL)
def q4_priority_semi(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "lineitem")
    ords = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    big = t["lineitem"].where(F.col("l_quantity") > 48).select("l_orderkey")
    semi = Join.semi(ords, big, F.col("o_orderkey") == F.col("l_orderkey")).get
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Anti join — customers with no orders in a window
# --------------------------------------------------------------------------

ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
)
"""


@register("customers_no_recent_orders", ANTI_SQL)
def customers_no_recent_orders(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    anti = Join.anti(t["customer"], recent, F.col("c_custkey") == F.col("o_custkey")).get
    return anti.select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Q14 adaptation — promo revenue share (conditional agg over a join)
# --------------------------------------------------------------------------

Q14_SQL = """
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""


@register("q14_promo_share", Q14_SQL)
def q14_promo_share(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = t["part"].select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _sum_exact(promo).alias("promo_revenue"),
            _sum_exact(rev).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q18 adaptation — large-volume orders (HAVING + broadcast top-k)
# --------------------------------------------------------------------------

Q18_SQL = """
SELECT c_name, o_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, o_orderkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


@register("q18_large_orders", Q18_SQL)
def q18_large_orders(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    # aggregate lineitem FIRST (biggest table shrinks before any join)
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .where(F.col("qty_dec") > 150)
    )
    ords = t["orders"].select("o_orderkey", "o_custkey")
    cust = t["customer"].select("c_custkey", "c_name")
    return (
        per_order.join(ords, per_order.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", F.col("qty_dec").cast("double").alias("total_qty")
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# ROLLUP hierarchy — day × event_type with subtotals
# --------------------------------------------------------------------------

ROLLUP_SQL = """
SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP(day, event_type)
ORDER BY day NULLS FIRST, event_type NULLS FIRST
"""


@register("events_rollup_hierarchy", ROLLUP_SQL)
def events_rollup_hierarchy(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return (
        ev.select(
            _day_str(F.date_trunc("day", "ts")).alias("day"),
            "event_type",
            F.col("value"),
        )
        .rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _sum_exact(_dec("value")).alias("total_value"),
        )
        .orderBy(F.asc_nulls_first("day"), F.asc_nulls_first("event_type"))
    )


# --------------------------------------------------------------------------
# Running window — cumulative customer spend over time
# --------------------------------------------------------------------------

RUNNING_SQL = """
SELECT o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
FROM orders
ORDER BY o_custkey, o_date, o_orderkey
"""


@register("customer_running_total", RUNNING_SQL)
def customer_running_total(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        _day_str("o_orderdate").alias("o_date"),
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("cum_spend"),
    ).orderBy("o_custkey", "o_date", "o_orderkey")


# --------------------------------------------------------------------------
# Explode / word frequencies over documents
# --------------------------------------------------------------------------

WORDFREQ_SQL = r"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(TRIM(text), '\s+')) AS word
      FROM documents WHERE TRIM(text) <> '')
GROUP BY word
ORDER BY n DESC, word
LIMIT 30
"""


@register("doc_word_frequencies", WORDFREQ_SQL)
def doc_word_frequencies(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(30)
    )


# --------------------------------------------------------------------------
# Statistical aggregates — stddev + interpolated median per segment.
# r06: the median rides the distributed ranking path
# (exact_percentiles_grouped) instead of the percentile() aggregate
# that buffers each segment's full value set in one reducer; stddev
# stays the algebraic aggregate it always was.
# --------------------------------------------------------------------------

STATS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       ROUND(stddev_samp(c_acctbal), 6) AS sd_bal,
       ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 6) AS median_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("customer_balance_stats", STATS_SQL)
def customer_balance_stats(spark, sf_dir):
    from thundercats_spark.operators.ranking import exact_percentiles_grouped

    c = load(spark, sf_dir, "customer")["customer"]
    stats = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("c_acctbal"), 6).alias("sd_bal"),
    )
    med = exact_percentiles_grouped(
        c, ["c_mktsegment"], "c_acctbal", [0.5]
    ).select(
        "c_mktsegment", F.round("value", 6).alias("median_bal")
    )
    # LEFT join: an all-NULL-balance segment keeps its row (NULL
    # median), matching the GROUP BY oracle
    return (
        stats.join(F.broadcast(med), "c_mktsegment", "left")
        .select("c_mktsegment", "n", "sd_bal", "median_bal")
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# String distance — levenshtein against a probe name (exact int)
# --------------------------------------------------------------------------

LEV_SQL = """
SELECT s_suppkey, s_name, levenshtein(s_name, 'Supplier#1') AS dist
FROM supplier
ORDER BY dist, s_suppkey
"""


@register("supplier_name_distance", LEV_SQL)
def supplier_name_distance(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")["supplier"]
    return s.select(
        "s_suppkey", "s_name", F.levenshtein(F.col("s_name"), F.lit("Supplier#1")).alias("dist")
    ).orderBy("dist", "s_suppkey")


# --------------------------------------------------------------------------
# Q12 adaptation — priority classes per return flag over a date window
# --------------------------------------------------------------------------

Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q12_priority_classes", Q12_SQL)
def q12_priority_classes(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    ords = t["orders"].select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Time-series resample + forward fill (operators/resample.py)
# --------------------------------------------------------------------------

RESAMPLE_SQL = """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS gts FROM bounds
), unioned AS (
  SELECT user_id, ts AS u_ts, value AS v, 0 AS is_grid FROM events
  UNION ALL
  SELECT user_id, gts, NULL, 1 FROM grid
), filled AS (
  SELECT user_id, u_ts, is_grid,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY u_ts, is_grid
           ROWS UNBOUNDED PRECEDING) AS value
  FROM unioned
)
SELECT user_id, strftime(u_ts, '%Y-%m-%d %H:%M:%S') AS grid_ts, value
FROM filled WHERE is_grid = 1
ORDER BY user_id, grid_ts
"""


@register("events_resample_ffill", RESAMPLE_SQL)
def events_resample_ffill(spark, sf_dir):
    from thundercats_spark.operators.resample import resample_ffill

    ev = load(spark, sf_dir, "events")["events"]
    out = resample_ffill(ev, "user_id", "ts", "value", step="1 hour", align="hour")
    return out.select(
        "user_id",
        F.date_format("grid_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        "value",
    ).orderBy("user_id", "grid_ts")


# --------------------------------------------------------------------------
# Q15 adaptation — top supplier(s) by revenue in a window (CTE + max)
# --------------------------------------------------------------------------

Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", Q15_SQL)
def q15_top_supplier(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _sum_exact(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    # argmax via scalar max + filter over the briefly-persisted
    # aggregate (rank over a no-partition window would put the whole
    # per-supplier table on one sort partition). The winners — the
    # max-revenue tie set, a handful of rows — are collected and
    # re-lifted as a literal frame so the cache can be RELEASED before
    # return (no per-invocation cache leak) and the broadcast join
    # needs no lineitem rescan. Ties all survive, as in the
    # correlated-subquery spec.
    rev = rev.persist()
    try:
        m = rev.agg(F.max("total_revenue").alias("m")).first()["m"]
        top_rows = rev.where(F.col("total_revenue") == m).collect()
    finally:
        rev.unpersist()
    top = spark.createDataFrame(top_rows, rev.schema)
    return (
        t["supplier"]
        .join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q2 shape — per-part argmin: the cheapest supplier of each part
# --------------------------------------------------------------------------

Q2_SQL = """
SELECT l_partkey, l_suppkey, min_avg_price FROM (
  SELECT l_partkey, l_suppkey,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS min_avg_price,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), l_suppkey
         ) AS rn
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
) WHERE rn = 1
ORDER BY l_partkey
"""


@register("q2_cheapest_supplier", Q2_SQL)
def q2_cheapest_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(_avg_exact("l_extendedprice"), 6).alias("min_avg_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("min_avg_price", "l_suppkey")
    return (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "min_avg_price")
        .orderBy("l_partkey")
    )


# --------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT over yearly active customers
# --------------------------------------------------------------------------

SETOPS_SQL = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
     y97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT 'retained' AS cohort, o_custkey FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT 'churned' AS cohort, o_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
"""


@register("customer_cohorts_setops", SETOPS_SQL)
def customer_cohorts_setops(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]

    def active(y0, y1):
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = active(1996, 1997), active(1997, 1998)
    retained = y96.intersect(y97).select(F.lit("retained").alias("cohort"), "o_custkey")
    churned = y96.exceptAll(y97).select(F.lit("churned").alias("cohort"), "o_custkey")
    return retained.unionByName(churned)


# --------------------------------------------------------------------------
# Correlated scalar subquery through the SQL surface (spark.sql) —
# orders priced above their customer segment's average
# --------------------------------------------------------------------------

CORRELATED_SQL = """
WITH seg_avg AS (
  SELECT c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS seg_mean
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT o_orderkey, c_mktsegment
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN seg_avg USING (c_mktsegment)
WHERE o_totalprice > 2 * seg_mean
ORDER BY o_orderkey
"""


@register("orders_above_segment_avg", CORRELATED_SQL)
def orders_above_segment_avg(spark, sf_dir):
    # exercise the engine's raw-SQL surface: register views, run SQL —
    # Catalyst plans the same broadcast + single-shuffle shape.
    t = load(spark, sf_dir, "orders", "customer")
    t["orders"].createOrReplaceTempView("v_orders")
    t["customer"].createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH seg_avg AS (
          SELECT c_mktsegment,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS seg_mean
          FROM v_orders JOIN v_customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
        )
        SELECT o_orderkey, c_mktsegment
        FROM v_orders
        JOIN v_customer ON o_custkey = c_custkey
        JOIN seg_avg USING (c_mktsegment)
        WHERE o_totalprice > 2 * seg_mean
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Q7 adaptation — shipping volume between nation pairs by year
# --------------------------------------------------------------------------

Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume", Q7_SQL)
def q7_nation_volume(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "orders", "supplier", "customer", "nation")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sup = t["supplier"].join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")).select(
        "s_suppkey", "supp_nation"
    )
    cust = t["customer"].join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")).select(
        "c_custkey", "cust_nation"
    )
    ords = t["orders"].select("o_orderkey", "o_custkey")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_sum_exact(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q9 adaptation — profit by part-type and nation per year
# --------------------------------------------------------------------------

Q9_SQL = """
SELECT n_name, year(o_orderdate) AS o_year, p_type,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, o_year, p_type
ORDER BY n_name, o_year DESC, p_type
"""


@register("q9_product_profit", Q9_SQL)
def q9_product_profit(spark, sf_dir):
    t = load(spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation")
    li = t["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    ords = t["orders"].select("o_orderkey", "o_orderdate")
    part = t["part"].select("p_partkey", "p_type")
    sup = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"), "p_type")
        .agg(_sum_exact(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("profit"))
        .orderBy(F.asc("n_name"), F.desc("o_year"), F.asc("p_type"))
    )
