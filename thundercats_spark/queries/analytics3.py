"""Sixth query wave: driver-verifying the scale infrastructure that
was previously pytest-only — the skew-salting operators (salted_agg /
salted_join must return EXACTLY what the plain formulations return;
the oracle here is the plain SQL) and a descending grouped top-k over
the distributed ranking operator. Same cross-engine exactness
discipline as the rest of the registry (decimal money sums surfaced as
double, unique tie-broken rankings).

Reference parity: the salted paths compose the reference's Group/Join
semantics (physical/Op.scala:30-150) under an explicit skew-safe
physical strategy; ranking extends the window surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec, _sum_exact

# --------------------------------------------------------------------------
# Salted two-stage aggregation over a deliberately hot key:
# o_orderstatus has ~3 values, so a naive groupBy lands each status on
# one reduce task. salted_agg partial-aggregates on (status, salt) —
# spreading every status over 16 tasks — then merges; only algebraic
# aggregates compose, which is exactly what the oracle checks: the
# result must be IDENTICAL to the plain GROUP BY. Decimal sums are
# order-independent, so the two-stage reassociation is exact.
# --------------------------------------------------------------------------

SALTED_AGG_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("orders_salted_agg", SALTED_AGG_SQL)
def orders_salted_agg(spark, sf_dir):
    from thundercats_spark.operators.skew import salted_agg

    o = load(spark, sf_dir, "orders")["orders"]
    out = salted_agg(
        o.select("o_orderstatus", _dec("o_totalprice").alias("price")),
        ["o_orderstatus"],
        sum_cols=["price"],
        buckets=16,
    )
    return out.select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        F.col("sum_price").cast("double").alias("total_price"),
    ).orderBy("o_orderstatus")


# --------------------------------------------------------------------------
# Salted equi-join: lineitem (big, salted deterministically) x supplier
# (small, replicated once per salt bucket) on the supplier key — the
# explicit fallback for the power-law key AQE's skew split can't fix.
# The oracle is the plain join: salting must not change a single row.
# Scale: supplier is replicated 8x (dim-sized), lineitem shuffles once
# on (key, salt); revenue is the exact-decimal idiom, aggregated AFTER
# the join so the salt never touches the money math.
# --------------------------------------------------------------------------

SALTED_JOIN_SQL = """
SELECT s_nationkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


@register("lineitem_salted_join", SALTED_JOIN_SQL)
def lineitem_salted_join(spark, sf_dir):
    from thundercats_spark.operators.skew import salted_join

    t = load(spark, sf_dir, "lineitem", "supplier")
    li = t["lineitem"].select(
        "l_suppkey",
        (_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("rev"),
    )
    sup = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, ["l_suppkey"], buckets=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _sum_exact(F.col("rev")).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


# --------------------------------------------------------------------------
# Top-3 orders per market segment by price DESC — the descending
# consumer of grouped_row_number: the operator numbers ascending by
# (price, orderkey), and with the group total the exact descending
# row_number is __n - rn + 1 (equivalent to ORDER BY price DESC,
# orderkey DESC — a total order, so it is engine-stable). 5 segments =
# the low-cardinality-group window trap grouped_row_number exists for;
# no single-segment sort partition appears in the plan.
# --------------------------------------------------------------------------

TOP_PER_SEGMENT_SQL = """
SELECT c_mktsegment, rnk, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS price
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY o_totalprice DESC, o_orderkey DESC
         ) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


@register("orders_top_per_segment", TOP_PER_SEGMENT_SQL)
def orders_top_per_segment(spark, sf_dir):
    from thundercats_spark.operators.ranking import grouped_row_number

    t = load(spark, sf_dir, "orders", "customer")
    oc = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", "o_totalprice", "o_orderkey")
    numbered = grouped_row_number(
        oc, ["c_mktsegment"], ["o_totalprice", "o_orderkey"], total_col="__n"
    )
    return (
        numbered.withColumn("rnk", F.col("__n") - F.col("rn") + 1)
        .where(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            "rnk",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        .orderBy("c_mktsegment", "rnk")
    )


# --------------------------------------------------------------------------
# Skew diagnosis: the measurement that decides WHETHER to salt. Exact
# per-key counts (one map-side-combined groupBy — the wire carries
# (key, long) pairs, not rows), grand total via a broadcast cross-join
# of the 1-row re-aggregate, integer-exact suggested_salt =
# ceil(n * P / total) at a pinned P=32 so the oracle is
# session-independent. Top-20 cut is tie-broken by key, so it is
# deterministic even though order counts collide heavily.
# --------------------------------------------------------------------------

KEY_SKEW_SQL = """
WITH c AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
), t AS (
  SELECT SUM(n) AS total FROM c
)
SELECT o_custkey, n,
       ROUND(n * 1.0 / total, 6) AS share,
       CAST((n * 32 + total - 1) // total AS BIGINT) AS suggested_salt
FROM c, t
ORDER BY n DESC, o_custkey
LIMIT 20
"""


@register("orders_key_skew", KEY_SKEW_SQL)
def orders_key_skew(spark, sf_dir):
    from thundercats_spark.operators.skew import key_skew_report

    o = load(spark, sf_dir, "orders")["orders"]
    return key_skew_report(o, ["o_custkey"], n_partitions=32, top=20)


# --------------------------------------------------------------------------
# Distributed exact percentiles (operators/ranking.py
# exact_percentiles): percentile_cont semantics without buffering the
# whole column in one reducer (the cost of Spark's exact `percentile`
# aggregate, see orders_value_percentiles) — rank the values through
# the boundary-bucket machinery, fetch only the <=2|ps| boundary-rank
# rows, interpolate driver-side. round(6) absorbs last-ulp float
# divergence between the two engines' interpolation.
# --------------------------------------------------------------------------

EXACT_PCT_SQL = """
SELECT p, ROUND(v, 6) AS value FROM (
  SELECT 0.25 AS p, quantile_cont(o_totalprice, 0.25) AS v FROM orders
  UNION ALL SELECT 0.5,  quantile_cont(o_totalprice, 0.5)  FROM orders
  UNION ALL SELECT 0.9,  quantile_cont(o_totalprice, 0.9)  FROM orders
  UNION ALL SELECT 0.99, quantile_cont(o_totalprice, 0.99) FROM orders
) ORDER BY p
"""


@register("orders_percentiles_distributed", EXACT_PCT_SQL)
def orders_percentiles_distributed(spark, sf_dir):
    from thundercats_spark.operators.ranking import exact_percentiles

    o = load(spark, sf_dir, "orders")["orders"]
    out = exact_percentiles(o, "o_totalprice", [0.25, 0.5, 0.9, 0.99])
    return out.select("p", F.round("value", 6).alias("value")).orderBy("p")


# --------------------------------------------------------------------------
# Discrete percentiles through the same distributed machinery
# (mode="disc"): answers are ACTUAL order values — quantile_disc in
# the oracle. p=0.37 is deliberate: with |orders| divisible by 100 at
# every sf, n*p lands decimal-integral and IEEE-overshooting (the
# 25*0.28 class), so this query drives disc_rank's exact decimal
# arithmetic through the driver's hash gate, not just pytest.
# --------------------------------------------------------------------------

DISC_PCT_SQL = """
SELECT p, ROUND(v, 6) AS value FROM (
  SELECT 0.25 AS p, quantile_disc(o_totalprice, 0.25) AS v FROM orders
  UNION ALL SELECT 0.37, quantile_disc(o_totalprice, 0.37) FROM orders
  UNION ALL SELECT 0.5,  quantile_disc(o_totalprice, 0.5)  FROM orders
  UNION ALL SELECT 0.99, quantile_disc(o_totalprice, 0.99) FROM orders
) ORDER BY p
"""


@register("orders_percentiles_disc", DISC_PCT_SQL)
def orders_percentiles_disc(spark, sf_dir):
    from thundercats_spark.operators.ranking import exact_percentiles

    o = load(spark, sf_dir, "orders")["orders"]
    out = exact_percentiles(
        o, "o_totalprice", [0.25, 0.37, 0.5, 0.99], mode="disc"
    )
    return out.select("p", F.round("value", 6).alias("value")).orderBy("p")
