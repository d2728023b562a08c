"""Seventh query wave (r07): three surfaces the registry didn't cover
yet — bounded window FRAMES (moving aggregates; every prior window
query used unbounded/running frames), market-basket co-occurrence
lift (the pair-affinity analysis that, over token/document baskets, is
also a curation primitive), and multi-metric quantile scoring (RFM)
over the DISTRIBUTED ranking machinery (three exact NTILEs without a
single-partition window — the plan-health gate forbids the naive
``Window.orderBy`` formulation outright).

Cross-engine exactness discipline (same as every wave): money sums in
DECIMAL (order-free) surfaced as DOUBLE, averages/ratios derived by
ONE IEEE division of identical inputs in both engines, every ordering
made total with a unique tie-break column.

Reference parity: composes the reference's Group/Window surfaces
(physical/Op.scala:30-150); the lift/RFM shapes are part of the
brief's analytics-completeness surface, not reference ports.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# Per-customer 3-order moving aggregate: the bounded-frame window
# (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). Partitioned by customer
# — high-cardinality, so the window parallelizes (no single sort
# partition); frame order (o_orderdate, o_orderkey) is total because
# o_orderkey is unique. The moving SUM is decimal (exact, association-
# free — a double sliding sum could differ between engines' add/
# retract orders in the last ulp); the moving average is derived by
# one double division sum/n, identical IEEE op both sides.
# --------------------------------------------------------------------------

MOVING_AVG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
         AS mv_sum,
       COUNT(*) OVER w AS mv_n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / (COUNT(*) OVER w) AS mv_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


@register("customer_order_moving_avg", MOVING_AVG_SQL)
def customer_order_moving_avg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    mv_sum = F.sum(_dec("o_totalprice")).over(w)
    mv_n = F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        mv_sum.cast("double").alias("mv_sum"),
        mv_n.alias("mv_n"),
        (mv_sum.cast("double") / mv_n).alias("mv_avg"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# Market-basket co-occurrence lift over (order, part) baskets:
# lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab · n_baskets / (n_a · n_b).
# The pair fan-out is the classic quadratic-per-basket explosion,
# bounded by the ``max_basket`` guard (TPC-H orders hold <= 7 lines so
# the default never trips; power-law corpora baskets fail LOUDLY at
# execution — or are excluded with ``on_oversize="drop"`` — before the
# self-join can blow up, the same discipline as the dedup family's
# candidate bounds). Shapes: ONE lineitem scan (the (order, part)
# distinct is localCheckpointed and feeds marginals, basket sizes, and
# both self-join sides), n_baskets folded in as a broadcast 1-row
# aggregate (no separate driver action), one equi-self-join on the
# basket key (shuffle bounded by sum-of-squares of basket sizes, NOT
# all-pairs of parts), part marginals AQE-broadcast back onto the pair
# counts. All lift arithmetic: exact long products, ONE double
# division. n_ab >= 2 keeps the report to repeated co-occurrences (and
# bounds the output); ordering is total via the part-key pair.
# --------------------------------------------------------------------------

PART_AFFINITY_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), tot AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM op
), marg AS (
  SELECT l_partkey, COUNT(*) AS n FROM op GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.part_a, p.part_b, p.n_ab,
       ma.n AS n_a, mb.n AS n_b,
       CAST(p.n_ab * t.n_baskets AS DOUBLE) / CAST(ma.n * mb.n AS DOUBLE)
         AS lift
FROM pairs p
JOIN marg ma ON ma.l_partkey = p.part_a
JOIN marg mb ON mb.l_partkey = p.part_b
CROSS JOIN tot t
WHERE p.n_ab >= 2
ORDER BY p.part_a, p.part_b
"""


@register("part_affinity_lift", PART_AFFINITY_SQL)
def part_affinity_lift(spark, sf_dir, max_basket=64, on_oversize="error"):
    """``max_basket`` bounds the per-basket pair fan-out: with
    ``on_oversize="error"`` (default) an oversize basket raises inside
    the plan via ``raise_error`` — loud, and free of any extra driver
    action; ``"drop"`` excludes oversize baskets from pairs, marginals
    AND n_baskets (so lift stays internally consistent) at the cost of
    one extra join on the basket key."""
    if on_oversize not in ("error", "drop"):
        raise ValueError(
            f"on_oversize must be 'error' or 'drop', got {on_oversize!r}"
        )
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    # ONE scan: the checkpointed distinct feeds sizes, marginals and
    # both self-join sides (in-plan exchange reuse is not guaranteed
    # across aliased branches, so without this the fact table would be
    # scanned+distinct'd up to 4x). Executor-local blocks, bounded by
    # |distinct (order, part)|, released with the frame.
    op = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=True
    )
    sizes = op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__bsz"))
    if on_oversize == "drop":
        sizes = sizes.where(F.col("__bsz") <= max_basket)
        # restrict the basket universe; broadcast-sized only when the
        # survivor list is small, so let AQE pick the strategy.
        op = op.join(sizes.select("l_orderkey"), "l_orderkey")
        checked_sz = F.col("__bsz")
    else:
        # declarative tripwire: F.count("__bsz") below must evaluate the
        # column (null check), so the raise_error cannot be pruned away.
        checked_sz = F.when(
            F.col("__bsz") > max_basket,
            F.raise_error(
                F.concat(
                    F.lit(
                        "part_affinity_lift: basket l_orderkey="
                    ),
                    F.col("l_orderkey").cast("string"),
                    F.lit(
                        f" holds more than max_basket={max_basket} distinct"
                        " parts; raise max_basket or pass"
                        " on_oversize='drop' to exclude power-law baskets"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("__bsz"))
    # n_baskets as a broadcast 1-row aggregate (key_skew_report
    # pattern) — no separate .count() action, and counting the CHECKED
    # size column forces the oversize tripwire to run.
    tot = sizes.select(checked_sz.alias("__bsz")).agg(
        F.count("__bsz").alias("n_baskets")
    )
    marg = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = op.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "k")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    out = (
        pairs.join(
            marg.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")),
            "part_a",
        )
        .join(
            marg.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
    return out.orderBy("part_a", "part_b")


# --------------------------------------------------------------------------
# RFM quartile scoring: NTILE(4) per metric (recency = last order
# date, frequency = order count, monetary = exact decimal spend) over
# customers. A plain NTILE(4) OVER (ORDER BY metric) is the
# no-partition-window trap (one sort partition for every customer on
# the cluster); each score instead rides global_row_number (boundary-
# literal buckets + partitioned windows) + the exact integer
# ntile_from_rn — the distributed formulation whose output is pinned
# bit-identical to the SQL window function. Tie-breaks on c_custkey
# make every ordering total, so the scores are engine-reproducible.
# --------------------------------------------------------------------------

RFM_SQL = """
WITH m AS (
  SELECT o_custkey AS c_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), s AS (
  SELECT c_custkey, n_orders, spend,
         NTILE(4) OVER (ORDER BY last_order, c_custkey) AS r_score,
         NTILE(4) OVER (ORDER BY n_orders, c_custkey) AS f_score,
         NTILE(4) OVER (ORDER BY spend, c_custkey) AS m_score
  FROM m
)
SELECT c_custkey, n_orders, spend, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm
FROM s ORDER BY c_custkey
"""


@register("customer_rfm_scores", RFM_SQL)
def customer_rfm_scores(spark, sf_dir):
    from thundercats_spark.operators.ranking import (
        global_row_number_multi,
        ntile_from_rn,
    )

    o = load(spark, sf_dir, "orders")["orders"]
    m = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("spend"),
    )
    # r11: the three metrics ride ONE fused machinery invocation (one
    # count, one shared sample, one map-side bucket-count agg, three
    # rank windows in one plan) instead of three chained
    # global_row_number calls with 3x internal driver jobs and a
    # re-persist of each intermediate. The metric frame still feeds
    # several internal passes: localCheckpoint keeps the orders
    # aggregation at one execution. Blocks are executor-local, bounded
    # by |customers|, released with the frame.
    m = m.localCheckpoint(eager=True)
    rn = global_row_number_multi(
        m,
        [
            (["last_order", "c_custkey"], "__rn_r"),
            (["n_orders", "c_custkey"], "__rn_f"),
            (["spend", "c_custkey"], "__rn_m"),
        ],
        total_col="__n",
    )
    scored = (
        rn.withColumn(
            "r_score", ntile_from_rn(F.col("__rn_r"), F.col("__n"), 4)
        )
        .withColumn(
            "f_score", ntile_from_rn(F.col("__rn_f"), F.col("__n"), 4)
        )
        .withColumn(
            "m_score", ntile_from_rn(F.col("__rn_m"), F.col("__n"), 4)
        )
        .drop("__rn_r", "__rn_f", "__rn_m", "__n")
    )
    return scored.select(
        "c_custkey",
        "n_orders",
        "spend",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("rfm"),
    ).orderBy("c_custkey")
