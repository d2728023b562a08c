"""Fifth query wave: analytic surface widening — corpus TF-IDF, event
range (interval) joins, CUBE grouping sets, PIVOT, ntile quantile
bucketing, and lag-window gap analysis. Every query keeps the
cross-engine exactness discipline (decimal money sums → double,
integer-µs time compares, ROUND(6) on genuinely-float scores,
tie-broken deterministic rankings).

Reference parity: these compose the same Group/Join/Window primitives
the reference exposes (physical/Op.scala:30-150); TF-IDF extends the
text-analysis family mandated for LLM-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.physical.util import epoch_us

from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec, _sum_exact

# --------------------------------------------------------------------------
# TF-IDF top terms per document. Tokenization = literal single-space
# split (the corpus is pre-normalized); tf and df are exact integers;
# the only float is ln(N/df), rounded to 6dp before ranking so the
# row_number tie-break (term asc) is engine-stable.
# Scale: two shuffles (doc-term tf, term df) + one broadcast of the
# term→df map back onto the tf relation; no cross join, no collect.
# --------------------------------------------------------------------------

TFIDF_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM words WHERE term <> '' GROUP BY doc_id, term
),
docfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN docfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
) t
WHERE rk <= 3
ORDER BY doc_id, tfidf DESC, term
"""


@register("doc_tfidf_top_terms", TFIDF_SQL)
def doc_tfidf_top_terms(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")["documents"]
    n_docs = docs.count()  # scalar; one job over footer-only row counts
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ", -1)).alias("term"))
        .where(F.col("term") != "")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


# --------------------------------------------------------------------------
# Event range join: for every click, purchases by the same user within
# the following 5 minutes. Equi-join on user_id with an integer-µs
# band predicate in the join condition (events are TIMESTAMP(NANOS);
# all compares in µs per the load() contract). LEFT join keeps
# zero-conversion clicks. Scale: shuffles only on user_id; the band
# filter runs inside the join; at extreme scale the same shape
# bucket-joins on (user_id, time_bucket).
# --------------------------------------------------------------------------

RANGE_JOIN_SQL = """
SELECT a.event_id,
       COUNT(b.t1) AS n_purchases,
       CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(12,2))), CAST(0 AS DECIMAL(12,2))) AS DOUBLE)
         AS purchase_value
FROM (SELECT event_id, user_id, epoch_us(ts) AS t0 FROM events WHERE event_type = 'click') a
LEFT JOIN (SELECT user_id, epoch_us(ts) AS t1, value FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND b.t1 >= a.t0 AND b.t1 < a.t0 + 300000000
GROUP BY a.event_id
ORDER BY a.event_id
"""


@register("events_range_join", RANGE_JOIN_SQL)
def events_range_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", epoch_us("ts").alias("t0")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), epoch_us("ts").alias("t1"), "value"
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("t1") >= F.col("t0"))
        & (F.col("t1") < F.col("t0") + 300_000_000),
        "left",
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.count("t1").alias("n_purchases"),
            F.coalesce(F.sum(_dec("value")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# CUBE over (status, priority): all four grouping sets in one pass.
# GROUPING() flags disambiguate "real NULL" from "subtotal"; keys are
# coalesced to 'ALL' so the output is null-free and sortable.
# --------------------------------------------------------------------------

CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) AS INTEGER)   AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, status, priority
"""


@register("orders_cube_summary", CUBE_SQL)
def orders_cube_summary(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            _sum_exact(_dec("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
        .orderBy("g_status", "g_priority", "status", "priority")
    )


# --------------------------------------------------------------------------
# PIVOT: order revenue by year × priority, priorities widened to
# columns. Spark's pivot with an explicit value list (no extra
# distinct-values job — required at scale); oracle mirrors with
# conditional aggregation.
# --------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

PIVOT_SQL = """
SELECT year(o_orderdate) AS o_year,
""" + ",\n".join(
    f"""       CAST(SUM(CASE WHEN o_orderpriority = '{p}'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "{p}" """
    for p in _PRIORITIES
) + """
FROM orders
GROUP BY o_year
ORDER BY o_year
"""


@register("orders_pivot_by_priority", PIVOT_SQL)
def orders_pivot_by_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            "o_orderpriority",
            _dec("o_totalprice").alias("price"),
        )
        .groupBy("o_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum("price").cast("double"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# ntile quartiles: account-balance quartile profile per market segment.
# The ntile ORDER BY carries the primary key so bucket edges are
# deterministic under ties.
# --------------------------------------------------------------------------

QUARTILE_SQL = """
SELECT c_mktsegment, quartile,
       COUNT(*) AS n_customers,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM (
  SELECT c_mktsegment, c_acctbal,
         NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
) t
GROUP BY c_mktsegment, quartile
ORDER BY c_mktsegment, quartile
"""


@register("customer_balance_quartiles", QUARTILE_SQL)
def customer_balance_quartiles(spark, sf_dir):
    # NTILE over 5 segments = 5 sort partitions, each O(customers/5) —
    # the low-cardinality-group window trap. grouped_row_number splits
    # every segment across ordered buckets (distributed sort), and the
    # exact NTILE bucket derives from (rn, group size) as a plain
    # expression. Identical output to the window formulation (oracle-
    # and pytest-pinned).
    from thundercats_spark.operators.ranking import (
        grouped_row_number,
        ntile_from_rn,
    )

    c = load(spark, sf_dir, "customer")["customer"]
    numbered = grouped_row_number(
        c.select("c_mktsegment", "c_acctbal", "c_custkey"),
        ["c_mktsegment"],
        ["c_acctbal", "c_custkey"],
        total_col="__n",
    )
    return (
        numbered.withColumn(
            "quartile", ntile_from_rn(F.col("rn"), F.col("__n"), 4)
        )
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            _sum_exact(_dec("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


# --------------------------------------------------------------------------
# Order cadence: per-customer gaps between consecutive orders via a lag
# window (deterministic order: date then key), aggregated to integer
# day statistics. The avg surfaces as exact-sum/count.
# --------------------------------------------------------------------------

GAPS_SQL = """
SELECT o_custkey,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
       CAST(SUM(gap_days) AS DOUBLE) / COUNT(*) AS avg_gap_days
FROM (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
) t
WHERE gap_days IS NOT NULL
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register("customer_order_gaps", GAPS_SQL)
def customer_order_gaps(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn(
            "gap_days", F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        )
        .where(F.col("gap_days").isNotNull())
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_days").cast("bigint").alias("total_gap_days"),
            F.max("gap_days").cast("bigint").alias("max_gap_days"),
            (F.sum("gap_days").cast("double") / F.count(F.lit(1))).alias("avg_gap_days"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Funnel conversion: users progressing view → click → purchase in strict
# time order (first-touch per stage). Three min-aggs chained by
# time-threshold joins — each stage shuffles once on user_id, then the
# three counts meet in 1-row cross joins. All compares in integer µs.
# --------------------------------------------------------------------------

FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
"""


@register("events_funnel_conversion", FUNNEL_SQL)
def events_funnel_conversion(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    t = epoch_us("ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(t).alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", t.alias("tc"))
        .join(v, "user_id")
        .where(F.col("tc") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("tc").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", t.alias("tp"))
        .join(c, "user_id")
        .where(F.col("tp") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("t_buy"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )


# --------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen week, activity counted
# per week offset. Weeks via date_trunc (Monday-aligned in both
# engines); offsets are exact day-diffs / 7 between week starts.
# --------------------------------------------------------------------------

RETENTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS w0 FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
)
SELECT strftime(f.w0, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.w0, a.w) / 7 AS BIGINT) AS week_offset,
       COUNT(*) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("events_retention_cohorts", RETENTION_SQL)
def events_retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    wk = F.date_trunc("week", F.col("ts"))
    f = ev.groupBy("user_id").agg(F.min(wk).alias("w0"))
    a = ev.select("user_id", wk.alias("w")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("w0")) / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# Exact interpolated percentiles per group (DuckDB `quantile_cont` —
# linear interpolation; round(6) absorbs the last-ulp float
# divergence). r06: rewired onto the distributed ranking path
# (ranking.exact_percentiles_grouped) — the previous `percentile(...)`
# aggregate buffers each group's ENTIRE value set in one reducer,
# which is the OOM at 100x when every priority is a fat slice of the
# table; the distributed formulation ranks through boundary-literal
# buckets and fetches only the boundary-rank rows (equality with the
# aggregate pinned in tests/test_ranking.py). The scale path for
# approximate needs remains functions/profiling's sketch quantiles.
# --------------------------------------------------------------------------

PERCENTILES_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 6)  AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("orders_value_percentiles", PERCENTILES_SQL)
def orders_value_percentiles(spark, sf_dir):
    from thundercats_spark.operators.ranking import exact_percentiles_grouped

    o = load(spark, sf_dir, "orders")["orders"]
    pct = exact_percentiles_grouped(
        o, ["o_orderpriority"], "o_totalprice", [0.5, 0.9, 0.99]
    )
    wide = pct.groupBy("o_orderpriority").agg(
        *[
            F.round(
                F.max(F.when(F.col("p") == q, F.col("value"))), 6
            ).alias(name)
            for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]
    )
    counts = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    # LEFT join from counts: a group whose values are all NULL has no
    # percentile rows but must still appear (with NULL percentiles),
    # exactly as the GROUP BY oracle produces it
    return (
        counts.join(F.broadcast(wide), "o_orderpriority", "left")
        .select("o_orderpriority", "n_orders", "p50", "p90", "p99")
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# percent_rank / cume_dist: exact rational window ranks ((r-1)/(n-1)
# and r/n int ratios — bit-identical across engines, no rounding).
# --------------------------------------------------------------------------

RANK_DIST_SQL = """
SELECT c_custkey,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd
FROM customer
WHERE c_mktsegment = 'BUILDING'
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@register("customer_balance_rank_dist", RANK_DIST_SQL)
def customer_balance_rank_dist(spark, sf_dir):
    # percent_rank/cume_dist over a no-partition window = the whole
    # segment on ONE sort partition. With the unique (acctbal, custkey)
    # total order, both statistics derive exactly from the distributed
    # global row number: pr = (rn-1)/(n-1), cd = rn/n — the same int
    # ratios the window functions compute, bit-identical doubles.
    from thundercats_spark.operators.ranking import global_row_number

    c = load(spark, sf_dir, "customer")["customer"]
    numbered = global_row_number(
        c.where(F.col("c_mktsegment") == "BUILDING").select(
            "c_custkey", "c_acctbal"
        ),
        ["c_acctbal", "c_custkey"],
        total_col="__n",
    )
    rn, n = F.col("rn"), F.col("__n")
    return numbered.select(
        "c_custkey",
        F.when(n == 1, F.lit(0.0))
        .otherwise((rn - 1) / (n - 1))
        .alias("pr"),
        (rn / n).alias("cd"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Correlation / covariance per segment (single-pass co-moments; round(6)
# absorbs accumulation-order float noise between engines).
# --------------------------------------------------------------------------

CORR_SQL = """
SELECT c_mktsegment,
       ROUND(corr(o_totalprice, c_acctbal), 6)       AS price_balance_corr,
       ROUND(covar_samp(o_totalprice, c_acctbal), 6) AS price_balance_covar,
       COUNT(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("orders_balance_correlation", CORR_SQL)
def orders_balance_correlation(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    return (
        t["orders"].select("o_custkey", "o_totalprice")
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_acctbal", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.corr("o_totalprice", "c_acctbal"), 6).alias("price_balance_corr"),
            F.round(F.covar_samp("o_totalprice", "c_acctbal"), 6).alias("price_balance_covar"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Latest order per customer (snapshot compaction / SCD current-view):
# row_number window, deterministic tiebreak on the key.
# --------------------------------------------------------------------------

LATEST_SQL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn
  FROM orders
) t
WHERE rn = 1
ORDER BY o_custkey
"""


@register("orders_latest_per_customer", LATEST_SQL)
def orders_latest_per_customer(spark, sf_dir):
    from thundercats_spark.operators.dedup import latest_by_key

    o = load(spark, sf_dir, "orders")["orders"]
    return (
        latest_by_key(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            F.col("o_totalprice").cast("double"),
        )
        .orderBy("o_custkey")
    )
