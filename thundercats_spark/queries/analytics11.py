"""Fourteenth query wave (r11): ten surfaces with no prior registry
representative, filling part of the slack RETIREMENT WAVE 3 opened
(see queries/__init__.py).

1. LATERAL top-k join shape: per-nation top-3 customers by revenue.
   The oracle is a genuine ``JOIN LATERAL ... LIMIT 3``; the Spark
   plan is the shape a distributed engine should run instead — a
   ranked window over the pre-aggregated revenue frame. A correlated
   per-row subquery is a nested loop at scale; the window form is one
   exchange on the partition key.
2. sessionized first-touch CONVERSION ATTRIBUTION: sessions from the
   shared gap-based sessionizer, each attributed to its first event
   type, conversion = session contains a 'purchase'.
3. min_by/max_by extremes per market segment (the arg-extremum
   aggregate surface) with a total (price, orderkey) tiebreak order.
4. per-segment GINI coefficient of customer order counts via the
   distributed grouped ranking machinery — integer-exact sums, one
   IEEE division at the edge.
5. Zipf slope of the corpus word-frequency distribution: distributed
   global rank of the vocabulary, then a closed-form log-log
   regression on the top ranks. ln() on exact integers; ROUND(6)
   absorbs float summation order (doc_char_entropy precedent).
6. Heaps-law VOCABULARY GROWTH curve: new word types per 50-doc
   bucket and the cumulative vocabulary, cum through
   global_running_sum (never a single-partition window).
7. per-source token DIVERSITY: Shannon entropy (same exact-integer
   identity), type-token ratio, and Simpson concentration — the
   integer-exact Σk(k-1)/(N(N-1)) form.
8. per-DIMENSION embedding statistics via posexplode: mean/variance
   per coordinate (the PCA screening pass); dual-unnest oracle.
9. order→ship fulfillment lag profile: integer lag days (floor of an
   exact double division — |diff_us| < 2^53 so the quotient is exact
   even for the negative synthetic lags), disc percentiles through
   the grouped distributed-percentile machinery.
10. winsorized per-type value stats: clip at disc p05/p95 (actual
    data values, engine-reproducible), decimal-exact means.

Cross-engine exactness discipline: see analytics8/9/10.py headers.
Reference parity: composes the reference's Join/Group/Window surfaces
(physical/Op.scala:30-150); entries 5-8 are brief-mandated curation
completeness, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.functions import text_analysis as T
from thundercats_spark.physical.util import epoch_us
from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# 1. Per-nation top-3 customers by revenue (LATERAL join shape).
# --------------------------------------------------------------------------

LATERAL_TOPK_SQL = """
WITH cust_rev AS (
  SELECT c.c_custkey, c.c_name, c.c_nationkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT n.n_name AS nation, t.c_name AS customer, t.revenue,
       CAST(t.rnk AS BIGINT) AS rnk
FROM nation n
JOIN LATERAL (
  SELECT c_name, revenue,
         ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
  FROM cust_rev WHERE c_nationkey = n.n_nationkey
  ORDER BY revenue DESC, c_custkey LIMIT 3
) t ON TRUE
ORDER BY nation, rnk
"""


@register("nation_top_customers_lateral", LATERAL_TOPK_SQL)
def nation_top_customers_lateral(spark, sf_dir):
    """Top-3 customers by lifetime revenue within each nation. The
    ORACLE is a literal LATERAL join (per-nation correlated TOP-3
    subquery); the SPARK plan is the distributed re-expression of the
    same semantics — revenue aggregated once (one custkey exchange),
    ranked by a window PARTITIONED on the nation key (per-nation
    groups are customer-count-bounded), dims broadcast. A row-at-a-
    time lateral evaluation would be a nested loop over nations x
    customers at 100 TB; the rank window is the plan that scales.
    Decimal-exact revenue; ties broken by custkey in both engines."""
    t = load(spark, sf_dir, "customer", "orders", "nation")
    rev = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice", "decimal(18,2)"))
             .cast("double").alias("revenue"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), "c_custkey"
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"),
                F.col("c_name").alias("customer"), "revenue", "rnk")
        .orderBy("nation", "rnk")
    )


# --------------------------------------------------------------------------
# 2. Sessionized first-touch conversion attribution.
# --------------------------------------------------------------------------

SESSION_ATTRIBUTION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   <= 1800000000
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), per AS (
  SELECT user_id, session_id,
         FIRST_VALUE(event_type) OVER
           (PARTITION BY user_id, session_id ORDER BY ts, event_id)
           AS first_touch,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER
           (PARTITION BY user_id, session_id) AS converted,
         ROW_NUMBER() OVER
           (PARTITION BY user_id, session_id ORDER BY ts, event_id)
           AS rn
  FROM sess
)
SELECT first_touch,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate
FROM per WHERE rn = 1
GROUP BY first_touch ORDER BY first_touch
"""


@register("events_session_attribution", SESSION_ATTRIBUTION_SQL)
def events_session_attribution(spark, sf_dir):
    """First-touch attribution over gap-sessionized events: which
    entry event type starts the sessions that convert (contain a
    'purchase')? One user_id exchange drives BOTH the sessionizer's
    windows and the per-session aggregation (same partitioning —
    Catalyst reuses the exchange); the per-session first event is an
    order-free struct-min aggregate, never a second sort. The final
    group-by is on event-type cardinality (tiny). Conversion rate is
    one IEEE division of exact integers."""
    from thundercats_spark.operators.sessionize import sessionize

    ev = load(spark, sf_dir, "events")["events"]
    sess = sessionize(
        ev, user_col="user_id", ts_col="ts", gap_minutes=30,
        order_cols=["event_id"],
    )
    per = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min(F.struct("ts", "event_id", "event_type"))["event_type"]
            .alias("first_touch"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return (
        per.groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .select(
            "first_touch", "n_sessions", "n_converted",
            (F.col("n_converted").cast("double") / F.col("n_sessions"))
            .alias("conversion_rate"),
        )
        .orderBy("first_touch")
    )


# --------------------------------------------------------------------------
# 3. Per-segment extreme orders (min_by / max_by surface).
# --------------------------------------------------------------------------

SEGMENT_EXTREMES_SQL = """
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), r AS (
  SELECT segment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY o_totalprice DESC, o_orderkey DESC)
           AS rmax,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY o_totalprice ASC, o_orderkey ASC)
           AS rmin
  FROM j
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_orderkey,
       MAX(CASE WHEN rmax = 1 THEN o_totalprice END) AS top_price,
       MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_orderkey,
       MAX(CASE WHEN rmin = 1 THEN o_totalprice END) AS bottom_price
FROM r GROUP BY segment ORDER BY segment
"""


@register("segment_extreme_orders", SEGMENT_EXTREMES_SQL)
def segment_extreme_orders(spark, sf_dir):
    """Cheapest and priciest order per market segment through the
    arg-extremum aggregates (min_by/max_by over a total (price,
    orderkey) struct order — deterministic under price ties). ONE
    partial-aggregating group-by, no window, no sort of the fact
    table: the oracle's ROW_NUMBER formulation is what engines
    without arg-extremum aggregates must do; max_by is the plan that
    scales (map-side combine, 5 groups)."""
    t = load(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(
        t["customer"], F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey", "o_totalprice",
    )
    ordkey = F.struct("o_totalprice", "o_orderkey")
    return (
        j.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max_by("o_orderkey", ordkey).alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
            F.min_by("o_orderkey", ordkey).alias("bottom_orderkey"),
            F.min("o_totalprice").alias("bottom_price"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# 4. Per-segment Gini coefficient of customer order counts.
# --------------------------------------------------------------------------

GINI_SQL = """
WITH pc AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS cnt
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), r AS (
  SELECT segment, cnt,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cnt, c_custkey)
           AS i
  FROM pc
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cnt) AS BIGINT) AS total_orders,
       CAST(2 * SUM(i * cnt) AS DOUBLE) / (COUNT(*) * SUM(cnt))
         - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) AS gini
FROM r GROUP BY segment ORDER BY segment
"""


@register("customer_order_gini", GINI_SQL)
def customer_order_gini(spark, sf_dir):
    """Inequality of order volume across customers, per segment:
    Gini = 2·Σ(i·x_i) / (n·Σx_i) − (n+1)/n with x sorted ascending —
    every sum an exact integer (rank i from the distributed grouped
    ranking machinery, never a per-segment single-sort-partition
    window), two IEEE divisions at the edge evaluated identically by
    both engines. LEFT join keeps zero-order customers in the
    population (the synthetic corpus has none, but the statistic is
    defined over all customers)."""
    from thundercats_spark.operators.ranking import grouped_row_number

    t = load(spark, sf_dir, "customer", "orders")
    pc = (
        t["customer"]
        .join(t["orders"],
              F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("c_custkey")
        )
        .agg(F.count("o_orderkey").cast("long").alias("cnt"))
    )
    r = grouped_row_number(
        pc, ["segment"], ["cnt", "c_custkey"], out_col="i"
    )
    return (
        r.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cnt").cast("long").alias("total_orders"),
            F.sum(F.col("i") * F.col("cnt")).cast("long").alias("_s"),
        )
        .select(
            "segment", "n_customers", "total_orders",
            (
                (2 * F.col("_s")).cast("double")
                / (F.col("n_customers") * F.col("total_orders"))
                - (F.col("n_customers") + 1).cast("double")
                / F.col("n_customers")
            ).alias("gini"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# 5. Zipf slope of the word-frequency distribution.
# --------------------------------------------------------------------------

ZIPF_SQL = r"""
WITH w AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest(regexp_split_to_array(TRIM(text), '\s+')) AS word
        FROM documents WHERE TRIM(text) <> '')
  GROUP BY word
), r AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, word) AS rnk FROM w
), x AS (
  SELECT ln(CAST(rnk AS DOUBLE)) AS lx, ln(CAST(f AS DOUBLE)) AS ly
  FROM r WHERE rnk <= 2000
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
  ROUND((COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
        / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)), 6) AS slope,
  ROUND((SUM(ly) - (COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
                   / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx))
                   * SUM(lx)) / COUNT(*), 6) AS intercept,
  ROUND((COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
        * (COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
        / ((COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx))
           * (COUNT(*) * SUM(ly * ly) - SUM(ly) * SUM(ly))), 6) AS r2
FROM x
"""


@register("doc_zipf_slope", ZIPF_SQL)
def doc_zipf_slope(spark, sf_dir):
    """Zipf-law fit over the corpus vocabulary: rank words by
    frequency (distributed global rank — boundary-bucketed, no
    single-partition sort over the vocabulary), regress ln(freq) on
    ln(rank) over the top 2000 ranks in closed form. A natural-text
    corpus sits near slope −1; template spam and synthetic noise bend
    it away — the curation screen this implements. Every ln() takes
    an exact integer; ROUND(6) absorbs summation-order noise in the
    five sums (the doc_char_entropy precedent)."""
    from thundercats_spark.operators.ranking import global_row_number

    d = load(spark, sf_dir, "documents")["documents"]
    wc = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .withColumn("neg_f", -F.col("f"))
    )
    r = global_row_number(wc, ["neg_f", "word"], out_col="rnk")
    x = r.where(F.col("rnk") <= 2000).select(
        F.log(F.col("rnk").cast("double")).alias("lx"),
        F.log(F.col("f").cast("double")).alias("ly"),
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("lx"), F.sum("ly")
    sxy = F.sum(F.col("lx") * F.col("ly"))
    sxx = F.sum(F.col("lx") * F.col("lx"))
    syy = F.sum(F.col("ly") * F.col("ly"))
    cov, varx = n * sxy - sx * sy, n * sxx - sx * sx
    return x.agg(
        n.cast("long").alias("n_ranks"),
        F.round(cov / varx, 6).alias("slope"),
        F.round((sy - cov / varx * sx) / n, 6).alias("intercept"),
        F.round(cov * cov / (varx * (n * syy - sy * sy)), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# 6. Heaps-law vocabulary growth curve (new types per 50-doc bucket).
# --------------------------------------------------------------------------

VOCAB_GROWTH_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(TRIM(text), '\s+')) AS word
  FROM documents WHERE TRIM(text) <> ''
), firsts AS (
  SELECT word, MIN(doc_id) // 50 AS bucket FROM tok GROUP BY word
), newt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM firsts GROUP BY bucket
), occ AS (
  SELECT doc_id // 50 AS bucket,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok GROUP BY 1
)
SELECT o.bucket, o.n_docs, o.n_tokens,
       COALESCE(n.new_types, 0) AS new_types,
       CAST(SUM(COALESCE(n.new_types, 0))
            OVER (ORDER BY o.bucket ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_vocab
FROM occ o LEFT JOIN newt n ON n.bucket = o.bucket
ORDER BY o.bucket
"""


@register("doc_vocab_growth", VOCAB_GROWTH_SQL)
def doc_vocab_growth(spark, sf_dir):
    """Vocabulary growth (Heaps' law) curve: per 50-document bucket,
    how many word types appear for the FIRST time, and the cumulative
    vocabulary — the diversity-saturation diagnostic for a training
    corpus (a flattening curve means new data is re-treading old
    vocabulary). First appearance is a min-aggregation per word (one
    shuffle on the word hash — never a scan-order dependence); the
    cumulative sum runs through global_running_sum's boundary-bucket
    machinery, not a single-partition window, so the curve stays
    distributed however many buckets 100 TB yields. Docs with no
    tokens contribute to no bucket (documented convention)."""
    from thundercats_spark.operators.ranking import global_running_sum

    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("word")
    )
    newt = (
        tok.groupBy("word")
        .agg(F.expr("min(doc_id) div 50").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    occ = (
        tok.groupBy(F.expr("doc_id div 50").alias("bucket"))
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )
    j = occ.join(newt, "bucket", "left").select(
        "bucket", "n_docs", "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
    )
    out = global_running_sum(
        j, ["bucket"], "new_types", out_col="cum_vocab"
    )
    return out.select(
        "bucket", "n_docs", "n_tokens", "new_types",
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    ).orderBy("bucket")


# --------------------------------------------------------------------------
# 7. Per-source token diversity (entropy, TTR, Simpson).
# --------------------------------------------------------------------------

DIVERSITY_SQL = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(TRIM(text), '\s+')) AS word
  FROM documents WHERE TRIM(text) <> ''
), cnt AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS k
  FROM tok GROUP BY source, word
)
SELECT source,
       CAST(SUM(k) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(COUNT(*) AS DOUBLE) / SUM(k) AS ttr,
       ROUND(ln(SUM(k)) - SUM(k * ln(k)) / SUM(k), 6) AS entropy,
       CAST(SUM(k * (k - 1)) AS DOUBLE) / (SUM(k) * (SUM(k) - 1))
         AS simpson
FROM cnt GROUP BY source ORDER BY source
"""


@register("doc_token_diversity_by_source", DIVERSITY_SQL)
def doc_token_diversity_by_source(spark, sf_dir):
    """Lexical diversity per source: Shannon entropy of the word
    distribution (H = ln N − Σ k·ln k / N — every ln() on an exact
    integer, ROUND(6) absorbing summation order), type-token ratio,
    and Simpson concentration in its integer-exact Σk(k−1)/(N(N−1))
    form (one IEEE division of exact integers — no float share
    summation at all). The per-source mixture screen that separates a
    boilerplate mirror (low entropy, high Simpson) from genuine text.
    Two map-side-combined aggregations, all JVM expressions."""
    d = load(spark, sf_dir, "documents")["documents"]
    cnt = (
        d.select("source", F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    nn = F.sum("k")
    return (
        cnt.groupBy("source")
        .agg(
            nn.cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            (F.count(F.lit(1)).cast("double") / nn).alias("ttr"),
            F.round(
                F.log(nn) - F.sum(F.col("k") * F.log("k")) / nn, 6
            ).alias("entropy"),
            (
                F.sum(F.col("k") * (F.col("k") - 1)).cast("double")
                / (nn * (nn - 1))
            ).alias("simpson"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# 8. Per-dimension embedding statistics (posexplode / dual-unnest).
# --------------------------------------------------------------------------

DIM_STATS_SQL = """
WITH d AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)
SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(x) / COUNT(*), 6) AS mean_x,
       ROUND((SUM(x * x) - SUM(x) * SUM(x) / COUNT(*)) / COUNT(*), 6)
         AS var_x
FROM d GROUP BY dim ORDER BY dim
"""


@register("embedding_dim_stats", DIM_STATS_SQL)
def embedding_dim_stats(spark, sf_dir):
    """Mean and (population) variance of every embedding coordinate —
    the PCA/whitening screening pass that finds dead or dominant
    dimensions before an ANN index is built. posexplode keeps the
    coordinate index alongside the value (the oracle's dual-unnest);
    one group-by on the 64 dims, partial aggregation map-side, float32
    widened to double exactly on both engines, ROUND(6) absorbing
    summation order across the 500-row (at sf0.01) reduction."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    d = e.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    n = F.count(F.lit(1))
    sx, sxx = F.sum("x"), F.sum(F.col("x") * F.col("x"))
    return (
        d.groupBy("dim")
        .agg(
            n.cast("long").alias("n"),
            F.round(sx / n, 6).alias("mean_x"),
            F.round((sxx - sx * sx / n) / n, 6).alias("var_x"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# 9. Order→ship fulfillment lag profile per priority.
# --------------------------------------------------------------------------

SHIP_LAG_SQL = """
WITH lag AS (
  SELECT o.o_orderpriority AS priority,
         CAST(FLOOR(CAST(epoch_us(l.l_shipdate)
                         - epoch_us(o.o_orderdate) AS DOUBLE)
                    / 86400000000) AS BIGINT) AS lag_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS avg_lag_days,
       CAST(quantile_disc(lag_days, 0.5) AS BIGINT) AS p50_lag_days,
       CAST(quantile_disc(lag_days, 0.9) AS BIGINT) AS p90_lag_days
FROM lag GROUP BY priority ORDER BY priority
"""


@register("orders_ship_lag_profile", SHIP_LAG_SQL)
def orders_ship_lag_profile(spark, sf_dir):
    """Fulfillment lag (order date → line-item ship date, whole days)
    per order priority: count, exact average, and disc p50/p90. Lag is
    floor(Δμs / day) — an EXACT double quotient (|Δμs| < 2^53) so the
    floor agrees across engines even on the synthetic negative lags.

    r11 shape: lag_days has a BOUNDED domain (distinct calendar-day
    deltas), so disc percentiles come from a per-priority (lag_days →
    cnt) HISTOGRAM + cumulative window instead of the grouped
    row-number machinery (which cost 5 internal driver jobs, a full
    rank window over the fact join, a persist, and — because the query
    unpersisted before returning — a complete RECOMPUTE of the join at
    action time). percentile_disc(p) = value at rank ceil(p·n)
    (``disc_rank`` semantics) = the smallest histogram value whose
    cumulative count reaches that rank; the rank is computed with
    exact integer arithmetic in-plan (``_idiv``, no float product).
    One fact join → one tiny-cardinality groupBy (map-side partial
    collapse) → windows + final agg on the same priority partitioning.
    Integer sums over (value·cnt) keep the average exact. Guide §1.2
    step 1 + §2.3 (aggregate before you shuffle)."""
    from thundercats_spark.operators.ranking import _idiv

    t = load(spark, sf_dir, "orders", "lineitem")
    lag = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.floor(
                (epoch_us("l_shipdate") - epoch_us("o_orderdate"))
                .cast("double") / F.lit(86400000000)
            ).cast("long").alias("lag_days"),
        )
    )
    hist = lag.groupBy("priority", "lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("priority")
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn(
            "s", F.sum(F.col("lag_days") * F.col("cnt")).over(w_all)
        )
    )
    # disc_rank(p, n) = max(1, ceil(p*n)), exact: ceil(a/b) = (a+b-1) div b
    r50 = _idiv(F.col("n") + F.lit(1), F.lit(2))
    r90 = _idiv(F.col("n") * F.lit(9) + F.lit(9), F.lit(10))
    return (
        h.groupBy("priority")
        .agg(
            F.max("n").alias("n_items"),
            (F.max("s").cast("double") / F.max("n")).alias("avg_lag_days"),
            F.min(
                F.when(F.col("cum") >= r50, F.col("lag_days"))
            ).alias("p50_lag_days"),
            F.min(
                F.when(F.col("cum") >= r90, F.col("lag_days"))
            ).alias("p90_lag_days"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# 10. Winsorized per-type event-value statistics.
# --------------------------------------------------------------------------

WINSORIZED_SQL = """
WITH b AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS p05,
         quantile_disc(value, 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS raw_mean,
       MAX(b.p05) AS p05,
       MAX(b.p95) AS p95,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, b.p05), b.p95)
                     AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS winsor_mean
FROM events e JOIN b ON b.event_type = e.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""


@register("events_value_winsorized", WINSORIZED_SQL)
def events_value_winsorized(spark, sf_dir):
    """Winsorized mean of event value per type: clip at the per-type
    disc p05/p95 — ACTUAL data values, so the clip boundaries are
    engine-reproducible doubles; decimal-exact sums make both means
    order-independent. The outlier-robust revenue statistic a payments
    pipeline reports next to the raw mean.

    r11 shape: value is 2-decimal money on a bounded range, so the
    distinct (event_type, value) histogram is CARDINALITY-bounded by
    the domain, not the row count — disc p05/p95 come from a
    cumulative window over that tiny histogram (exact integer
    ceil(p·n) ranks via ``_idiv``) instead of the grouped row-number
    machinery (6 internal driver jobs + a rank-window sort of the full
    table + a persist whose unpersist forced a second full scan at
    action time). The winsorized sum never touches the raw rows again:
    Σ clip(v) = Σ_mid cnt·v + n_below·p05 + n_above·p95, with
    row-is-below ⟺ cum < r05 and row-is-above ⟺ cum−cnt ≥ r95 (the
    p95 row is the FIRST with cum ≥ r95, so only strictly later
    histogram rows clip down). All terms exact decimal. One scan, one
    shrinking groupBy, windows + final agg on one event_type
    partitioning. Guide §1.2 step 1 + §2.3 (aggregate before you
    shuffle)."""
    from thundercats_spark.operators.ranking import _idiv

    ev = load(spark, sf_dir, "events")["events"].select(
        "event_type", "value"
    )
    hist = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    h = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    r05 = _idiv(F.col("n") + F.lit(19), F.lit(20))
    r95 = _idiv(F.col("n") * F.lit(19) + F.lit(19), F.lit(20))
    below = F.col("cum") < r05                    # value < p05
    above = (F.col("cum") - F.col("cnt")) >= r95  # value > p95
    zero = F.lit(0).cast("long")
    agg = h.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(_dec("value") * F.col("cnt")).alias("raw_sum"),
        F.min(F.when(F.col("cum") >= r05, F.col("value"))).alias("p05"),
        F.min(F.when(F.col("cum") >= r95, F.col("value"))).alias("p95"),
        F.sum(F.when(below, F.col("cnt")).otherwise(zero)).alias("n_below"),
        F.sum(F.when(above, F.col("cnt")).otherwise(zero)).alias("n_above"),
        F.sum(
            F.when(~below & ~above, _dec("value") * F.col("cnt"))
        ).alias("mid_sum"),
    )
    return (
        agg.select(
            "event_type",
            "n",
            (F.col("raw_sum").cast("double") / F.col("n")).alias("raw_mean"),
            "p05",
            "p95",
            (
                (
                    F.coalesce(F.col("mid_sum"), F.lit(0).cast("decimal(12,2)"))
                    + F.col("n_below") * _dec(F.col("p05"))
                    + F.col("n_above") * _dec(F.col("p95"))
                ).cast("double")
                / F.col("n")
            ).alias("winsor_mean"),
        )
        .orderBy("event_type")
    )
