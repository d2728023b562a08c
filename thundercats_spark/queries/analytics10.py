"""Thirteenth query wave (r10, third tranche): six surfaces with no
prior registry representative, filling part of the slack RETIREMENT
WAVE 2 opened (see queries/__init__.py — the r10 window re-verifies
11 pulled-forward r08-tier entries alongside these).

1. cohort LTV matrix: first-order-year cohorts x order year, the
   revenue twin of events_retention_cohorts' user-count retention —
   cohort assignment by a min-aggregation + equi-join, never a
   window.
2. 2-D decile CONTINGENCY with chi-square association: length decile
   x quality decile over documents, both NTILEs on the distributed
   ranking path, and the per-cell chi-square contribution computed as
   (N*O - rt*ct)^2 / (N*rt*ct) — integers until ONE IEEE division.
3. inter-event arrival-time DECADE histogram: LAG per (user, type),
   bucket = decimal digit count of the microsecond gap — pure integer
   arithmetic (no float log that could round a boundary differently
   across engines).
4. near-dup GRAPH DEGREE distribution: how many docs have k near-dup
   neighbors — the dedup-QA report that distinguishes a star cluster
   (one template, many copies) from a diffuse similarity soup; over
   the SAME mined pair set as ngram_jaccard_pairs.
5. day-of-week x hour-of-day activity heatmap where BOTH time
   features come from integer epoch arithmetic ((days+4) mod 7,
   micros-in-day div hour) — no calendar function parity risk at all.
6. revenue concentration (Herfindahl-Hirschman index) per nation:
   HHI = sum(rev_i^2) / (sum rev_i)^2 with BOTH sums decimal-exact,
   one IEEE division at the edge — the market-structure statistic
   float share-summation would smear.

Cross-engine exactness discipline: see analytics8/9.py headers.
Reference parity: composes the reference's Join/Group/Window surfaces
(physical/Op.scala:30-150); entries 2-4 are brief-mandated curation
completeness, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.physical.util import epoch_us
from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# 1. Cohort LTV matrix (first-order-year cohort x order year).
# --------------------------------------------------------------------------

COHORT_LTV_SQL = """
WITH first_order AS (
  SELECT o_custkey, strftime(MIN(o_orderdate), '%Y') AS cohort_year
  FROM orders GROUP BY o_custkey
)
SELECT f.cohort_year,
       strftime(o.o_orderdate, '%Y') AS order_year,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
         AS revenue_per_active
FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2 ORDER BY cohort_year, order_year
"""


@register("orders_cohort_ltv", COHORT_LTV_SQL)
def orders_cohort_ltv(spark, sf_dir):
    """Customer-lifetime-value matrix: customers cohorted by FIRST
    order year, revenue and active count per (cohort, order year) —
    the diagonal-and-right triangle every retention-revenue model
    starts from. Cohort assignment is a min-aggregation + equi-join
    on custkey (both sides shuffle once on the same key — AQE turns
    the small aggregate into a broadcast at low SF); decimal-exact
    revenue, one IEEE division per cell."""
    orders = load(spark, sf_dir, "orders")["orders"]
    first = orders.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy").alias("cohort_year")
    )
    return (
        orders.join(first, "o_custkey")
        .groupBy(
            "cohort_year",
            F.date_format("o_orderdate", "yyyy").alias("order_year"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.sum(_dec("o_totalprice", "decimal(18,2)"))
            .cast("double").alias("revenue"),
        )
        .select(
            "cohort_year", "order_year", "n_active", "revenue",
            (F.col("revenue") / F.col("n_active"))
            .alias("revenue_per_active"),
        )
        .orderBy("cohort_year", "order_year")
    )


# --------------------------------------------------------------------------
# 2. Length-decile x quality-decile contingency with exact-integer
#    chi-square contributions.
# --------------------------------------------------------------------------

CONTINGENCY_SQL = r"""
WITH q AS (
  SELECT doc_id, n_chars,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
              AS BIGINT)
           AS n_tokens
  FROM documents
),
d AS (
  SELECT doc_id,
         NTILE(10) OVER (ORDER BY n_chars, doc_id) AS len_decile,
         NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS tok_decile
  FROM q
),
cell AS (
  SELECT CAST(len_decile AS BIGINT) AS len_decile,
         CAST(tok_decile AS BIGINT) AS tok_decile,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM d GROUP BY 1, 2
),
tot AS (
  SELECT len_decile, tok_decile, observed,
         SUM(observed) OVER (PARTITION BY len_decile) AS rt,
         SUM(observed) OVER (PARTITION BY tok_decile) AS ct,
         SUM(observed) OVER () AS n
  FROM cell
)
SELECT len_decile, tok_decile, observed,
       CAST(rt AS BIGINT) AS row_total,
       CAST(ct AS BIGINT) AS col_total,
       CAST((n * observed - rt * ct) * (n * observed - rt * ct)
            AS DOUBLE)
         / CAST(n * rt * ct AS DOUBLE) AS chi2_contrib
FROM tot
ORDER BY len_decile, tok_decile
"""


@register("doc_len_quality_contingency", CONTINGENCY_SQL)
def doc_len_quality_contingency(spark, sf_dir):
    """Association between document length and token count deciles:
    the 10x10 contingency grid plus each cell's chi-square
    contribution (O-E)^2/E, computed as (N·O − rt·ct)² / (N·rt·ct) —
    integers until one IEEE division, so the association report is
    bit-stable across engines. Both NTILEs ride the distributed
    ranking path; the marginal totals are windows over the <=100-row
    cell table (partitioned by decile). A large total chi-square says
    the two dimensions are redundant for stratified sampling; near-0
    says stratify on both."""
    from thundercats_spark.functions import text_analysis as T
    from thundercats_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    docs = load(spark, sf_dir, "documents")["documents"]
    q = docs.select(
        "doc_id", "n_chars",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).localCheckpoint()  # feeds two independent ranking passes
    by_len = global_row_number(
        q.select("doc_id", "n_chars"), ["n_chars", "doc_id"],
        out_col="rn", total_col="n_total",
    ).select(
        "doc_id",
        ntile_from_rn(F.col("rn"), F.col("n_total"), 10)
        .cast("long").alias("len_decile"),
    )
    by_tok = global_row_number(
        q.select("doc_id", "n_tokens"), ["n_tokens", "doc_id"],
        out_col="rn", total_col="n_total",
    ).select(
        "doc_id",
        ntile_from_rn(F.col("rn"), F.col("n_total"), 10)
        .cast("long").alias("tok_decile"),
    )
    cell = (
        by_len.join(by_tok, "doc_id")
        .groupBy("len_decile", "tok_decile")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    wr = Window.partitionBy("len_decile")
    wc = Window.partitionBy("tok_decile")
    # grand total via the 1-row broadcast (never an unpartitioned
    # window): cell table is <= 100 rows but the gate is shape-based
    tot = cell.agg(F.sum("observed").alias("n"))
    out = (
        cell.withColumn("rt", F.sum("observed").over(wr))
        .withColumn("ct", F.sum("observed").over(wc))
        .crossJoin(F.broadcast(tot))
    )
    num = (F.col("n") * F.col("observed") - F.col("rt") * F.col("ct"))
    return out.select(
        "len_decile", "tok_decile", "observed",
        F.col("rt").cast("long").alias("row_total"),
        F.col("ct").cast("long").alias("col_total"),
        ((num * num).cast("double")
         / (F.col("n") * F.col("rt") * F.col("ct")).cast("double"))
        .alias("chi2_contrib"),
    ).orderBy("len_decile", "tok_decile")


# --------------------------------------------------------------------------
# 3. Inter-event arrival-time decade histogram (integer digit-count
#    buckets — no float log).
# --------------------------------------------------------------------------

INTERARRIVAL_SQL = """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(length(CAST(gap_us AS VARCHAR)) AS BIGINT) AS gap_decade,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM s WHERE gap_us IS NOT NULL
GROUP BY 1, 2 ORDER BY event_type, gap_decade
"""


@register("events_interarrival_decades", INTERARRIVAL_SQL)
def events_interarrival_decades(spark, sf_dir):
    """Log-scale histogram of inter-event gaps per type, bucketed by
    the DECIMAL DIGIT COUNT of the microsecond gap — the one log-bucket
    rule that is pure integer arithmetic in both engines (a float
    log10 could round a 10^k-boundary gap into different buckets on
    different engines). LAG partitions by (user, type); the histogram
    is one map-side-combined agg. The report that sizes session
    timeouts and watermark horizons."""
    events = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy(
        epoch_us("ts"), "event_id"
    )
    s = events.select(
        "event_type",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
    )
    return (
        s.where(F.col("gap_us").isNotNull())
        .groupBy(
            "event_type",
            F.length(F.col("gap_us").cast("string")).cast("long")
            .alias("gap_decade"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
        .orderBy("event_type", "gap_decade")
    )


# --------------------------------------------------------------------------
# 4. Near-dup graph degree distribution (dedup QA over the mined
#    pair set).
# --------------------------------------------------------------------------

DEGREE_DIST_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_transform(
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]),
           s -> hash(s)
         ) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id
   AND 2 * least(len(a.shingles), len(b.shingles))
         >= greatest(len(a.shingles), len(b.shingles))
  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= 0.5
),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS doc_id FROM pairs
        UNION ALL SELECT b AS doc_id FROM pairs)
  GROUP BY doc_id
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree ORDER BY degree
"""


@register("dedup_graph_degree_dist", DEGREE_DIST_SQL)
def dedup_graph_degree_dist(spark, sf_dir):
    """Degree distribution of the near-dup pair graph: how many docs
    have k neighbors at jaccard >= 0.5 — a few high-degree hubs means
    template/boilerplate families (dedup by canonical exemplar), a
    flat low-degree tail means diffuse paraphrase (dedup by
    connected-component collapse). Same mined pair set as
    ngram_jaccard_pairs; degree = one explode-both-ends aggregation,
    histogram = one more."""
    from thundercats_spark.operators import dedup

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3,
                                      threshold=0.5)
    # one pass over pairs: explode both endpoints instead of a unionAll
    # whose two branches each re-execute the whole mining plan (r11,
    # guide §2.4 — the before plan had 28 corpus scans)
    ends = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("doc_id")
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("degree")
    )


# --------------------------------------------------------------------------
# 5. Day-of-week x hour heatmap from pure integer epoch arithmetic.
# --------------------------------------------------------------------------

DOW_HOUR_SQL = """
WITH t AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour
  FROM events
),
c AS (
  SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM t GROUP BY 1, 2
),
tot AS (SELECT SUM(n_events) AS total FROM c)
SELECT c.dow, c.hour, c.n_events,
       CAST(c.n_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
FROM c CROSS JOIN tot t
ORDER BY dow, hour
"""


@register("events_dow_hour_heatmap", DOW_HOUR_SQL)
def events_dow_hour_heatmap(spark, sf_dir):
    """Activity heatmap over (day-of-week, hour-of-day) where BOTH
    time features are integer epoch arithmetic — dow = (days since
    epoch + 4) mod 7 (1970-01-01 was a Thursday; 0 = Sunday), hour =
    micros-in-day div hour — so no calendar-function convention
    (Sunday=0 vs 1, locale weeks) can ever split the engines. One
    map-side-combined agg + the 1-row broadcast total."""
    from thundercats_spark.physical.util import with_grand_total

    events = load(spark, sf_dir, "events")["events"]
    c = (
        events.select(epoch_us("ts").alias("us"))
        .select(
            # `div` is exact INTEGER division on longs — a float
            # quotient could floor across a midnight/hour boundary
            ((F.expr("us div 86400000000") + 4) % 7).alias("dow"),
            F.expr("(us % 86400000000) div 3600000000").alias("hour"),
        )
        .groupBy(F.col("dow").cast("long").alias("dow"),
                 F.col("hour").cast("long").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    c = with_grand_total(c, "n_events", "total")
    return c.select(
        "dow", "hour", "n_events",
        (F.col("n_events").cast("double")
         / F.col("total").cast("double")).alias("share"),
    ).orderBy("dow", "hour")


# --------------------------------------------------------------------------
# 6. Revenue concentration (HHI) per nation — decimal-exact sums.
# --------------------------------------------------------------------------

HHI_SQL = """
WITH rev AS (
  SELECT n.n_name AS nation, o.o_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(CAST(r AS DECIMAL(38,4)) * r) AS DOUBLE)
             / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)), 12)
         AS hhi
FROM rev GROUP BY nation ORDER BY nation
"""


@register("customer_nation_hhi", HHI_SQL)
def customer_nation_hhi(spark, sf_dir):
    """Herfindahl-Hirschman revenue concentration per nation:
    HHI = Σ share_i² = Σ r_i² / (Σ r_i)² — computed with BOTH sums
    decimal-exact (r_i² in decimal(38,4)) and IEEE entering only in
    the final division/multiplication, so the concentration ranking
    cannot be perturbed by float share-summation order; ROUND(·,12)
    absorbs the one remaining cross-engine wobble (DuckDB's wide
    decimal→double cast double-rounds above 2^53, Spark's is
    correctly rounded — a 1-ulp class, not a value class). 1/n = perfect
    competition, 1 = monopoly customer. Nation dim broadcasts; one
    two-level aggregation."""
    t = load(spark, sf_dir, "orders", "customer", "nation")
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(F.sum(_dec("o_totalprice", "decimal(18,2)")).alias("r"))
    )
    return (
        rev.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("r").cast("double").alias("revenue"),
            F.round(
                F.sum(F.col("r").cast("decimal(38,4)") * F.col("r"))
                .cast("double")
                / (F.sum("r").cast("double") * F.sum("r").cast("double")),
                12,
            ).alias("hhi"),
        )
        .orderBy("nation")
    )
