"""Eleventh query wave (r10): eight surfaces with no prior registry
representative, filling part of the slack the r10 retirement policy
opened (see queries/__init__.py).

1. SCD2 point-in-time fact attribution, cross-checked against DuckDB's
   NATIVE ASOF JOIN (VERDICT r09 #8): our containment join over
   half-open intervals must equal the engine-native as-of semantics.
2. ratio-to-report + rank windows partitioned by a parent dimension
   (nation revenue share of its region).
3. month-over-month growth via a time-series SELF-join (no window —
   an unpartitioned ORDER BY month window is the single-sort-partition
   trap the plan gate bans; the equi-join shape scales).
4. fixed-width histogram (width_bucket shape) over order values.
5. per-source WEIGHTED median (integer weights via cumulative-sum
   window, partitioned by source — exact, no floats anywhere).
6. per-document character-distribution Shannon entropy (gibberish /
   encoding-noise signal for corpus curation).
7. near-dup pair-score histogram: the dedup QA report over the SAME
   mined pair set as ngram_jaccard_pairs (threshold tuning evidence).
8. per-segment categorical MODE with deterministic tie-breaking
   (two-level aggregation argmax — distinct from top-k-rows ranking).

Cross-engine exactness discipline (see tpch.py header): money in
DECIMAL end-to-end, surfaced as DOUBLE; the only IEEE ops are single
divisions / ln() applied to identical exact inputs in identical order,
with ROUND(x, 6) absorbing summation-order noise where a float SUM is
inherent (the doc_bigram_logprob precedent); every aggregate aliased
identically in both engines; deterministic total order on key columns.

Reference parity: composes the reference's Join/Group/Window surfaces
(physical/Op.scala:30-150); the SCD2/curation entries are
brief-mandated pipeline completeness, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.functions import text_analysis as T
from thundercats_spark.operators.scd2 import scd2_intervals, scd2_join_facts
from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# 1. SCD2 fact attribution vs the engine-native ASOF JOIN.
#    Empty same-day segments (valid_from == valid_to) carry no days, so
#    the non-empty intervals tile each key's timeline contiguously and
#    ASOF-on-valid_from over them equals half-open containment.
# --------------------------------------------------------------------------

SCD2_ASOF_SQL = """
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
  SELECT o_custkey, seg, MIN(o_orderpriority) AS priority,
         MIN(o_orderdate) AS vf
  FROM s GROUP BY o_custkey, seg
),
iv AS (
  SELECT o_custkey AS k, priority, vf,
         LEAD(vf) OVER (PARTITION BY o_custkey ORDER BY seg) AS vt
  FROM g
)
SELECT f.o_orderkey,
       iv.priority AS attributed_priority,
       strftime(iv.vf, '%Y-%m-%d') AS version_from
FROM orders f
ASOF JOIN (SELECT * FROM iv WHERE vt IS NULL OR vf < vt) iv
  ON f.o_custkey = iv.k AND f.o_orderdate >= iv.vf
ORDER BY f.o_orderkey
"""


@register("orders_scd2_attribution", SCD2_ASOF_SQL)
def orders_scd2_attribution(spark, sf_dir):
    """Every order attributed to the priority VERSION in force on its
    own order date — scd2_join_facts (equi-join + half-open containment
    residual) pinned against DuckDB's native ASOF JOIN."""
    orders = load(spark, sf_dir, "orders")["orders"]
    iv = scd2_intervals(
        orders.select("o_custkey", "o_orderkey", "o_orderdate",
                      "o_orderpriority"),
        key="o_custkey", ts="o_orderdate", attr="o_orderpriority",
        tiebreak="o_orderkey", sort=False,
    )
    facts = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    out = scd2_join_facts(facts, iv, key="o_custkey",
                          fact_ts="o_orderdate")
    return out.select(
        "o_orderkey",
        F.col("dim_value").alias("attributed_priority"),
        F.col("dim_valid_from").alias("version_from"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# 2. Nation revenue share of region (ratio-to-report + rank windows,
#    both partitioned by the parent dimension).
# --------------------------------------------------------------------------

NATION_SHARE_SQL = """
WITH nat AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region_name, nation_name,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE)
         / CAST(SUM(rev) OVER (PARTITION BY region_name) AS DOUBLE)
         AS region_share,
       CAST(RANK() OVER (PARTITION BY region_name
                         ORDER BY rev DESC, nation_name) AS BIGINT)
         AS rank_in_region
FROM nat
ORDER BY region_name, nation_name
"""


@register("nation_revenue_share", NATION_SHARE_SQL)
def nation_revenue_share(spark, sf_dir):
    """Ratio-to-report: each nation's share of its region's revenue +
    rank within region. Decimal-exact sums; the share is ONE IEEE
    division of two exact decimals; both windows partition on region
    (25 nations / 5 regions — never a single sort partition). The two
    dims broadcast; the only exchange is the groupBy."""
    t = load(spark, sf_dir, "orders", "customer", "nation", "region")
    nat = (
        t["orders"]
        .join(t["customer"],
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(F.sum(_dec("o_totalprice", "decimal(18,2)")).alias("rev"))
    )
    wreg = Window.partitionBy("region_name")
    wrank = Window.partitionBy("region_name").orderBy(
        F.col("rev").desc(), "nation_name"
    )
    return nat.select(
        "region_name", "nation_name",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double")
         / F.sum("rev").over(wreg).cast("double")).alias("region_share"),
        F.rank().over(wrank).cast("long").alias("rank_in_region"),
    ).orderBy("region_name", "nation_name")


# --------------------------------------------------------------------------
# 3. Month-over-month revenue growth via a time-series self-join.
# --------------------------------------------------------------------------

MOM_GROWTH_SQL = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(cur.mo, '%Y-%m') AS month,
       CAST(cur.rev AS DOUBLE) AS revenue,
       cur.n_orders,
       CAST(prev.rev AS DOUBLE) AS prev_revenue,
       CAST(cur.rev - prev.rev AS DOUBLE) / CAST(prev.rev AS DOUBLE)
         AS mom_growth
FROM m cur
LEFT JOIN m prev ON prev.mo = cur.mo - INTERVAL 1 MONTH
ORDER BY month
"""


@register("orders_monthly_growth", MOM_GROWTH_SQL)
def orders_monthly_growth(spark, sf_dir):
    """MoM revenue deltas WITHOUT a window: an unpartitioned ORDER BY
    month window is the single-sort-partition shape the plan gate bans,
    so the previous month arrives by equi-self-join on month-1 — the
    time-series shape that survives any number of months. The monthly
    aggregate is decimal-exact; growth is one IEEE division of exact
    decimals (first month: NULL via the left join)."""
    orders = load(spark, sf_dir, "orders")["orders"]
    m = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
        .agg(
            F.sum(_dec("o_totalprice", "decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .localCheckpoint()  # one aggregation feeds both join sides
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    return (
        cur.join(
            prev,
            F.col("prev.mo") == F.add_months(F.col("cur.mo"), -1),
            "left",
        )
        .select(
            F.date_format("cur.mo", "yyyy-MM").alias("month"),
            F.col("cur.rev").cast("double").alias("revenue"),
            F.col("cur.n_orders").alias("n_orders"),
            F.col("prev.rev").cast("double").alias("prev_revenue"),
            ((F.col("cur.rev") - F.col("prev.rev")).cast("double")
             / F.col("prev.rev").cast("double")).alias("mom_growth"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# 4. Fixed-width value histogram (width_bucket shape).
# --------------------------------------------------------------------------

PRICE_HIST_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_value
FROM orders
GROUP BY 1 ORDER BY bucket
"""


@register("orders_price_histogram", PRICE_HIST_SQL)
def orders_price_histogram(spark, sf_dir):
    """Equi-width histogram of order values: bucket by one identical
    IEEE division+floor in both engines, decimal-exact mass per bucket.
    One map-side-combined aggregation over the scan — the profile
    report shape that sizes every later binning decision."""
    orders = load(spark, sf_dir, "orders")["orders"]
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", "decimal(18,2)"))
            .cast("double").alias("total_value"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# 5. Per-source weighted median (integer weights: token counts).
# --------------------------------------------------------------------------

WEIGHTED_MEDIAN_SQL = r"""
WITH d AS (
  SELECT source, doc_id, n_chars,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
              AS BIGINT)
           AS w
  FROM documents
),
c AS (
  SELECT source, doc_id, n_chars, w,
         SUM(w) OVER (PARTITION BY source ORDER BY n_chars, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY source) AS total
  FROM d
)
SELECT source,
       CAST(MIN(total) AS BIGINT) AS total_tokens,
       CAST(MIN(n_chars) AS BIGINT) AS weighted_median_chars
FROM c
WHERE 2 * cum >= total
GROUP BY source
ORDER BY source
"""


@register("doc_weighted_quality_median", WEIGHTED_MEDIAN_SQL)
def doc_weighted_quality_median(spark, sf_dir):
    """Weighted median document length per source, weighted by token
    count — the curation statistic that answers 'where does half the
    TOKEN MASS sit?' (an unweighted median over-represents short docs).
    Pure integer arithmetic: cumulative token sums over a
    source-partitioned window, smallest n_chars where the cumulative
    weight crosses half the total. No floats, no ties ambiguity
    (doc_id tiebreak)."""
    d = load(spark, sf_dir, "documents")["documents"]
    w = d.select(
        "source", "doc_id", "n_chars",
        T.token_count(F.col("text")).cast("long").alias("w"),
    )
    wc = Window.partitionBy("source").orderBy("n_chars", "doc_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("source")
    c = w.select(
        "source", "n_chars",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("total"),
    )
    return (
        c.where(2 * F.col("cum") >= F.col("total"))
        .groupBy("source")
        .agg(
            F.min("total").cast("long").alias("total_tokens"),
            F.min("n_chars").cast("long").alias("weighted_median_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# 6. Per-document character-distribution entropy.
# --------------------------------------------------------------------------

CHAR_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0
),
cnt AS (
  SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS k
  FROM ch GROUP BY doc_id, c
)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_chars_counted,
       CAST(COUNT(*) AS BIGINT) AS distinct_chars,
       ROUND(ln(SUM(k)) - SUM(k * ln(k)) / SUM(k), 6) AS entropy
FROM cnt
GROUP BY doc_id
ORDER BY doc_id
"""


@register("doc_char_entropy", CHAR_ENTROPY_SQL)
def doc_char_entropy(spark, sf_dir):
    """Shannon entropy of each document's character distribution — the
    classic gibberish/encoding-noise curation signal (natural text sits
    ~4.1 nats; base64 blobs and single-char spam land far away on both
    sides). Identity H = ln(n) - Σ k·ln(k)/n keeps every ln() on exact
    integer inputs; ROUND(·, 6) absorbs float summation-order noise
    (the doc_bigram_logprob precedent). Explode → two
    map-side-combined aggregations, all JVM expressions."""
    d = load(spark, sf_dir, "documents")["documents"]
    cnt = (
        d.where(F.length("text") > 0)
        .select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_chars_counted"),
            F.count(F.lit(1)).cast("long").alias("distinct_chars"),
            F.round(
                F.log(F.sum("k"))
                - F.sum(F.col("k") * F.log("k")) / F.sum("k"),
                6,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# 7. Near-dup pair-score histogram (dedup threshold-tuning report).
# --------------------------------------------------------------------------

PAIR_HIST_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_transform(
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]),
           s -> hash(s)
         ) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
),
pairs AS (
  SELECT len(list_intersect(a.shingles, b.shingles)) * 1.0 /
         (len(a.shingles) + len(b.shingles)
          - len(list_intersect(a.shingles, b.shingles))) AS jaccard
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id
   AND 2 * least(len(a.shingles), len(b.shingles))
         >= greatest(len(a.shingles), len(b.shingles))
  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= 0.5
)
SELECT CAST(FLOOR(jaccard * 20) AS BIGINT) AS score_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY 1 ORDER BY score_bucket
"""


@register("dedup_pair_score_histogram", PAIR_HIST_SQL)
def dedup_pair_score_histogram(spark, sf_dir):
    """Similarity-score histogram over the SAME mined near-dup pair set
    as ngram_jaccard_pairs (0.05-wide buckets): the report that turns
    'threshold 0.5' from a guess into a read — a bimodal histogram says
    the threshold splits clean, mass piling at the cut says move it.
    Binning is floor(j * 20) on the identical IEEE jaccard both engines
    already hash-agree on."""
    from thundercats_spark.operators import dedup

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3,
                                      threshold=0.5)
    return (
        pairs.groupBy(
            F.floor(F.col("jaccard") * 20).cast("long")
            .alias("score_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("score_bucket")
    )


# --------------------------------------------------------------------------
# 8. Per-segment categorical mode with deterministic tie-breaking.
# --------------------------------------------------------------------------

MODE_SQL = """
WITH c AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT segment, priority, n,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY n DESC, priority) AS rn,
         SUM(n) OVER (PARTITION BY segment) AS seg_total
  FROM c
)
SELECT segment, priority AS mode_priority, n AS n_orders,
       CAST(n AS DOUBLE) / CAST(seg_total AS DOUBLE) AS mode_share
FROM r WHERE rn = 1
ORDER BY segment
"""


@register("orders_priority_mode", MODE_SQL)
def orders_priority_mode(spark, sf_dir):
    """The MODE of a categorical per group — two-level aggregation
    argmax (count per (group, value), then row_number over count DESC
    with the value itself as the deterministic tiebreak; a bare mode()
    is tie-ambiguous and differs across engines). Both windows
    partition on segment; the count table is 25 rows."""
    t = load(spark, sf_dir, "orders", "customer")
    c = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrn = Window.partitionBy("segment").orderBy(
        F.col("n").desc(), "priority"
    )
    wtot = Window.partitionBy("segment")
    return (
        c.select(
            "segment", "priority", "n",
            F.row_number().over(wrn).alias("rn"),
            F.sum("n").over(wtot).alias("seg_total"),
        )
        .where(F.col("rn") == 1)
        .select(
            "segment",
            F.col("priority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
            (F.col("n").cast("double")
             / F.col("seg_total").cast("double")).alias("mode_share"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# 9 (late r10). GLOBAL weighted percentiles of the token-mass
#    distribution — the corpus-wide twin of the per-source weighted
#    median, on the distributed running-sum machinery (an unpartitioned
#    cumulative window is the single-sort-partition trap; the operator
#    buckets by key boundaries and offsets per-bucket windows instead).
# --------------------------------------------------------------------------

GLOBAL_WEIGHTED_PCT_SQL = r"""
WITH d AS (
  SELECT doc_id, n_chars,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
              AS BIGINT)
           AS w
  FROM documents
),
c AS (
  SELECT n_chars,
         SUM(w) OVER (ORDER BY n_chars, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER () AS total
  FROM d
),
p AS (SELECT unnest([50, 90, 99]) AS p)
SELECT CAST(p AS BIGINT) AS p,
       CAST(MIN(total) AS BIGINT) AS total_tokens,
       CAST(MIN(n_chars) AS BIGINT) AS weighted_pct_chars
FROM c, p
WHERE 100 * cum >= p * total
GROUP BY p ORDER BY p
"""


@register("doc_weighted_percentiles_global", GLOBAL_WEIGHTED_PCT_SQL)
def doc_weighted_percentiles_global(spark, sf_dir):
    """Corpus-wide weighted p50/p90/p99 of document length by TOKEN
    MASS: the smallest n_chars whose cumulative token weight crosses
    p% of the total — 'how long are the documents where the mass
    sits', the global curve every seq_len/packing decision starts
    from. Pure integer arithmetic end-to-end; the cumulative sum runs
    on operators/ranking.py global_running_sum (three bounded passes,
    partitioned windows — never one sort partition), while the oracle
    pays DuckDB's native unpartitioned window."""
    from thundercats_spark.operators.ranking import global_running_sum

    d = load(spark, sf_dir, "documents")["documents"]
    w = d.select(
        "doc_id", "n_chars",
        T.token_count(F.col("text")).cast("long").alias("w"),
    )
    c = global_running_sum(
        w, order_cols=["n_chars", "doc_id"], weight_col="w",
        out_col="cum", total_col="total",
    )
    return (
        c.select(
            "n_chars", "cum", "total",
            F.explode(F.array(F.lit(50), F.lit(90), F.lit(99)))
            .alias("p"),
        )
        .where(100 * F.col("cum") >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(
            F.min("total").cast("long").alias("total_tokens"),
            F.min("n_chars").cast("long").alias("weighted_pct_chars"),
        )
        .select(F.col("p").cast("long").alias("p"), "total_tokens",
                "weighted_pct_chars")
        .orderBy("p")
    )
