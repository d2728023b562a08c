"""Twelfth query wave (r10, second tranche): five surfaces with no
prior registry representative, filling the remaining r10 rotation
slack (tools/rotation_next.py: 5 — see queries/__init__.py).

1. interval SWEEP-LINE concurrency: peak open orders per month from
   +1/-1 boundary deltas and a distributed global running sum — the
   interval-algebra shape (sessions in flight, connections open,
   orders unshipped) that a naive day-by-interval cross join would
   make quadratic.
2. Pareto / Lorenz concentration report: customer revenue deciles with
   cumulative share — NTILE over the full customer set via the
   boundary-bucketed distributed ranking path, cumulative share via a
   triangle self-join over the 10-row decile aggregate (never an
   unpartitioned cumulative window).
3. first-order Markov transition matrix over each user's event
   sequence (LAG within user, then transition-count normalization) —
   the sequence-model statistic behind session simulation and
   next-event prediction.
4. per-type daily anomaly flags where the |z| >= 2 MEMBERSHIP decision
   is pure integer arithmetic ((n-1)·(n·c-S)² vs 4·n·(n·Q-S²) in
   38-digit decimal) so the flagged set is bit-stable across engines;
   only the REPORTED z pays one identical IEEE sqrt/division chain.
5. vocabulary Jaccard overlap between every source pair — distinct
   (source, token) joined on TOKEN (never a doc x doc cross join),
   the corpus-provenance signal behind contamination triage.

Cross-engine exactness discipline (see tpch.py / analytics8.py
headers): exact integer/decimal arithmetic everywhere a comparison or
group membership depends on it; IEEE ops only as a final identical
single expression on exact inputs; every aggregate aliased identically
in both engines; deterministic total order on key columns.

Reference parity: composes the reference's Join/Group/Window surfaces
(physical/Op.scala:30-150); the curation/sequence entries are
brief-mandated pipeline completeness, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.physical.util import epoch_us
from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# 1. Sweep-line: peak concurrently-open orders per month. An order is
#    open from its order date until the day AFTER its last shipment
#    (half-open [orderdate, last_ship + 1)). The running count is
#    evaluated at change days (boundary events) — between boundaries
#    the count is constant, so the per-month peak over change days IS
#    the true peak for any month containing a boundary; months with no
#    boundary simply do not appear (same rule in both engines).
# --------------------------------------------------------------------------

BACKLOG_SQL = """
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS od,
         CAST(MAX(l.l_shipdate) AS DATE) + 1 AS cd
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
delta AS (
  SELECT od AS day, 1 AS d FROM iv
  UNION ALL
  SELECT cd AS day, -1 AS d FROM iv
),
byday AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS nd FROM delta GROUP BY day
),
run AS (
  SELECT day,
         SUM(nd) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS open
  FROM byday
)
SELECT strftime(date_trunc('month', day), '%Y-%m') AS month,
       CAST(MAX(open) AS BIGINT) AS peak_open_orders,
       CAST(COUNT(*) AS BIGINT) AS n_change_days
FROM run GROUP BY 1 ORDER BY month
"""


@register("orders_backlog_sweepline", BACKLOG_SQL)
def orders_backlog_sweepline(spark, sf_dir):
    """Peak open-order backlog per month by sweep line: each order
    contributes +1 at its order date and -1 the day after its last
    shipment; the net delta per day feeds global_running_sum
    (operators/ranking.py — boundary-bucketed partitioned windows,
    never one sort partition), and the month's peak is the max of the
    running count over that month's change days. Work is O(orders)
    rows of deltas regardless of how long intervals are — the shape
    that replaces the quadratic day-by-interval join at 100 TB."""
    from thundercats_spark.operators.ranking import global_running_sum

    t = load(spark, sf_dir, "orders", "lineitem")
    iv = (
        t["orders"]
        .join(t["lineitem"],
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("od"))
        .agg(F.date_add(F.to_date(F.max("l_shipdate")), 1).alias("cd"))
    )
    delta = iv.select(F.col("od").alias("day"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("cd").alias("day"), F.lit(-1).alias("d"))
    )
    byday = delta.groupBy("day").agg(F.sum("d").cast("long").alias("nd"))
    run = global_running_sum(byday, order_cols=["day"], weight_col="nd",
                             out_col="open")
    return (
        run.groupBy(F.date_format(F.date_trunc("month", "day"), "yyyy-MM")
                    .alias("month"))
        .agg(
            F.max("open").cast("long").alias("peak_open_orders"),
            F.count(F.lit(1)).alias("n_change_days"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# 2. Pareto / Lorenz concentration: revenue deciles of the customer
#    base (decile 1 = highest-revenue customers) with cumulative share.
# --------------------------------------------------------------------------

PARETO_SQL = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_custkey
),
dec AS (
  SELECT o_custkey, rev,
         NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
  FROM rev
),
agg AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(rev) AS decile_rev
  FROM dec GROUP BY decile
),
tot AS (SELECT SUM(decile_rev) AS total_rev FROM agg)
SELECT a.decile, a.n_customers,
       CAST(a.decile_rev AS DOUBLE) AS revenue,
       CAST(a.decile_rev AS DOUBLE) / CAST(t.total_rev AS DOUBLE)
         AS revenue_share,
       CAST(SUM(a.decile_rev) OVER (ORDER BY a.decile
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / CAST(t.total_rev AS DOUBLE) AS cum_share
FROM agg a CROSS JOIN tot t
ORDER BY a.decile
"""


@register("customer_revenue_pareto", PARETO_SQL)
def customer_revenue_pareto(spark, sf_dir):
    """Lorenz-curve report: split customers into revenue deciles
    (NTILE(10) by revenue DESC — decile 1 holds the biggest accounts)
    and report each decile's exact revenue share plus the cumulative
    'top-k deciles hold X%' curve. The NTILE runs on the distributed
    ranking path (global_row_number + ntile_from_rn — boundary-bucketed,
    no single sort partition); the cumulative share EXPLODES each
    decile row to every decile >= its own and re-aggregates (pure
    equi-groupBy over <= 55 rows — no non-equi join, no BNLJ, no
    cumulative window), exact decimal sums with one IEEE division at
    the edge; the grand total rides the whitelisted 1-row broadcast
    cross join."""
    from thundercats_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    orders = load(spark, sf_dir, "orders")["orders"]
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice", "decimal(18,2)")).alias("rev"))
        .withColumn("neg_rev", -F.col("rev"))
    )
    rn = global_row_number(rev, order_cols=["neg_rev", "o_custkey"],
                           out_col="rn", total_col="n_total")
    dec = rn.withColumn(
        "decile",
        ntile_from_rn(F.col("rn"), F.col("n_total"), 10).cast("long"),
    )
    agg = (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("decile_rev"),
        )
        .localCheckpoint()  # 10 rows feed three consumers below
    )
    tot = agg.agg(F.sum("decile_rev").alias("total_rev"))
    # cum_rev(d) = sum of decile_rev over deciles <= d, WITHOUT a
    # non-equi join: each decile row fans out to every decile from its
    # own through 10, then one equi-groupBy sums; deciles absent from
    # the data (fewer rows than buckets) drop at the inner join below.
    cum = (
        agg.select(
            "decile_rev",
            F.explode(
                F.sequence(F.col("decile"), F.lit(10).cast("long"))
            ).alias("decile"),
        )
        .groupBy("decile")
        .agg(F.sum("decile_rev").alias("cum_rev"))
    )
    return (
        agg.join(cum, "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_customers",
            F.col("decile_rev").cast("double").alias("revenue"),
            (F.col("decile_rev").cast("double")
             / F.col("total_rev").cast("double")).alias("revenue_share"),
            (F.col("cum_rev").cast("double")
             / F.col("total_rev").cast("double")).alias("cum_share"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# 3. First-order Markov transition matrix over per-user event
#    sequences (ordered by microsecond timestamp, event_id tiebreak).
# --------------------------------------------------------------------------

TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p
FROM c
ORDER BY from_type, to_type
"""


@register("events_type_transitions", TRANSITIONS_SQL)
def events_type_transitions(spark, sf_dir):
    """Event-type transition counts and row-normalized probabilities:
    LAG over each user's sequence (microsecond order, event_id
    tiebreak — the SAME micros both engines see, per the epoch_us
    parity contract), then one count aggregation; the normalizing
    window partitions on from_type over the k x k count table (k =
    #event types). Per-user sequences shuffle once on user_id; the
    transition table is tiny at any corpus size."""
    events = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(epoch_us("ts"), "event_id")
    s = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    c = (
        s.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return c.select(
        "from_type", "to_type", "n",
        (F.col("n").cast("double")
         / F.sum("n").over(wt).cast("double")).alias("p"),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# 4. Per-type daily anomaly flags with INTEGER-EXACT membership:
#    flag day d of type t when (c - mean)^2 >= 4 * var  — i.e.
#    |z| >= 2 — decided as (n-1)(nc-S)^2 >= 4n(nQ-S^2) in 38-digit
#    decimal, so float noise can never flip a day in or out of the
#    result set. Only the REPORTED z pays IEEE, as one identical
#    expression on exact integers in both engines.
# --------------------------------------------------------------------------

ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM daily GROUP BY event_type
)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.c AS n_events,
       ROUND(CAST(st.n * d.c - st.s AS DOUBLE)
             * SQRT(CAST(st.n - 1 AS DOUBLE)
                    / (CAST(st.n AS DOUBLE)
                       * CAST(st.n * st.q - st.s * st.s AS DOUBLE))), 6)
         AS z,
       CASE WHEN st.n * d.c - st.s > 0 THEN 'spike' ELSE 'dip' END
         AS direction
FROM daily d JOIN stats st ON d.event_type = st.event_type
WHERE st.n >= 2 AND st.n * st.q > st.s * st.s
  AND CAST(st.n - 1 AS DECIMAL(38,0))
        * CAST(st.n * d.c - st.s AS DECIMAL(38,0))
        * CAST(st.n * d.c - st.s AS DECIMAL(38,0))
      >= 4 * CAST(st.n AS DECIMAL(38,0))
           * CAST(st.n * st.q - st.s * st.s AS DECIMAL(38,0))
ORDER BY d.event_type, day
"""


@register("events_daily_anomaly", ANOMALY_SQL)
def events_daily_anomaly(spark, sf_dir):
    """Days whose event count sits >= 2 sample standard deviations
    from that type's own daily mean (over OBSERVED days). Membership
    is exact integer arithmetic — (n-1)(nc-S)^2 >= 4n(nQ-S^2) in
    decimal(38,0), immune to stddev summation-order noise that could
    flip a borderline day between engines; the reported z is one
    identical IEEE mult/sqrt/div chain on the same exact integers.
    Two map-side-combined aggregations + a broadcast of the k-row
    stats table — no window at all."""
    events = load(spark, sf_dir, "events")["events"]
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    d, st = daily.alias("d"), stats.alias("st")
    big = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    n, s, q, c = (F.col("st.n"), F.col("st.s"), F.col("st.q"),
                  F.col("d.c"))
    dev = n * c - s          # n*(c - mean), exact long
    m2 = n * q - s * s       # n^2*(n-1)/n * var, exact long
    return (
        d.join(F.broadcast(st), F.col("d.event_type") == F.col("st.event_type"))
        .where(
            (n >= 2) & (m2 > 0)
            & (big(n - 1) * big(dev) * big(dev) >= 4 * big(n) * big(m2))
        )
        .select(
            F.col("d.event_type").alias("event_type"),
            F.date_format("d.day", "yyyy-MM-dd").alias("day"),
            c.alias("n_events"),
            F.round(
                dev.cast("double")
                * F.sqrt((n - 1).cast("double")
                         / (n.cast("double") * m2.cast("double"))),
                6,
            ).alias("z"),
            F.when(dev > 0, F.lit("spike")).otherwise(F.lit("dip"))
            .alias("direction"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# 5. Vocabulary Jaccard overlap between source pairs — joined on
#    TOKEN (the shared-vocabulary rows), never doc x doc.
# --------------------------------------------------------------------------

VOCAB_OVERLAP_SQL = r"""
WITH st AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source,
           unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
    FROM documents WHERE TRIM(text) <> ''
  )
),
sz AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM st GROUP BY source
),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b,
       za.vocab AS vocab_a, zb.vocab AS vocab_b, i.common,
       CAST(i.common AS DOUBLE)
         / CAST(za.vocab + zb.vocab - i.common AS DOUBLE) AS jaccard
FROM inter i
JOIN sz za ON za.source = i.src_a
JOIN sz zb ON zb.source = i.src_b
ORDER BY i.src_a, i.src_b
"""


@register("doc_source_vocab_overlap", VOCAB_OVERLAP_SQL)
def doc_source_vocab_overlap(spark, sf_dir):
    """Vocabulary Jaccard between every pair of sources — the corpus
    provenance/contamination triage report ('which sources speak the
    same language?'). Tokenization is the registry's established
    whitespace split (doc_word_frequencies parity). The pair
    intersection joins the distinct (source, token) table ON TOKEN —
    work scales with shared-vocabulary rows, never |docs|^2 — and the
    per-source vocab sizes broadcast onto the pair table. Pairs with
    zero shared tokens are absent by construction in both engines."""
    d = load(spark, sf_dir, "documents")["documents"]
    st = (
        d.select(
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .distinct()
        .localCheckpoint()  # one scan feeds both join sides + sizes
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    inter = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    za, zb = sz.alias("za"), sz.alias("zb")
    return (
        inter.join(F.broadcast(za), F.col("za.source") == F.col("src_a"))
        .join(F.broadcast(zb), F.col("zb.source") == F.col("src_b"))
        .select(
            "src_a", "src_b",
            F.col("za.vocab").alias("vocab_a"),
            F.col("zb.vocab").alias("vocab_b"),
            "common",
            (F.col("common").cast("double")
             / (F.col("za.vocab") + F.col("zb.vocab") - F.col("common"))
             .cast("double")).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )
