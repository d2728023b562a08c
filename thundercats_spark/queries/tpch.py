"""Headline analytic queries (SURVEY.md §2.2) — TPC-H-shaped, adapted to
the driver's schema, plus event-stream analytics. Each pairs a
DataFrame-API plan with its ANSI-SQL oracle.

Cross-engine exactness rules (Spark vs DuckDB must hash-match):
- SUMs of money doubles are order-dependent in float → accumulate in
  DECIMAL (exact, order-independent; TPC-H itself uses decimal), then
  surface as DOUBLE on both sides (pandas dtype float64 both).
- AVG = exact decimal SUM cast double / COUNT.
- Dates/timestamps are output as formatted STRINGS (engines' native
  date objects don't compare equal through pandas).
- Event timestamps are TIMESTAMP(NANOS) parquet; Spark reads micros
  (via load()), so every time comparison is done in integer
  MICROSECONDS on both engines (DuckDB: epoch_us).
- Per-row double arithmetic is identical-by-construction; COUNT/keys
  are exact.

Scale posture: dimension tables broadcast, facts shuffle only on their
agg/join keys, top-k via orderBy+limit (TakeOrdered — no global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thundercats_spark.queries import load, register


def _dec(c: str | F.Column, scale: str = "decimal(12,2)") -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(scale)


def _sum_exact(c) -> F.Column:
    """Order-independent SUM of a decimal column, surfaced as double."""
    return F.sum(c).cast("double")


def _avg_exact(c: str) -> F.Column:
    """Order-independent average: exact decimal sum → double / count."""
    return F.sum(_dec(c)).cast("double") / F.count(F.lit(1))


def _day_str(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyy-MM-dd")


def _ts_str(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


# --------------------------------------------------------------------------
# Q1 — pricing summary (scan + filter + 8-agg groupBy; the map-side-combine
# benchmark). Flagship query.
# --------------------------------------------------------------------------

Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
       AS DOUBLE)                                             AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)
                                                              AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_SQL)
def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (1 + _dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_exact(_dec("l_quantity")).alias("sum_qty"),
            _sum_exact(_dec("l_extendedprice")).alias("sum_base_price"),
            _sum_exact(disc_price).alias("sum_disc_price"),
            _sum_exact(charge).alias("sum_charge"),
            _avg_exact("l_quantity").alias("avg_qty"),
            _avg_exact("l_extendedprice").alias("avg_price"),
            _avg_exact("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority (3-way join, agg, top-k)
# --------------------------------------------------------------------------

_REV = ("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)")


def _revenue_col() -> F.Column:
    return _sum_exact(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("revenue")


Q3_SQL = f"""
SELECT
  l_orderkey,
  {_REV}                               AS revenue,
  strftime(o_orderdate, '%Y-%m-%d')    AS o_date
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, o_date
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_SQL)
def q3_shipping_priority(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t["orders"].where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t["lineitem"].where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # customer is the small side at every SF (1:10 vs orders) → broadcast.
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey", _day_str("o_orderdate").alias("o_date"))
        .agg(_revenue_col())
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_date")
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join; all dims broadcast)
# --------------------------------------------------------------------------

Q5_SQL = f"""
SELECT
  n_name,
  {_REV} AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""


@register("q5_local_supplier", Q5_SQL)
def q5_local_supplier(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    ords = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    # nation⋈region prunes to one region before touching facts.
    nr = (
        t["nation"]
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = t["supplier"].join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    cust = t["customer"].select("c_custkey", "c_nationkey")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup),
              (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .groupBy("n_name")
        .agg(_revenue_col())
        .orderBy(F.desc("revenue"))
    )


# --------------------------------------------------------------------------
# Q10 — returned items (4-way join + agg + top-k)
# --------------------------------------------------------------------------

Q10_SQL = f"""
SELECT
  c_custkey,
  c_name,
  {_REV} AS revenue,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q10_shape(ords, li, cust):
    """The q10 plan downstream of the source frames — shared by the
    registry query and the bucketed-layout variant (queries/bucketed.py)
    so the parity pin between them compares LAYOUTS, never two
    hand-synced copies of the query. ``ords`` must be pre-filtered to
    the date window and projected to (o_orderkey, o_custkey); ``li``
    to returned items (l_orderkey, l_extendedprice, l_discount);
    ``cust`` is the customer⋈nation dimension (broadcast here)."""
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue_col())
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


def q10_filters(orders, lineitem):
    """q10's fact-side filters+projections, shared with the bucketed
    variant: the date window on orders, returned items on lineitem."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return ords, li


@register("q10_returned_items", Q10_SQL)
def q10_returned_items(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    ords, li = q10_filters(t["orders"], t["lineitem"])
    cust = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "n_name")
    return q10_shape(ords, li, cust)


# --------------------------------------------------------------------------
# Events: time-bucket rollup / per-user top-k / gap sessionization
# --------------------------------------------------------------------------

EVENTS_ROLLUP_SQL = """
SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
"""


@register("events_daily_rollup", EVENTS_ROLLUP_SQL)
def events_daily_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(
            _day_str(F.date_trunc("day", "ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_exact(_dec("value")).alias("total_value"),
            _avg_exact("value").alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_TOPK_SQL = """
SELECT user_id, event_id, value, rnk FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
  FROM events
) WHERE rnk <= 3
ORDER BY user_id, rnk
"""


@register("events_user_topk", EVENTS_TOPK_SQL)
def events_user_topk(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 3)
        .orderBy("user_id", "rnk")
    )


# Gap-based sessionization: a new session starts when a user is idle
# > 30 min. Window lag + running sum — single shuffle on user_id.
# Comparison in integer microseconds on both engines.
EVENTS_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   <= 1800000000
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("events_sessionize", EVENTS_SESSION_SQL)
def events_sessionize(spark, sf_dir):
    from thundercats_spark.operators.sessionize import sessionize

    ev = load(spark, sf_dir, "events")["events"]
    sess = sessionize(ev, user_col="user_id", ts_col="ts", gap_minutes=30, order_cols=["event_id"])
    sess = sess.withColumn("session_id", F.col("session_id").cast("long"))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_exact(_dec("value")).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


# As-of join: for each event, that user's most recent order at or
# before the event time (orders span 1995-2001, events 2024 — the
# event side is the probe). Custom operator (operators/asof.py). The
# oracle compares in microseconds to match Spark's timestamp precision
# (events are nanos in parquet; Spark reads micros).
ASOF_SQL = """
SELECT event_id, user_id,
       strftime(ev_ts, '%Y-%m-%d %H:%M:%S.%f') AS ev_ts,
       o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date
FROM (
  SELECT e.event_id, e.user_id, e.ts AS ev_ts, o.o_orderkey, o.o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id
               AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
)
WHERE rn = 1
ORDER BY event_id
"""


@register("asof_join_events_orders", ASOF_SQL)
def asof_join_events_orders(spark, sf_dir):
    from thundercats_spark.operators.asof import asof_join

    t = load(spark, sf_dir, "orders", "events")
    out = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        t["orders"].select("o_custkey", "o_orderdate", "o_orderkey"),
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=["o_orderkey"],
    )
    return (
        out.select(
            "event_id",
            "user_id",
            _ts_str("ts").alias("ev_ts"),
            "o_orderkey",
            _day_str("o_orderdate").alias("o_date"),
        ).orderBy("event_id")
    )
