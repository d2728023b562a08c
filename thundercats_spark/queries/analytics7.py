"""Tenth query wave (r09): the two relational surfaces VERDICT r08
identified as having no registry representative, filling the rotation's
exactly-2 slack slots (see the capacity policy in queries/__init__.py).

1. SCD2 interval construction (slowly-changing-dimension type 2):
   collapse a per-customer stream of observations into validity
   intervals [valid_from, valid_to) over which the observed attribute
   was constant — the gaps-and-islands pattern (change flag via LAG →
   running-sum segment id → per-segment MIN/MAX → LEAD for the closing
   bound). The natural companion of orders_latest_per_customer's
   snapshot view: that query answers "state now", this one answers
   "state as of any time T".

2. Nested array-of-structs analytics via higher-order functions:
   build each order's lineitems as a SORTED array<struct> and derive
   per-order facts with filter / exists / transform / aggregate — the
   HOF surface (SparkSQL lambda functions) no other registry entry
   exercises. The DuckDB oracle computes the same facts with plain
   grouped aggregation, which is the exactness point: HOFs over a
   per-key array must agree with the flat GROUP BY.

Cross-engine exactness discipline: money math in DECIMAL end-to-end
(array `aggregate` folds in array order — float would make the fold
order-sensitive, decimal is exact and order-free), surfaced as DOUBLE;
dates out as 'yyyy-MM-dd' strings; every aggregate aliased identically
in both engines; total output order via key columns.

Reference parity: composes the reference's Window/Group surfaces
(physical/Op.scala:30-150); SCD2 and nested-array analytics are
brief-mandated completeness (large-scale pipeline operations), not a
reference port.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.queries import load, register
from thundercats_spark.queries.tpch import _dec

# --------------------------------------------------------------------------
# SCD2: customer order-priority validity intervals.
# --------------------------------------------------------------------------

SCD2_SQL = """
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
  SELECT o_custkey, seg,
         MIN(o_orderpriority) AS priority,
         MIN(o_orderdate) AS vf,
         COUNT(*) AS n_obs
  FROM s GROUP BY o_custkey, seg
)
SELECT o_custkey,
       CAST(seg AS BIGINT) AS seg_id,
       priority,
       strftime(vf, '%Y-%m-%d') AS valid_from,
       COALESCE(
         strftime(LEAD(vf) OVER (PARTITION BY o_custkey ORDER BY seg),
                  '%Y-%m-%d'),
         '9999-12-31') AS valid_to,
       CAST(n_obs AS BIGINT) AS n_obs
FROM g ORDER BY o_custkey, seg_id
"""


def _scd2_segments(events, key: str, ts: str, attr: str, tiebreak: str):
    """Shared gaps-and-islands core: one row per maximal constant-attr
    run per key — (key, seg 1.., priority, vf, ls, n_obs) with
    timestamp-typed vf/ls bounds. Used by both the full build and the
    incremental batch merge so the run-splitting semantics cannot
    drift between them.

    NULL observation fields raise IN-PLAN (the part_affinity_lift
    raise_error pattern — no extra driver action): a NULL attr would
    otherwise silently fold into the previous run (prev != NULL is
    NULL → chg 0) and then split the NEXT row spuriously — the quiet
    wrong answer the sibling hierarchy/DAG operators' loud NULL
    contracts exist to prevent (review r09)."""
    any_null = (
        F.col(key).isNull()
        | F.col(ts).isNull()
        | F.col(attr).isNull()
        | F.col(tiebreak).isNull()
    )
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(attr).over(w)
    flagged = events.select(
        key, ts, attr,
        F.when(
            any_null,
            F.raise_error(
                F.lit(
                    "scd2: observation with NULL "
                    f"{key}/{ts}/{attr}/{tiebreak} — a NULL field is a "
                    "data bug (it would silently merge into the "
                    "previous run and split the next); filter or "
                    "repair the observations first"
                )
            ).cast("int"),
        )
        .when(prev.isNull() | (prev != F.col(attr)), 1)
        .otherwise(0)
        .alias("chg"),
        F.col(tiebreak).alias("_tb"),
    )
    return (
        flagged.withColumn(
            "seg",
            F.sum("chg").over(
                Window.partitionBy(key)
                .orderBy(ts, "_tb")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(key, "seg")
        .agg(
            F.min(attr).alias("priority"),
            F.min(ts).alias("vf"),
            F.max(ts).alias("ls"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def scd2_intervals(
    events,
    key: str,
    ts: str,
    attr: str,
    tiebreak: str,
    open_end: str = "9999-12-31",
    with_last_seen: bool = False,
):
    """Gaps-and-islands SCD2 build over an observation stream: one row
    per maximal run of constant `attr` per `key`, with
    [valid_from, valid_to) bounds (valid_to = next run's valid_from;
    `open_end` for the current run). ``with_last_seen=True`` appends a
    ``last_seen`` column (the run's latest observation day) — required
    by ``scd2_apply_batch``'s late-data guard; the default keeps the
    registered oracle shape.

    Scale posture: every window partitions on `key` — millions of small
    per-customer partitions, never a global sort partition (the
    no-partition-window class the plan gate bans). The segment group-by
    shuffles (key, seg) with map-side partial aggregation; the LEAD
    that closes intervals runs over the already-collapsed segment frame
    (|segments| ≤ |events| rows, typically far fewer). Three narrow
    shuffles on the same key, all AQE-coalesced — the shape survives
    100× because state per key is O(runs), not O(events).
    """
    seg = _scd2_segments(events, key, ts, attr, tiebreak)
    nxt = Window.partitionBy(key).orderBy("seg")
    cols = [
        key,
        F.col("seg").cast("long").alias("seg_id"),
        "priority",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("vf").over(nxt), "yyyy-MM-dd"),
            F.lit(open_end),
        ).alias("valid_to"),
        F.col("n_obs").cast("long").alias("n_obs"),
    ]
    if with_last_seen:
        cols.append(F.date_format("ls", "yyyy-MM-dd").alias("last_seen"))
    return seg.select(*cols).orderBy(key, "seg_id")


@register("customer_scd2_intervals", SCD2_SQL)
def customer_scd2_intervals(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")["orders"]
    return scd2_intervals(
        orders.select("o_custkey", "o_orderkey", "o_orderdate",
                      "o_orderpriority"),
        key="o_custkey", ts="o_orderdate", attr="o_orderpriority",
        tiebreak="o_orderkey",
    )


# --------------------------------------------------------------------------
# Nested array-of-structs per order + higher-order functions.
# --------------------------------------------------------------------------

NESTED_SQL = """
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS big_qty_items,
       BOOL_OR(l_returnflag = 'R') AS has_return,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS net_revenue,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS max_item_net
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


def nested_lineitem_facts(li):
    """Per-order facts derived ENTIRELY from a nested array<struct> via
    higher-order functions — size / filter / exists / transform /
    aggregate — checked against the flat GROUP BY oracle.

    The array is sorted on the (unique-per-order) line number so every
    array-order-dependent step is deterministic; the `aggregate` fold
    accumulates DECIMAL, so even the fold order cannot matter. All
    lambda work is JVM whole-stage-codegen expression evaluation — no
    Python UDF anywhere.

    Scale posture: ONE shuffle (groupBy orderkey, collect_list) builds
    the nested rows; every HOF then runs narrow over the grouped row —
    this is exactly the layout a document/training-record store keeps,
    where the nesting is already materialized and the HOF pass is
    shuffle-free. Arrays are bounded by lines-per-order (≤7 in TPC-H),
    not data volume.
    """
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").alias("qty"),
        _dec("l_extendedprice").alias("price"),
        _dec("l_discount").alias("disc"),
        F.col("l_returnflag").alias("rf"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(item)).alias("items")
    )
    net = lambda x: x["price"] * (F.lit(1) - x["disc"])  # noqa: E731
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.size(F.filter("items", lambda x: x["qty"] >= 30))
        .cast("long")
        .alias("big_qty_items"),
        F.exists("items", lambda x: x["rf"] == "R").alias("has_return"),
        F.aggregate(
            "items",
            F.lit(0).cast("decimal(30,4)"),
            lambda acc, x: (acc + net(x)).cast("decimal(30,4)"),
        )
        .cast("double")
        .alias("net_revenue"),
        F.array_max(F.transform("items", net))
        .cast("double")
        .alias("max_item_net"),
    ).orderBy("l_orderkey")


@register("orders_nested_lineitems", NESTED_SQL)
def orders_nested_lineitems(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return nested_lineitem_facts(li)


def scd2_as_of(intervals, at: str, key: str = "o_custkey"):
    """Point-in-time consumption of ``scd2_intervals`` output: the one
    row per key whose [valid_from, valid_to) interval covers ``at``
    (an ISO 'YYYY-MM-DD' string — the intervals carry ISO-string
    bounds, which compare correctly lexicographically, including the
    '9999-12-31' open-end sentinel). Keys whose first observation is
    after ``at`` are absent — there WAS no state then.

    Scale posture: a pure filter over the (already small) interval
    table — no join, no shuffle; at 100 TB the interval table is
    O(attribute runs), orders below the fact table, and a predicate on
    two string columns pushes down to its parquet scan."""
    return intervals.where(
        (F.col("valid_from") <= F.lit(at)) & (F.lit(at) < F.col("valid_to"))
    ).select(key, "priority", "valid_from", "valid_to")


def scd2_apply_batch(
    intervals,
    batch,
    key: str,
    ts: str,
    attr: str,
    tiebreak: str,
    open_end: str = "9999-12-31",
):
    """Incremental SCD2 maintenance: merge a batch of NEW observations
    into an existing interval table (built with ``with_last_seen=True``)
    WITHOUT rescanning raw history — the updated table equals a full
    rebuild over (history ∪ batch), which the tests pin as the
    equivalence contract.

    Append-only contract, enforced loudly: every batch observation for
    a known key must land on a day STRICTLY AFTER that key's
    ``last_seen`` (open-segment) day. A same-day or earlier arrival
    cannot be ordered against observations already folded into the
    aggregate (the interval table keeps runs, not raw rows), so it
    raises with the remedy — rebuild the affected keys from raw
    observations via ``scd2_intervals``. Exact-once note: re-applying
    the SAME batch trips this guard too, which makes accidental replay
    loud rather than silently double-counted.

    Mechanics: the batch alone runs through the shared gaps-and-islands
    core (one run per key per constant-attr stretch); run 1 MERGES into
    the key's open segment when the attr matches (n_obs accumulates,
    last_seen advances) or CLOSES it at run 1's valid_from otherwise;
    later runs append with seg_ids continuing from the open segment's.

    Scale posture: cost is O(batch + touched keys) — the batch
    segments shuffle on key, the open-segment slice joins on key
    (AQE-broadcast when the touched-key set is small), and UNTOUCHED
    keys pass through as a pure anti-join filter over the interval
    table scan, never re-aggregated. The interval table itself is
    O(attribute runs) — orders below the raw history this operator
    exists to avoid rescanning.
    """
    if "last_seen" not in intervals.columns:
        raise ValueError(
            "scd2_apply_batch needs an interval table built with "
            "scd2_intervals(..., with_last_seen=True) — the last_seen "
            "column is the late-data guard's reference point"
        )
    closed = intervals.where(F.col("valid_to") != open_end)
    open_ = intervals.where(F.col("valid_to") == open_end)

    b = _scd2_segments(batch, key, ts, attr, tiebreak).select(
        key,
        F.col("seg").alias("bseg"),
        "priority",
        F.date_format("vf", "yyyy-MM-dd").alias("vf"),
        F.date_format("ls", "yyyy-MM-dd").alias("ls"),
        "n_obs",
    )
    j = b.join(
        open_.select(
            key,
            F.col("seg_id").alias("open_seg"),
            F.col("priority").alias("open_attr"),
            F.col("valid_from").alias("open_vf"),
            F.col("n_obs").alias("open_n"),
            F.col("last_seen").alias("open_ls"),
        ),
        key,
        "left",
    ).localCheckpoint()

    late = j.where(
        (F.col("bseg") == 1)
        & F.col("open_ls").isNotNull()
        & (F.col("vf") <= F.col("open_ls"))
    )
    n_late = late.count()
    if n_late:
        ex = late.select(key, "vf", "open_ls").head(3)
        raise ValueError(
            f"{n_late} key(s) with batch observations on/before their "
            f"last_seen day (e.g. {[tuple(r) for r in ex]}): the "
            "interval table keeps runs, not raw rows, so same-day or "
            "late arrivals cannot be ordered against already-folded "
            "observations — rebuild the affected keys from raw "
            "observations with scd2_intervals (this also fires on a "
            "replayed batch, making accidental re-application loud)"
        )

    merged = (F.col("bseg") == 1) & (F.col("open_attr") == F.col("priority"))
    wk = Window.partitionBy(key)
    nxtb = Window.partitionBy(key).orderBy("bseg")
    j2 = (
        j.withColumn("merged", merged)
        .withColumn(
            "key_merged", F.max(F.col("merged").cast("int")).over(wk) == 1
        )
        .withColumn("base", F.coalesce(F.col("open_seg"), F.lit(0)))
    )
    seg_id = F.when(F.col("merged"), F.col("open_seg")).otherwise(
        F.col("base")
        + F.col("bseg")
        - F.when(F.col("key_merged"), 1).otherwise(0)
    )
    updated = j2.select(
        key,
        seg_id.cast("long").alias("seg_id"),
        "priority",
        F.when(F.col("merged"), F.col("open_vf"))
        .otherwise(F.col("vf"))
        .alias("valid_from"),
        F.coalesce(F.lead("vf").over(nxtb), F.lit(open_end)).alias(
            "valid_to"
        ),
        F.when(F.col("merged"), F.col("open_n") + F.col("n_obs"))
        .otherwise(F.col("n_obs"))
        .cast("long")
        .alias("n_obs"),
        F.col("ls").alias("last_seen"),
    )
    touched = b.where(F.col("bseg") == 1).select(
        key, F.col("vf").alias("first_vf")
    )
    # non-merged open rows CLOSE at the batch's first run
    open_closed = (
        open_.join(touched, key)
        .join(j2.where("merged").select(key).distinct(), key, "left_anti")
        .select(
            key, "seg_id", "priority", "valid_from",
            F.col("first_vf").alias("valid_to"), "n_obs", "last_seen",
        )
    )
    open_untouched = open_.join(touched.select(key), key, "left_anti")
    return (
        closed.unionByName(open_untouched)
        .unionByName(open_closed)
        .unionByName(updated)
    )


def scd2_state(path: str) -> dict:
    """The state doc last committed with the SCD2 table (empty if
    none) — e.g. the streaming sink's last-merged batch id."""
    import json
    import os

    try:
        with open(os.path.join(path, "_scd2_state.json")) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def scd2_update_parquet(
    spark,
    batch,
    path: str,
    key: str,
    ts: str,
    attr: str,
    tiebreak: str,
    state_doc: dict | None = None,
    open_end: str = "9999-12-31",
) -> None:
    """Maintain a PERSISTED SCD2 interval table at ``path``: first call
    builds it from the batch (``scd2_intervals(with_last_seen=True)``),
    later calls fold new observations in via ``scd2_apply_batch``.

    Crash/replay safety mirrors ``rollup_update``: the updated table is
    staged to a sibling directory and published by the same atomic
    two-rename swap (``_swap_dir``; interrupted swaps are repaired
    before reading), and an optional ``state_doc`` (e.g.
    ``{"batch_id": 7}``) rides INSIDE the swapped directory — a replay
    carrying the already-committed state_doc is a no-op, and
    ``scd2_apply_batch``'s strictly-later guard backstops any replay
    the state check misses (loud, never double-folded)."""
    import json
    import os

    from thundercats_spark.operators.incremental import (
        _recover_swap,
        _swap_dir,
    )

    _recover_swap(path)
    if os.path.isdir(path):
        if state_doc is not None and scd2_state(path) == state_doc:
            return  # replay of the already-committed batch
        updated = scd2_apply_batch(
            spark.read.parquet(path), batch,
            key=key, ts=ts, attr=attr, tiebreak=tiebreak,
            open_end=open_end,
        )
    else:
        updated = scd2_intervals(
            batch, key=key, ts=ts, attr=attr, tiebreak=tiebreak,
            open_end=open_end, with_last_seen=True,
        )
    staging = path + ".staging"
    updated.write.mode("overwrite").parquet(staging)
    if state_doc is not None:
        with open(os.path.join(staging, "_scd2_state.json"), "w") as f:
            json.dump(state_doc, f)
    _swap_dir(staging, path)


def scd2_join_facts(
    facts,
    intervals,
    key: str,
    fact_ts: str,
    prefix: str = "dim_",
):
    """Point-in-time dimension enrichment: join each fact row to the
    interval VALID AT ITS OWN timestamp — the consumption pattern SCD2
    exists for (e.g. revenue by the priority tier the customer was in
    WHEN each order was placed, not the tier they hold today). Facts
    whose key has no covering interval (before first observation, or
    unknown key) keep NULL dimension columns — visible, not dropped.

    Spark-first shape: an equi-join on ``key`` with the interval
    containment as a residual join condition — planned as a regular
    hash/sort-merge join on the key (NEVER a broadcast-nested-loop
    range join), with the containment filtering each key's handful of
    interval rows post-match. Per-key interval counts are O(attribute
    runs), so the residual fan-out is bounded; the interval side is
    typically dim-sized and AQE-broadcastable."""
    dim = intervals.select(
        F.col(key).alias("__k"),
        F.col("seg_id").alias(f"{prefix}seg_id"),
        F.col("priority").alias(f"{prefix}value"),
        F.col("valid_from").alias(f"{prefix}valid_from"),
        F.col("valid_to").alias(f"{prefix}valid_to"),
    )
    day = F.date_format(F.col(fact_ts), "yyyy-MM-dd")
    cond = (
        (facts[key] == dim["__k"])
        & (dim[f"{prefix}valid_from"] <= day)
        & (day < dim[f"{prefix}valid_to"])
    )
    return facts.join(dim, cond, "left").drop("__k")
