"""SCD2 (slowly-changing-dimension type-2) operator family.

Build, query, and MAINTAIN validity-interval tables over per-key
observation streams:

- ``scd2_intervals``   — full gaps-and-islands build (LAG change flag →
  running-sum segment id → per-segment MIN/MAX → LEAD closing bound);
  every window partitions on the key, the plan rides ONE key exchange.
- ``scd2_as_of``       — shuffle-free point-in-time snapshot filter.
- ``scd2_join_facts``  — fact enrichment by the dimension version valid
  at each fact's OWN timestamp (equi-join + residual containment).
- ``scd2_apply_batch`` — incremental maintenance in O(batch + touched
  keys) with a loud strictly-later contract (equal to the full rebuild,
  property-pinned in tests).
- ``scd2_update_parquet`` / ``scd2_state`` — persisted-table
  maintenance via the atomic two-rename swap + in-directory state doc
  (the ``rollup_update`` discipline); ``streaming/windows.py``
  ``stream_scd2_parquet`` is the foreachBatch sink on top.

The registered query wrapper and its DuckDB oracle stay in
``queries/analytics7.py`` (review r09: the operator machinery moved
here beside its ``operators/incremental.py`` kin, so consumers need
not import a registry module with registration side-effects).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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
    # "chg"/"seg" are computed INTERNALLY on the flagged frame. Keeping
    # the caller's original tiebreak attribute in that frame (the r11
    # sort-elision — see the select below) means a caller column
    # literally named "chg" or "seg" would collide: two "chg" columns
    # make the seg window's sum/orderBy references ambiguous
    # (AnalysisException at best, silent mis-binding at worst). Loud
    # guard instead (ADVICE r11).
    reserved = {"chg", "seg"} & {key, ts, attr, tiebreak}
    if reserved:
        raise ValueError(
            f"scd2: observation column(s) {sorted(reserved)} clash with "
            "the operator's internal helper columns ('chg', 'seg') — "
            "rename them upstream (e.g. .withColumnRenamed) before "
            "building intervals"
        )
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
        # keep the ORIGINAL tiebreak attribute (not an alias): the seg
        # window below then orders by the exact same attribute ids as
        # the lag window above, and the planner elides the second
        # within-partition sort (an aliased copy is a different
        # attribute to the planner and forced a full re-sort per key —
        # r11 plan audit)
        *([tiebreak] if tiebreak not in (key, ts, attr) else []),
    )
    return (
        flagged.withColumn(
            "seg",
            F.sum("chg").over(
                Window.partitionBy(key)
                .orderBy(ts, tiebreak)
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
    sort: bool = True,
):
    """Gaps-and-islands SCD2 build over an observation stream: one row
    per maximal run of constant `attr` per `key`, with
    [valid_from, valid_to) bounds (valid_to = next run's valid_from;
    `open_end` for the current run). ``with_last_seen=True`` appends a
    ``last_seen`` column (the run's latest observation day) — required
    by ``scd2_apply_batch``'s late-data guard; the default keeps the
    registered oracle shape.

    ``sort=False`` skips the trailing presentation ``orderBy(key,
    seg_id)`` — a full range sort that deterministic consumers (the
    registered query, reports) want but PERSISTED paths don't: the
    atomic-swap parquet write needs no order, so
    ``scd2_update_parquet``'s first build passes ``sort=False`` and
    its write plan carries no range exchange (VERDICT r09 nit,
    plan-pinned in tests).

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
    out = seg.select(*cols)
    return out.orderBy(key, "seg_id") if sort else out


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
        # sort=False: the swap-published parquet needs no order, so the
        # first build skips scd2_intervals' presentation range sort
        updated = scd2_intervals(
            batch, key=key, ts=ts, attr=attr, tiebreak=tiebreak,
            open_end=open_end, with_last_seen=True, sort=False,
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
