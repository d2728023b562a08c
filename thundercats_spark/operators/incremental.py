"""Incremental (high-watermark) batch processing.

The batch counterpart of streaming's checkpointing: process only rows
newer than the last successful run's watermark, then advance the
watermark — the standard shape for periodic ETL over an append-only
table without a streaming runtime.

Usage:

    inc = read_incremental(spark, events_path, state, ts_col="ts")
    ...process inc.frame...
    inc.commit()          # persist the new watermark ONLY after success

Scale: the watermark predicate is a pushed-down filter (min/max parquet
row-group stats prune old files entirely); state is a tiny JSON doc.
State commits are atomic (write-new + rename). Crash before commit →
the next run reprocesses the same window (at-least-once); pair with
``Write.upsert_parquet`` for effective exactly-once.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Incremental:
    """A pending incremental window: the filtered frame plus the
    watermark to persist once processing succeeds."""

    frame: DataFrame
    state_path: str
    new_watermark: str | None  # ISO string or numeric-as-string; None = no new rows

    def commit(self) -> None:
        if self.new_watermark is None:
            return
        d = os.path.dirname(self.state_path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"watermark": self.new_watermark}, f)
        os.replace(tmp, self.state_path)  # atomic on POSIX


def read_watermark(state_path: str) -> str | None:
    try:
        with open(state_path) as f:
            return json.load(f)["watermark"]
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        return None


def read_incremental(
    spark: SparkSession,
    path: str,
    state_path: str,
    ts_col: str,
) -> Incremental:
    """Rows with ``ts_col`` strictly greater than the stored watermark
    (everything on first run). The new watermark is the max ``ts_col``
    in the window — computed with one tiny agg (parquet footer stats
    make this cheap)."""
    df = spark.read.parquet(path)
    wm = read_watermark(state_path)
    if wm is not None:
        df = df.where(F.col(ts_col) > F.lit(wm).cast(df.schema[ts_col].dataType))
    row = df.agg(F.max(ts_col).alias("m")).first()
    new_wm = None if row["m"] is None else str(row["m"])
    return Incremental(frame=df, state_path=state_path, new_watermark=new_wm)


# --------------------------------------------------------------------------
# Incremental rollup maintenance (incremental view maintenance for
# distributive aggregates)
# --------------------------------------------------------------------------

_INIT = {
    "count": lambda c: F.count(F.lit(1) if c == "*" else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    # approx distinct via a MERGEABLE Datasketches HLL state: the
    # persisted rollup stores the binary sketch, so batches union
    # exactly like sums add — the only way a distinct-style metric can
    # be maintained incrementally without keeping raw keys around.
    # Read the estimate with ``hll_estimate``.
    "approx_distinct": lambda c: F.hll_sketch_agg(c),
}
# how two partial states of the same metric combine
_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "approx_distinct": lambda name: F.hll_union_agg(name),
}


def _rollup_aggs(metrics: dict[str, tuple[str, str]], init: bool):
    out = []
    for name, (fn, col) in metrics.items():
        if fn not in _INIT:
            raise ValueError(
                f"{fn!r} is not mergeable; supported: {sorted(_INIT)} "
                "(derive avg as sum/count at read time)"
            )
        expr = _INIT[fn](col) if init else _MERGE[fn](name)
        out.append(expr.alias(name))
    return out


def hll_estimate(df: DataFrame, *sketch_cols: str) -> DataFrame:
    """Replace persisted HLL sketch columns with their cardinality
    estimates (read-side helper for ``approx_distinct`` metrics)."""
    out = df
    for c in sketch_cols:
        out = out.withColumn(c, F.hll_sketch_estimate(F.col(c)))
    return out


def _swap_dir(new: str, target: str) -> None:
    """Replace ``target`` with ``new`` keeping a ``.old`` backup until
    the swap completes (same recovery discipline as
    ``Write.compact_delete``). A crash between the two renames leaves
    the target's only history in ``.old`` — every reader of a
    swap-maintained directory must run ``_recover_swap`` /
    ``_recover_partition_swaps`` BEFORE reading, or a post-crash merge
    reads an empty target while the history sits in the backup."""
    import shutil

    backup = target + ".old"
    if not os.path.exists(target) and os.path.isdir(backup):
        # an interrupted earlier swap parked the history in .old and
        # died before publishing its replacement; restore it rather
        # than deleting the only copy below. (The caller's staged data
        # still wins — it is renamed over target right after.)
        os.rename(backup, target)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    if os.path.exists(target):
        os.rename(target, backup)
    os.rename(new, target)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def _recover_swap(target: str) -> None:
    """Repair an interrupted ``_swap_dir`` on ``target``: restore the
    ``.old`` backup when the crash left target missing (the backup is
    the only history), drop the stale backup when the swap had already
    published. Idempotent; call before READING a swap-maintained dir —
    the merge/replay paths read target first, so recovery inside
    ``_swap_dir`` alone would be too late (review finding r05)."""
    import shutil

    backup = target + ".old"
    if not os.path.isdir(backup):
        return
    if os.path.exists(target):
        shutil.rmtree(backup)  # swap completed; cleanup died
    else:
        os.rename(backup, target)  # swap died between the two renames


def _recover_partition_swaps(root: str) -> None:
    """Run ``_recover_swap`` over every partition dir under ``root``
    that left a ``.old`` backup behind (partitioned rollups, persisted
    ANN indexes)."""
    if not os.path.isdir(root):
        return
    for entry in sorted(os.listdir(root)):
        if entry.endswith(".old") and os.path.isdir(os.path.join(root, entry)):
            _recover_swap(os.path.join(root, entry[: -len(".old")]))


def rollup_state(rollup_path: str) -> dict:
    """The state doc last committed with the rollup (empty if none) —
    e.g. the streaming sink's last-merged batch id."""
    try:
        with open(os.path.join(rollup_path, "_rollup_state.json")) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def rollup_update(
    spark: SparkSession,
    batch: DataFrame,
    rollup_path: str,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    partition_col: str | None = None,
    state_doc: dict | None = None,
) -> DataFrame:
    """Maintain an aggregate table incrementally: fold one ingestion
    batch into the persisted rollup at ``rollup_path`` without
    recomputing history — the batch counterpart of a streaming
    windowed agg with state.

    ``metrics`` maps output column -> (fn, source column) where fn is
    a DISTRIBUTIVE aggregate (count/sum/min/max — the class where
    merge(partial_a, partial_b) is exact; avg = sum/count at read).

    Scale shape: the batch is aggregated once (map-side partials, one
    shuffle on the group keys); when ``partition_col`` (one of
    ``keys``, e.g. the event date) is given, only the partitions the
    batch TOUCHES are read back, merged, and swapped — history
    partitions are never opened, so a daily batch costs O(batch +
    touched partitions), not O(table). The swap publishes each
    touched partition atomically with a ``.old`` backup (on an object
    store / multi-writer setup, use a transactional table format for
    the publish step instead).

    ``state_doc`` (e.g. ``{"batch_id": 7}``) is persisted as
    ``_rollup_state.json`` with the merge: in the unpartitioned path it
    rides the staged directory, so state and data publish in ONE atomic
    swap (the streaming sink's exactly-once hook). In the partitioned
    path the SAME doc is additionally journaled INSIDE each staged
    partition dir, so state and data swap atomically per partition —
    a replay after a crash mid-swap-loop skips the partitions already
    carrying this ``state_doc`` (their published data includes the
    batch; re-merging a sum/count would be permanent double-count
    corruption, not duplicate delivery) and completes only the
    missing ones. Replay correctness assumes the redelivered batch is
    identical, which Structured Streaming's checkpoint guarantees for
    a given batch_id — and requires the doc to UNIQUELY identify the
    batch: reusing one doc across different batches makes the guard
    treat the later batch as a replay and skip it (an empty doc is
    rejected outright for the same reason). Underscore-prefixed files
    are invisible to Spark's parquet reads.

    Returns the merged rollup rows for the touched scope (the whole
    table when unpartitioned)."""
    if partition_col is not None and partition_col not in keys:
        raise ValueError("partition_col must be one of the group keys")
    if state_doc is not None and not state_doc:
        # an empty doc would compare equal to rollup_state()'s
        # missing-journal {} and make the replay guard skip EVERY
        # partition — silently dropping the batch. The doc must
        # uniquely identify the batch (e.g. {"batch_id": n}).
        raise ValueError(
            "state_doc must be a non-empty dict uniquely identifying "
            "the batch (e.g. {'batch_id': n}); got an empty dict"
        )

    def write_state(target_dir: str) -> None:
        if state_doc is not None:
            with open(os.path.join(target_dir, "_rollup_state.json"), "w") as f:
                json.dump(state_doc, f)

    # repair any swap a previous run left half-done BEFORE reading the
    # rollup back — a crash between _swap_dir's two renames parks the
    # only history in .old, and merging against the missing/empty
    # target would lose it permanently.
    _recover_swap(rollup_path)
    if partition_col is not None:
        _recover_partition_swaps(rollup_path)

    partial = batch.groupBy(*keys).agg(*_rollup_aggs(metrics, init=True))
    exists = os.path.exists(rollup_path)

    if partition_col is None:
        merged = partial
        if exists:
            existing = spark.read.parquet(rollup_path)
            merged = (
                existing.unionByName(partial)
                .groupBy(*keys)
                .agg(*_rollup_aggs(metrics, init=False))
            )
        staging = rollup_path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        write_state(staging)  # state + data publish in one atomic swap
        _swap_dir(staging, rollup_path)
        return spark.read.parquet(rollup_path)

    # one materialization: the touched-partition collect AND the
    # staging write both consume `partial` — without the persist the
    # whole batch aggregation would execute twice per call (the
    # streaming sink runs this every micro-batch).
    partial = partial.persist()
    touched = [r[0] for r in partial.select(partition_col).distinct().collect()]
    if not touched:
        partial.unpersist()
        return spark.read.parquet(rollup_path) if exists else partial
    non_null = [v for v in touched if v is not None]
    # isin() never matches NULL — include the null partition explicitly
    # or its existing history would be dropped from the merge.
    touched_pred = F.col(partition_col).isin(non_null)
    if len(non_null) < len(touched):
        touched_pred = touched_pred | F.col(partition_col).isNull()
    merged = partial
    if exists:
        existing = spark.read.parquet(rollup_path).where(
            touched_pred  # partition-pruned read
        )
        merged = (
            existing.unionByName(partial)
            .groupBy(*keys)
            .agg(*_rollup_aggs(metrics, init=False))
        )
    staging = rollup_path + ".staging"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    os.makedirs(rollup_path, exist_ok=True)
    # Swap the partition dirs Spark ACTUALLY wrote (listed from staging)
    # rather than reconstructing names from values: Spark Hive-escapes
    # special chars (':' -> '%3A', null -> __HIVE_DEFAULT_PARTITION__),
    # and a reconstructed f"{col}={v}" name would miss those dirs —
    # silently deleting the merged batch with the staging cleanup.
    swapped = 0
    skipped = 0
    for entry in sorted(os.listdir(staging)):
        if entry.startswith(f"{partition_col}=") and os.path.isdir(
            os.path.join(staging, entry)
        ):
            target = os.path.join(rollup_path, entry)
            # Replay guard: a partition whose published per-partition
            # journal already carries THIS state_doc was swapped by a
            # previous (crashed) run of the same batch — its data
            # already includes the batch, and the staged re-merge for
            # it is double-counted. Skip it; swap only the missing
            # partitions.
            if state_doc is not None and rollup_state(target) == state_doc:
                skipped += 1
                continue
            write_state(os.path.join(staging, entry))  # journal rides the swap
            _swap_dir(os.path.join(staging, entry), target)
            swapped += 1
    if swapped == 0 and skipped == 0:
        raise RuntimeError(
            f"rollup staging wrote no {partition_col}= partition dirs under "
            f"{staging}; refusing to commit"
        )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    write_state(rollup_path)
    partial.unpersist()
    return spark.read.parquet(rollup_path).where(touched_pred)
