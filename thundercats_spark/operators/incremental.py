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
