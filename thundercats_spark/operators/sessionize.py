"""Gap-based sessionization (batch).

Assigns a session id per user: a new session starts after ``gap_minutes``
of inactivity. Classic lag + running-sum formulation: exactly ONE
shuffle (hash on the user column for the window), everything else is
whole-stage-codegen window evaluation — no Python, no state store.
Streaming variant lives in thundercats_spark/streaming/.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from thundercats_spark.physical.util import epoch_us


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Add ``session_col``: 1-based session counter per user.

    Both windows share the same partitioning (``user_col``) so Catalyst
    plans a single exchange and evaluates the two window functions in
    one pass."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap_us = int(gap_minutes * 60_000_000)  # integer micros: exact compare
    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        epoch_us(ts_col) - epoch_us(prev_ts) <= gap_us, F.lit(0)
    ).otherwise(F.lit(1))
    running = Window.partitionBy(user_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_sess).over(running))
