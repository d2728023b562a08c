"""As-of join — for each left row, the most recent right row with
``right_ts <= left_ts`` on a matching key.

Spark has no built-in as-of join; the naive formulation
(range-condition join + per-row max) explodes row counts before
pruning. This implements the scalable UNION formulation instead:

  1. tag left and right rows, align schemas, union;
  2. one window over (key, ts): ``last(right_payload, ignorenulls)``
     carries the latest right values forward;
  3. keep the left rows.

Cost: ONE shuffle on the key column, zero row amplification — the same
technique pandas' merge_asof uses, distributed. At equal timestamps the
right row sorts first, so ``<=`` semantics hold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    tie_breakers: Sequence[str] = (),
    keep_unmatched: bool = False,
) -> DataFrame:
    """Columns of ``right`` other than key/ts/tie-breakers are appended
    to matched left rows; unmatched left rows are dropped unless
    ``keep_unmatched`` (then right cols are null)."""
    r_payload = [c for c in right.columns if c not in {right_on}]
    l_cols = left.columns

    lt = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in r_payload],
    )
    rt = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c) for c in r_payload],
    )
    unioned = lt.unionByName(rt)

    # Right rows sort before left rows at equal ts → `<=` as-of semantics.
    order = [F.col("__ts").asc(), F.col("__is_left").asc()] + [
        F.col(c).asc() for c in tie_breakers
    ]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_left",
        *[F.col(c) for c in l_cols],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in r_payload],
    )
    out = filled.where(F.col("__is_left") == 1).drop("__is_left")
    if not keep_unmatched:
        ts_payload = right_ts if right_ts in r_payload else r_payload[0]
        out = out.where(F.col(ts_payload).isNotNull())
    return out
