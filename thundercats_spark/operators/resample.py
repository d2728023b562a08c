"""Time-series resampling — regularize an event stream onto a fixed
grid with forward fill (the `asof`-style gap filling a feature-store
pipeline needs before windowed training data extraction).

Formulation: per key, generate the time grid with ``sequence()`` +
``explode`` (JVM-side, no driver loop), union with the observations,
and forward-fill via ``last(ignorenulls)`` over one ordered window —
the same single-shuffle union trick as operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    align: str = "hour",
) -> DataFrame:
    """→ (key, grid_ts, value) — one row per key per grid step between
    the key's first and last observation (grid aligned by truncating to
    ``align``), value = most recent observation at or before the grid
    point. Exactly one shuffle (the per-key window)."""
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(align, F.min(ts_col)).alias("__t0"),
        F.date_trunc(align, F.max(ts_col)).alias("__t1"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )
    obs = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
        F.lit(0).alias("__is_grid"),
    )
    grid_rows = grid.select(
        F.col(key_col),
        F.col("grid_ts").alias("__ts"),
        F.lit(None).cast(df.schema[value_col].dataType).alias("__v"),
        F.lit(1).alias("__is_grid"),
    )
    # observations sort before grid points at equal ts → `<=` fill
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__ts").asc(), F.col("__is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        obs.unionByName(grid_rows)
        .withColumn("value", F.last("__v", ignorenulls=True).over(w))
        .where(F.col("__is_grid") == 1)
        .select(key_col, F.col("__ts").alias("grid_ts"), "value")
    )
    return filled
