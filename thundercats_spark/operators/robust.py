"""Robust (median/MAD) outlier statistics per group — the corpus-QA
pass that decides which documents a quality-score distribution calls
anomalous BEFORE anyone hand-picks a magic threshold. Mean/stddev
cutoffs are circular at web scale (the outliers they hunt drag the
mean and inflate the stddev); the robust pair — median and the median
absolute deviation — has a 50% breakdown point, so a badly polluted
source still yields a usable center and spread.

Scale shape: both medians ride the distributed exact-percentile
machinery (``operators/ranking.py``) with DISCRETE semantics
(``percentile_disc``: the answer is an ACTUAL data value, not an
interpolated synthetic), so nothing buffers a group's full value set
in one reducer and — critically for the DuckDB-oracle gate — every
downstream arithmetic step (``|v - med|``, ``dev > k*mad``) is the
same IEEE operation on the same inputs in both engines. Interpolated
(cont) medians can differ in the last ulp across engines depending on
the interpolation formula; a threshold comparison against them can
flip a row's classification. Discrete medians cannot.

Cost: the narrow (group, value) projection is scanned once (persisted
internally for its three consumers), two grouped rankings (one shuffle
each, driver math bounded by ``max_groups``), one broadcast-joined
final aggregate.

Reference parity: no counterpart (the reference has no robust-stats
layer); part of the brief's training-data quality surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thundercats_spark.operators.ranking import exact_percentiles_grouped


def mad_outlier_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.0,
    n_partitions: int | None = None,
    max_groups: int = 100_000,
    tie_break_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group robust outlier report: for each group, the discrete
    median of ``value_col``, the discrete median absolute deviation
    from it, and how many rows sit strictly beyond ``k * MAD`` of the
    median. Returns ``(group_cols..., n, med, mad, n_outliers,
    outlier_rate)`` — all scalars, ordered by group.

    NULL values are ignored (aggregate semantics); NULL group keys
    raise (the ranking module's loud-NULL contract). A constant-valued
    group has ``mad = 0`` and zero outliers (``dev > 0`` is False at
    the median, and every row IS the median). ``k`` must be finite and
    non-negative. ``tie_break_cols`` spreads heavily-tied values
    across ranking buckets; pass the table's primary key for
    low-cardinality scores.
    """
    import math

    if not math.isfinite(k) or k < 0:
        raise ValueError(f"k must be finite and >= 0, got {k}")
    gcols = list(group_cols)
    reserved = {"n", "med", "mad", "n_outliers", "outlier_rate"} & set(gcols)
    if reserved:
        raise ValueError(
            f"group column(s) {sorted(reserved)} collide with the "
            "output columns — rename them first"
        )
    tb = list(tie_break_cols)
    vals = df.select(
        *gcols, F.col(value_col).cast("double").alias("__v"), *tb
    ).where(F.col("__v").isNotNull())
    # Narrow projection feeds the median ranking, the deviation build,
    # and the final count — persist so the (possibly expression-heavy)
    # upstream scan runs once.
    vals = vals.persist()
    try:
        med = exact_percentiles_grouped(
            vals, gcols, "__v", [0.5],
            n_partitions=n_partitions, max_groups=max_groups,
            tie_break_cols=tb, mode="disc",
        ).select(*gcols, F.col("value").alias("med"))
        dev = vals.join(F.broadcast(med), gcols).withColumn(
            "__dev", F.abs(F.col("__v") - F.col("med"))
        )
        mad = exact_percentiles_grouped(
            dev, gcols, "__dev", [0.5],
            n_partitions=n_partitions, max_groups=max_groups,
            tie_break_cols=tb, mode="disc",
        ).select(*gcols, F.col("value").alias("mad"))
        out = (
            dev.join(F.broadcast(mad), gcols)
            .groupBy(*gcols)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.first("med").alias("med"),
                F.first("mad").alias("mad"),
                F.sum(
                    F.when(
                        F.col("__dev") > F.lit(float(k)) * F.col("mad"), 1
                    ).otherwise(0)
                ).alias("n_outliers"),
            )
            .withColumn(
                "outlier_rate",
                F.col("n_outliers") / F.col("n").cast("double"),
            )
            .orderBy(*gcols)
        )
        # Materialize before releasing the scan cache: the returned
        # frame's lineage would otherwise recompute the upstream scan
        # per action AND re-run the bounded driver collects above.
        rows = out.collect()
        return df.sparkSession.createDataFrame(rows, out.schema)
    finally:
        vals.unpersist()
