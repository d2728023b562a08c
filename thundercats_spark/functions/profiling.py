"""Dataset profiling — the triage pass a pipeline runs before heavy
processing: per-column stats, approximate sketches, frequent items,
stratified samples. All single-pass aggregations (sketch-based where
exact would need a shuffle per column)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def summarize(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """One row per column: count, nulls, approx distinct (HLL++), and
    min/max/mean for numerics — all in a SINGLE aggregation pass over
    the data (one job, no per-column scans)."""
    aggs = []
    for f_ in df.schema.fields:
        c = f_.name
        aggs += [
            F.count(F.col(c)).alias(f"{c}__count"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__distinct"),
        ]
        if isinstance(f_.dataType, NumericType):
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"),
            ]
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = []
    for f_ in df.schema.fields:
        c = f_.name
        numeric = isinstance(f_.dataType, NumericType)
        out.append(
            (
                c,
                f_.dataType.simpleString(),
                row[f"{c}__count"],
                row[f"{c}__nulls"],
                row[f"{c}__distinct"],
                row[f"{c}__min"] if numeric else None,
                row[f"{c}__max"] if numeric else None,
                row[f"{c}__mean"] if numeric else None,
            )
        )
    return spark.createDataFrame(
        out,
        "column string, dtype string, count long, nulls long, "
        "approx_distinct long, min double, max double, mean double",
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: Sequence[float] = (0.25, 0.5, 0.75), rel_err: float = 0.01
) -> list[float]:
    """Greenwald-Khanna sketch quantiles (single pass, mergeable)."""
    return df.approxQuantile(col, list(probs), rel_err)


def freq_items(df: DataFrame, cols: Sequence[str], support: float = 0.01) -> DataFrame:
    """Misra-Gries heavy hitters per column."""
    return df.freqItems(list(cols), support)


def crosstab(df: DataFrame, c1: str, c2: str) -> DataFrame:
    return df.crosstab(c1, c2)


def sample_by(df: DataFrame, col: str, fractions: dict, seed: int = 42) -> DataFrame:
    """Stratified sample without replacement per key value."""
    return df.sampleBy(col, fractions, seed)


def null_ratio(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    cols = cols or df.columns
    aggs = [
        (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / F.count(F.lit(1))).alias(c)
        for c in cols
    ]
    return df.agg(*aggs)
