"""Text preprocessing (reference preprocess/Text.scala + extensions).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thundercats_spark.functional.maybe import MayFail


def trim(df: DataFrame, c: str) -> MayFail[DataFrame]:
    """Reference Text.trim (Text.scala:20)."""
    return MayFail.of(lambda: df.withColumn(c, F.trim(F.col(c))))


def lower(df: DataFrame, c: str) -> MayFail[DataFrame]:
    return MayFail.of(lambda: df.withColumn(c, F.lower(F.col(c))))


def normalize_whitespace(df: DataFrame, c: str) -> MayFail[DataFrame]:
    return MayFail.of(
        lambda: df.withColumn(c, F.regexp_replace(F.trim(F.col(c)), r"\s+", " "))
    )


def strip_punct(df: DataFrame, c: str) -> MayFail[DataFrame]:
    return MayFail.of(
        lambda: df.withColumn(c, F.regexp_replace(F.col(c), r"[^\w\s]", ""))
    )
