"""Schema-driven pipeline generators (reference model/Feature.scala
``Features`` object): build Pipelines that encode every string column,
scale/standardise every numeric column, or assemble all vectorisable
columns — without naming columns by hand."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.ml import Pipeline
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    StringType,
)

from thundercats_spark.ml.estimators import Scaler, StringEncoder, ZStandardScaler


def encode_strings(
    df: DataFrame, suffix: str = "", ignore_columns: Iterable[str] = ()
) -> Pipeline:
    """Murmur-hash-encode every string column (reference
    Features.encodeStrings)."""
    skip = set(ignore_columns)
    stages = [
        StringEncoder(inputCol=f.name, outputCol=f.name + suffix)
        for f in df.schema.fields
        if isinstance(f.dataType, StringType) and f.name not in skip
    ]
    return Pipeline(stages=stages)


def standardise_numbers(
    df: DataFrame, suffix: str = "", ignore_columns: Iterable[str] = ()
) -> Pipeline:
    """Zero-mean/unit-variance every double column (reference
    Features.standardiseNumbers)."""
    skip = set(ignore_columns)
    stages = [
        ZStandardScaler(inputCol=f.name, outputCol=f.name + suffix)
        for f in df.schema.fields
        if isinstance(f.dataType, DoubleType) and f.name not in skip
    ]
    return Pipeline(stages=stages)


def scale_numbers(
    df: DataFrame,
    normalised: bool = True,
    log_scale: bool = False,
    suffix: str = "",
    ignore_columns: Iterable[str] = (),
) -> Pipeline:
    """Min-max and/or log-scale every double column (reference
    Features.scaleNumbers)."""
    skip = set(ignore_columns)
    stages = [
        Scaler(
            inputCol=f.name,
            outputCol=f.name + suffix,
            normalise=normalised,
            logScale=log_scale,
        )
        for f in df.schema.fields
        if isinstance(f.dataType, DoubleType) and f.name not in skip
    ]
    return Pipeline(stages=stages)


def vectorise(df: DataFrame, ignore_columns: Iterable[str] = ()) -> VectorAssembler:
    """Assemble every numeric / numeric-array column (sorted by name)
    into ``features`` (reference Features.vectorise)."""
    skip = set(ignore_columns)
    ok_scalar = (DoubleType, IntegerType, FloatType)
    cols = []
    for f in sorted(df.schema.fields, key=lambda x: x.name):
        if f.name in skip:
            continue
        if isinstance(f.dataType, ok_scalar):
            cols.append(f.name)
        elif isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, ok_scalar
        ):
            cols.append(f.name)
    return VectorAssembler(inputCols=cols, outputCol="features")
