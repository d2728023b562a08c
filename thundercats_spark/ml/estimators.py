"""Custom pipeline stages (reference estimator/*.scala), as native
pyspark.ml Transformers so they compose in Pipelines:

- ColumnRename  (estimator/ColumnRename.scala)
- Scaler        (estimator/Scaler.scala: [0,1] rescale and/or log scale)
- ZStandardScaler (estimator/StandardScaler.scala: per-column z-score on
  plain numeric columns — spark.ml's StandardScaler needs a vector)
- StringEncoder (estimator/StringEncoder.scala: tokenize + murmur-hash
  each token → array<double>; F.hash IS Murmur3)
- DebugStep     (estimator/DebugStep.scala)
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _InOutParams(Params):
    inputCol = Param(Params._dummy(), "inputCol", "input column", TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol", "output column", TypeConverters.toString)

    def set_io(self, input_col: str, output_col: str | None):
        self._set(inputCol=input_col, outputCol=output_col or input_col)
        return self

    @property
    def in_col(self) -> str:
        return self.getOrDefault(self.inputCol)

    @property
    def out_col(self) -> str:
        return self.getOrDefault(self.outputCol)


class ColumnRename(Transformer, _InOutParams, DefaultParamsReadable, DefaultParamsWritable):
    @keyword_only
    def __init__(self, inputCol: str = None, outputCol: str = None):
        super().__init__()
        self.set_io(inputCol, outputCol)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumnRenamed(self.in_col, self.out_col)


class Scaler(Transformer, _InOutParams, DefaultParamsReadable, DefaultParamsWritable):
    """Rescale to [0,1] (min-max) and/or log10 scale, like the
    reference Scaler's ``normalise``/``logScale`` flags. Min/max are
    computed per-transform as a single agg (two scan passes total)."""

    normalise = Param(Params._dummy(), "normalise", "min-max rescale", TypeConverters.toBoolean)
    logScale = Param(Params._dummy(), "logScale", "log10 first", TypeConverters.toBoolean)

    @keyword_only
    def __init__(
        self,
        inputCol: str = None,
        outputCol: str = None,
        normalise: bool = True,
        logScale: bool = False,
    ):
        super().__init__()
        self.set_io(inputCol, outputCol)
        self._set(normalise=normalise, logScale=logScale)

    def _transform(self, df: DataFrame) -> DataFrame:
        c = F.col(self.in_col).cast("double")
        if self.getOrDefault(self.logScale):
            c = F.log10(c)
        if self.getOrDefault(self.normalise):
            row = df.select(
                F.min(c).alias("mn"), F.max(c).alias("mx")
            ).first()
            mn, mx = row["mn"], row["mx"]
            span = (mx - mn) or 1.0
            c = (c - F.lit(mn)) / F.lit(span)
        return df.withColumn(self.out_col, c)


class ZStandardScaler(Transformer, _InOutParams, DefaultParamsReadable, DefaultParamsWritable):
    """Zero mean, unit variance on a plain numeric column."""

    @keyword_only
    def __init__(self, inputCol: str = None, outputCol: str = None):
        super().__init__()
        self.set_io(inputCol, outputCol)

    def _transform(self, df: DataFrame) -> DataFrame:
        c = F.col(self.in_col).cast("double")
        row = df.select(F.avg(c).alias("mu"), F.stddev_pop(c).alias("sd")).first()
        sd = row["sd"] or 1.0
        return df.withColumn(self.out_col, (c - F.lit(row["mu"])) / F.lit(sd))


class StringEncoder(Transformer, _InOutParams, DefaultParamsReadable, DefaultParamsWritable):
    """Whitespace-tokenize and murmur-hash each token into a bounded
    double (reference StringEncoder "Murmur Hashing"). Pure column
    expressions — no UDF."""

    numBuckets = Param(Params._dummy(), "numBuckets", "hash space", TypeConverters.toInt)

    @keyword_only
    def __init__(self, inputCol: str = None, outputCol: str = None, numBuckets: int = 1 << 20):
        super().__init__()
        self.set_io(inputCol, outputCol)
        self._set(numBuckets=numBuckets)

    def _transform(self, df: DataFrame) -> DataFrame:
        n = self.getOrDefault(self.numBuckets)
        toks = F.split(F.trim(F.col(self.in_col)), r"\s+")
        hashed = F.transform(toks, lambda t: F.pmod(F.hash(t), F.lit(n)).cast("double"))
        return df.withColumn(self.out_col, hashed)


class DebugStep(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Pass-through stage that prints schema + a sample (reference
    estimator/DebugStep.scala)."""

    def _transform(self, df: DataFrame) -> DataFrame:
        df.printSchema()
        df.show(3, truncate=True)
        return df
