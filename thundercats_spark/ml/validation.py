"""Model validation (reference evaluation/Validation.scala):
train/test split and k-fold cross validation over a ModelDesign."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from thundercats_spark.functional.maybe import Fail, MayFail
from thundercats_spark.ml.design import ModelDesign
from thundercats_spark.ml.feature import FeatureColumn
from thundercats_spark.ml.measure import Measure


class SplitValidation:
    def __init__(self, measure: Measure, train_ratio: float = 0.9, seed: int = 42):
        self.measure = measure
        self.train_ratio = train_ratio
        self.seed = seed

    def run(self, df: DataFrame, design: ModelDesign, feature: FeatureColumn) -> MayFail[float]:
        if not 0.0 < self.train_ratio < 1.0:
            return Fail(AssertionError(f"out-of-range training ratio: {self.train_ratio}"))

        def go():
            train, test = df.randomSplit(
                [self.train_ratio, 1.0 - self.train_ratio], seed=self.seed
            )
            specimen = design.to_specimen(feature, train)
            return specimen.score(test, self.measure).get

        return MayFail.of(go)


class CrossValidation:
    def __init__(self, measure: Measure, n_folds: int = 3, seed: int = 42):
        self.measure = measure
        self.n_folds = n_folds
        self.seed = seed

    def run(self, df: DataFrame, design: ModelDesign, feature: FeatureColumn) -> MayFail[float]:
        def go():
            splits = df.randomSplit([1.0 / self.n_folds] * self.n_folds, seed=self.seed)
            scores = []
            for i in range(self.n_folds):
                train = reduce(
                    lambda a, b: a.union(b),
                    [s for j, s in enumerate(splits) if j != i],
                )
                specimen = design.to_specimen(feature, train)
                scores.append(specimen.score(splits[i], self.measure).get)
            return sum(scores) / self.n_folds

        return MayFail.of(go)
