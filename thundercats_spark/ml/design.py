"""Model blueprints (reference evaluation/ModelDesign.scala).

A ModelDesign is trained against a FeatureColumn + DataFrame to yield a
Specimen. Supervised/Unsupervised wrap a pyspark.ml Pipeline estimator;
Dummy trains nothing (raw column as prediction)."""

from __future__ import annotations

from dataclasses import dataclass, field

from typing import Any

from pyspark.ml import Pipeline

PipelineStage = Any  # pyspark 4 no longer exports PipelineStage
from pyspark.sql import DataFrame

from thundercats_spark.ml.feature import FeatureColumn
from thundercats_spark.ml.specimen import DummySpecimen, Specimen


@dataclass
class ModelDesign:
    output_col: str
    label_col: str

    def to_specimen(self, feature: FeatureColumn, df: DataFrame) -> Specimen:
        raise NotImplementedError


@dataclass
class DummyModelDesign(ModelDesign):
    def __init__(self, label_col: str):
        super().__init__(output_col="", label_col=label_col)

    def to_specimen(self, feature: FeatureColumn, df: DataFrame) -> Specimen:
        return DummySpecimen(feature, self.label_col)


@dataclass
class SupervisedModelDesign(ModelDesign):
    estimator: Pipeline = None
    feature_pipe: PipelineStage | None = None

    def to_specimen(self, feature: FeatureColumn, df: DataFrame) -> Specimen:
        pipe = feature.to_pipeline(self.estimator, pre_step=self.feature_pipe)
        fitted = pipe.fit(df)
        return Specimen(fitted, feature, self.output_col, self.label_col)


@dataclass
class UnsupervisedModelDesign(ModelDesign):
    estimator: Pipeline = None
    feature_pipe: PipelineStage | None = None

    def __init__(self, output_col: str, estimator: Pipeline, feature_pipe=None):
        super().__init__(output_col=output_col, label_col="")
        self.estimator = estimator
        self.feature_pipe = feature_pipe

    def to_specimen(self, feature: FeatureColumn, df: DataFrame) -> Specimen:
        pipe = feature.to_pipeline(self.estimator, pre_step=self.feature_pipe)
        fitted = pipe.fit(df)
        return Specimen(fitted, feature, self.output_col, self.label_col)
