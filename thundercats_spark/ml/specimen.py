"""Specimen — a trained model (reference evaluation/Specimen.scala).

``score(df, measure)`` transforms the df with the fitted pipeline and
hands it to the measure; ``DummySpecimen`` uses a raw column as the
"prediction" (reference DummyModelDesign → DummySpecimen), which lets
feature-vs-label measures (e.g. PearsonCorr) run without any training.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame

from thundercats_spark.functional.maybe import MayFail
from thundercats_spark.ml.feature import FeatureColumn


@dataclass
class Specimen:
    model: PipelineModel | None
    feature: FeatureColumn
    output_col: str
    label_col: str

    def transform(self, df: DataFrame) -> DataFrame:
        return self.model.transform(df) if self.model is not None else df

    def score(self, df: DataFrame, measure) -> MayFail[float]:
        return measure.score(self.transform(df), self)

    def score_vector(self, df: DataFrame, measure_vector) -> MayFail[list[float]]:
        return measure_vector.score(self.transform(df), self)

    def threshold_scores(self, df: DataFrame, measure) -> MayFail[dict[float, float]]:
        """Reference ``%%``: threshold → score map for classification."""
        return measure.threshold_scores(self.transform(df), self)


@dataclass
class DummySpecimen(Specimen):
    """No model: the feature column itself is the prediction."""

    def __init__(self, feature: FeatureColumn, label_col: str, output_col: str | None = None):
        super().__init__(
            model=None,
            feature=feature,
            output_col=output_col or feature.col_name(),
            label_col=label_col,
        )


def fitted_estimator(model: PipelineModel) -> Any:
    """The innermost final-stage transformer (reference
    Pipe.fittedEstimator): unwraps nested PipelineModels so e.g. the
    LinearRegressionModel is reachable for coefficient-based measures."""
    last = model.stages[-1]
    while isinstance(last, PipelineModel):
        last = last.stages[-1]
    return last
