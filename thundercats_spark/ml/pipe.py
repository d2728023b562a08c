"""Pipeline surgery helpers (reference model/Pipe.scala): compose, split,
persist, and rewire pyspark.ml Pipelines as MayFail values."""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.base import Estimator, Transformer

from thundercats_spark.functional.maybe import MayFail


def join(*pipes: Pipeline) -> MayFail[Pipeline]:
    """Nest pipelines into one (reference Pipe.join)."""
    return MayFail.of(lambda: Pipeline(stages=list(pipes)))


def load(file_path: str) -> MayFail[PipelineModel]:
    return MayFail.of(lambda: PipelineModel.load(file_path))


def save(file_path: str, pipe: PipelineModel) -> MayFail[PipelineModel]:
    def run():
        pipe.write().overwrite().save(file_path)
        return pipe

    return MayFail.of(run)


def estimator(pipe: Pipeline) -> MayFail[Pipeline]:
    """Last Estimator stage, rewrapped (reference Pipe.estimator)."""

    def run():
        ests = [s for s in pipe.getStages() if isinstance(s, Estimator)]
        return Pipeline(stages=[ests[-1]])

    return MayFail.of(run)


def fitted_estimator(model: PipelineModel) -> MayFail[Transformer]:
    """Innermost final transformer (reference Pipe.fittedEstimator)."""

    def run():
        last = model.stages[-1]
        while isinstance(last, PipelineModel):
            last = last.stages[-1]
        return last

    return MayFail.of(run)


def without_estimator(pipe: Pipeline) -> MayFail[Pipeline]:
    """Keep only the Transformer stages (reference Pipe.withoutEstimator)."""
    return MayFail.of(
        lambda: Pipeline(
            stages=[s for s in pipe.getStages() if isinstance(s, Transformer)]
        )
    )


def add(pipe: Pipeline, stage) -> MayFail[Pipeline]:
    return MayFail.of(lambda: Pipeline(stages=[*pipe.getStages(), stage]))


def prepend(pipe: Pipeline, stage) -> MayFail[Pipeline]:
    return MayFail.of(lambda: Pipeline(stages=[stage, *pipe.getStages()]))


def set_input_col(pipe: Pipeline, input_col: str) -> MayFail[Pipeline]:
    """Rewire the final stage's input column if it has one (reference
    Pipe.setInputCol — the reference leaves set_output/label as TODO;
    implemented here)."""
    return _set_col(pipe, "inputCol", input_col)


def set_output_col(pipe: Pipeline, output_col: str) -> MayFail[Pipeline]:
    return _set_col(pipe, "outputCol", output_col)


def set_label_col(pipe: Pipeline, label_col: str) -> MayFail[Pipeline]:
    return _set_col(pipe, "labelCol", label_col)


def _set_col(pipe: Pipeline, param_name: str, value: str) -> MayFail[Pipeline]:
    def run():
        stages = pipe.getStages()
        last = stages[-1]
        if last.hasParam(param_name):
            last = last.copy()
            last.set(last.getParam(param_name), value)
        return Pipeline(stages=[*stages[:-1], last])

    return MayFail.of(run)
