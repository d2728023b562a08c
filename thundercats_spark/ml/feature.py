"""Feature column abstractions (reference model/Feature.scala).

``Feature`` — one column used as the features input directly.
``AssemblyFeature`` — several columns assembled into a vector with
VectorAssembler (the reference's ``%`` pipeline-composition operator is
``to_pipeline`` here).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from typing import Any

from pyspark.ml import Pipeline
from pyspark.ml.feature import VectorAssembler

PipelineStage = Any  # pyspark 4 no longer exports PipelineStage


@dataclass(frozen=True)
class FeatureColumn:
    def col_name(self) -> str:
        raise NotImplementedError

    def as_list(self) -> list[str]:
        raise NotImplementedError

    @property
    def size(self) -> int:
        return len(self.as_list())

    def stages(self) -> list[PipelineStage]:
        return []

    def to_pipeline(
        self,
        estimator: Pipeline,
        pre_step: PipelineStage | None = None,
        post_step: PipelineStage | None = None,
    ) -> Pipeline:
        """Reference ``feature % (estimator, pre, post)``: compose
        [pre?, assembler?, post?, estimator] into one Pipeline."""
        stages: list[PipelineStage] = []
        if pre_step is not None:
            stages.append(pre_step)
        stages.extend(self.stages())
        if post_step is not None:
            stages.append(post_step)
        stages.append(estimator)
        return Pipeline(stages=stages)


@dataclass(frozen=True)
class Feature(FeatureColumn):
    """A single ready-made column (numeric or pre-assembled vector)."""

    name: str

    def col_name(self) -> str:
        return self.name

    def as_list(self) -> list[str]:
        return [self.name]


@dataclass(frozen=True)
class AssemblyFeature(FeatureColumn):
    """Assemble ``cols`` into vector ``out`` (reference AssemblyFeature)."""

    cols: tuple[str, ...]
    out: str = "features"

    def __init__(self, cols, out: str = "features"):
        object.__setattr__(self, "cols", tuple(cols))
        object.__setattr__(self, "out", out)

    def col_name(self) -> str:
        return self.out

    def as_list(self) -> list[str]:
        return list(self.cols)

    def stages(self) -> list[PipelineStage]:
        return [VectorAssembler(inputCols=list(self.cols), outputCol=self.out)]
