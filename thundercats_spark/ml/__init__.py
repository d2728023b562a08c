from thundercats_spark.ml.feature import AssemblyFeature, Feature, FeatureColumn
from thundercats_spark.ml.design import (
    DummyModelDesign,
    ModelDesign,
    SupervisedModelDesign,
    UnsupervisedModelDesign,
)
from thundercats_spark.ml.specimen import Specimen

__all__ = [
    "Feature",
    "AssemblyFeature",
    "FeatureColumn",
    "ModelDesign",
    "DummyModelDesign",
    "SupervisedModelDesign",
    "UnsupervisedModelDesign",
    "Specimen",
]
