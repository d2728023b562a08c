"""Estimator presets (reference model/Preset.scala) — each returns a
one-stage pyspark.ml Pipeline ready for FeatureColumn.to_pipeline.

The reference wraps the deprecated mllib SVMWithSGD (WrappedEstimator);
Spark's native LinearSVC is the modern equivalent. randomForest is a
TODO stub in the reference (Preset.scala:63) — implemented here."""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    LinearSVC,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.clustering import GaussianMixture, KMeans
from pyspark.ml.regression import LinearRegression

from thundercats_spark.ml.feature import FeatureColumn


def linear_reg(
    features: FeatureColumn,
    label_col: str,
    output_col: str,
    max_iters: int = 10,
    elastic_net_param: float | None = None,
) -> Pipeline:
    """elasticNetParam 0 → ridge, 1 → lasso (reference Preset.scala:21)."""
    lg = (
        LinearRegression()
        .setFeaturesCol(features.col_name())
        .setPredictionCol(output_col)
        .setLabelCol(label_col)
        .setMaxIter(max_iters)
    )
    if elastic_net_param is not None:
        lg = lg.setElasticNetParam(elastic_net_param)
    return Pipeline(stages=[lg])


def decision_tree(
    features: FeatureColumn,
    label_col: str,
    output_col: str,
    impurity: str = "entropy",
    max_depth: int = 5,
) -> Pipeline:
    tree = (
        DecisionTreeClassifier()
        .setFeaturesCol(features.col_name())
        .setLabelCol(label_col)
        .setMaxDepth(max_depth)
        .setImpurity(impurity)
        .setPredictionCol(output_col)
        .setRawPredictionCol(f"{output_col}_raw")
        .setProbabilityCol("probability")
    )
    return Pipeline(stages=[tree])


def random_forest(
    features: FeatureColumn,
    label_col: str,
    output_col: str,
    num_trees: int = 20,
    max_depth: int = 5,
) -> Pipeline:
    rf = (
        RandomForestClassifier()
        .setFeaturesCol(features.col_name())
        .setLabelCol(label_col)
        .setNumTrees(num_trees)
        .setMaxDepth(max_depth)
        .setPredictionCol(output_col)
        .setRawPredictionCol(f"{output_col}_raw")
        .setProbabilityCol("probability")
    )
    return Pipeline(stages=[rf])


def svm(
    features: FeatureColumn,
    label_col: str,
    output_col: str,
    intercept: bool = False,
    max_iters: int = 10,
) -> Pipeline:
    m = (
        LinearSVC()
        .setFeaturesCol(features.col_name())
        .setLabelCol(label_col)
        .setPredictionCol(output_col)
        .setRawPredictionCol(f"{output_col}_raw")
        .setFitIntercept(intercept)
        .setMaxIter(max_iters)
    )
    return Pipeline(stages=[m])


def logistic_reg(
    features: FeatureColumn,
    label_col: str,
    output_col: str,
    max_iters: int = 10,
) -> Pipeline:
    m = (
        LogisticRegression()
        .setFeaturesCol(features.col_name())
        .setLabelCol(label_col)
        .setPredictionCol(output_col)
        .setRawPredictionCol(f"{output_col}_raw")
        .setProbabilityCol("probability")
        .setMaxIter(max_iters)
    )
    return Pipeline(stages=[m])


def kmeans(
    features: FeatureColumn,
    num_k: int,
    output_col: str,
    distance: str = "euclidean",
    seed: int = 42,
) -> Pipeline:
    km = (
        KMeans()
        .setFeaturesCol(features.col_name())
        .setPredictionCol(output_col)
        .setDistanceMeasure(distance)
        .setK(num_k)
        .setSeed(seed)
    )
    return Pipeline(stages=[km])


def gmm(
    features: FeatureColumn,
    num_k: int,
    output_col: str,
    prob_col: str = "gmm_prob",
    max_iters: int = 10,
    seed: int = 42,
) -> Pipeline:
    g = (
        GaussianMixture()
        .setK(num_k)
        .setFeaturesCol(features.col_name())
        .setPredictionCol(output_col)
        .setProbabilityCol(prob_col)
        .setMaxIter(max_iters)
        .setSeed(seed)
    )
    return Pipeline(stages=[g])
