"""Feature/model comparison and selection (reference evaluation/
FeatureCompare.scala, ModelCompare.scala, FeatureSelect.scala,
model/Selector.scala)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame

from thundercats_spark.functional.maybe import MayFail
from thundercats_spark.ml.design import ModelDesign
from thundercats_spark.ml.feature import AssemblyFeature, Feature, FeatureColumn
from thundercats_spark.ml.measure import Measure, MeasureVector


class FeatureCompare:
    """Score a design per candidate feature; pick the winner
    (reference best_of/all_of)."""

    def __init__(self, measure: Measure):
        self.measure = measure

    def all_of(
        self, design: ModelDesign, features: list[FeatureColumn], df: DataFrame
    ) -> MayFail[list[tuple[float, FeatureColumn]]]:
        def go():
            out = []
            for f in features:
                specimen = design.to_specimen(f, df)
                out.append((specimen.score(df, self.measure).get, f))
            return out

        return MayFail.of(go)

    def best_of(
        self, design: ModelDesign, features: list[FeatureColumn], df: DataFrame
    ):
        def pick(scores):
            best = scores[0]
            for s in scores[1:]:
                if self.measure.is_better(s[0], best[0]):
                    best = s
            specimen = design.to_specimen(best[1], df)
            return (best[0], best[1], specimen)

        return self.all_of(design, features, df).map(pick)


class RegressionFeatureCompare(FeatureCompare):
    pass


class ClassificationFeatureCompare(FeatureCompare):
    pass


class ModelCompare:
    """Same measure across multiple designs (reference ModelCompare)."""

    def __init__(self, measure: Measure):
        self.measure = measure

    def all_of(
        self, designs: list[ModelDesign], feature: FeatureColumn, df: DataFrame
    ) -> MayFail[list[tuple[float, ModelDesign]]]:
        def go():
            return [
                (d.to_specimen(feature, df).score(df, self.measure).get, d) for d in designs
            ]

        return MayFail.of(go)

    def best_of(self, designs, feature, df):
        def pick(scores):
            best = scores[0]
            for s in scores[1:]:
                if self.measure.is_better(s[0], best[0]):
                    best = s
            return best

        return self.all_of(designs, feature, df).map(pick)


class FeatureAssemblyGenerator:
    """Enumerate feature combinations (reference model/Selector.scala
    genCombinations): every numeric-column subset of size
    [min, max], as AssemblyFeatures."""

    def __init__(
        self,
        min_feature_combination: int = 1,
        max_feature_combination: int = 3,
        ignore_cols: list[str] | None = None,
    ):
        self.lo = min_feature_combination
        self.hi = max_feature_combination
        self.ignore = set(ignore_cols or [])

    def gen_combinations(self, df: DataFrame, out: str = "features") -> list[FeatureColumn]:
        numeric = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in {"int", "bigint", "double", "float", "smallint"}
            and f.name not in self.ignore
        ]
        feats: list[FeatureColumn] = []
        for k in range(self.lo, min(self.hi, len(numeric)) + 1):
            for combo in combinations(numeric, k):
                feats.append(AssemblyFeature(list(combo), out))
        return feats


# Significance levels (normal quantiles) — reference FeatureSelect.scala
Significance90p = 1.645
Significance95p = 1.96
Significance99p = 2.576


class ZScoreFeatureSelector:
    """Keep features whose |z| clears the significance bar
    (reference ZScoreFeatureSelector)."""

    def __init__(self, significance: float = Significance90p):
        self.significance = significance

    def select_subset(
        self,
        df: DataFrame,
        design: ModelDesign,
        feature: FeatureColumn,
        zscore_vector: MeasureVector,
    ) -> MayFail[list[tuple[float, str]]]:
        def go():
            specimen = design.to_specimen(feature, df)
            zs = specimen.score_vector(df, zscore_vector).get
            return [
                (z, c)
                for z, c in zip(zs, feature.as_list())
                if abs(z) >= self.significance
            ]

        return MayFail.of(go)


class BestNFeaturesSelector:
    """Top-N single features by measure (reference BestNFeaturesSelector)."""

    def __init__(self, top: int, measure: Measure):
        self.top = top
        self.measure = measure

    def select_subset(
        self, df: DataFrame, design: ModelDesign, features: list[FeatureColumn]
    ) -> MayFail[list[tuple[float, FeatureColumn]]]:
        def go():
            scored = FeatureCompare(self.measure).all_of(design, features, df).get
            better = self.measure.is_better
            # selection-sort by the measure's own ordering
            ranked: list[tuple[float, FeatureColumn]] = []
            pool = list(scored)
            while pool and len(ranked) < self.top:
                best = pool[0]
                for s in pool[1:]:
                    if better(s[0], best[0]):
                        best = s
                pool.remove(best)
                ranked.append(best)
            return ranked

        return MayFail.of(go)


def pca_stage(k: int, input_col: str = "features", output_col: str = "pca_features"):
    """Dimensionality-reduction step (reference model/
    DimensionReduction.scala DimReduc.PCA) for to_pipeline post_step."""
    from pyspark.ml.feature import PCA

    return PCA(k=k, inputCol=input_col, outputCol=output_col)


__all__ = [
    "FeatureCompare",
    "RegressionFeatureCompare",
    "ClassificationFeatureCompare",
    "ModelCompare",
    "FeatureAssemblyGenerator",
    "ZScoreFeatureSelector",
    "BestNFeaturesSelector",
    "Significance90p",
    "Significance95p",
    "Significance99p",
    "pca_stage",
    "Feature",
]
