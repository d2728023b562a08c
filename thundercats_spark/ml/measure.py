"""Model measures (reference evaluation/Measure.scala + MeasureVector).

All measures are DataFrame-native aggregations — the reference drops to
``DoubleRDDFunctions``/``BinaryClassificationMetrics`` RDDs; here every
formula is a declarative agg (partial aggregation, codegen) and the
threshold curves are window cumulative sums, which is exactly how the
mllib implementation computes them internally anyway.

Regression: RMSE, MAE, MPE, PearsonCorr.
Classification: AUC, AUCPrecisionRecall (scalar);
Precision/Recall/FMeasure (threshold → score maps, reference ``%%``).
Clustering: SSE. Vector: ZScore (per-feature significance).
"""

from __future__ import annotations

import math

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from thundercats_spark.functional.maybe import MayFail


class Measure:
    """Scalar measure; ``is_better(a, b)`` — True if a beats b."""

    name: str = "measure"

    def score(self, df: DataFrame, specimen) -> MayFail[float]:
        raise NotImplementedError

    def is_better(self, a: float, b: float) -> bool:
        return a > b


class RegressionMeasure(Measure):
    pass


class ClassificationMeasure(Measure):
    """Binary-classification measures over a score column.

    The score is the positive-class probability (or raw margin): we
    take ``probability[1]`` when the specimen's pipeline produced one,
    else the raw prediction column.

    ``score_round_digits`` (constructor arg, default None = exact)
    bins the score into cells before the threshold curve is built —
    the scale control for HUGE evaluation sets: the curve is
    distinct-score-sized and its cumulative pass is a single ordered
    window, so a continuous score over 10^9 rows would put 10^9 curve
    points on one sort partition. d digits caps the curve at ~10^d+1
    points regardless of the score's units or range (raw margins
    included — the range is normalized out). Curve points stay exact
    counts at the binned thresholds; the AUC error is bounded by the
    fraction of (positive, negative) pairs whose scores fall in the
    SAME bin. NaN scores are rejected loudly when binning is on (a NaN
    would poison the observed range and silently DISABLE binning —
    resurfacing the huge-curve trap the option exists to prevent).

    ``score_bins`` picks the binning geometry: ``"width"`` (default) =
    equi-width cells over the observed [min, max] — cheapest, but one
    extreme outlier stretching the range concentrates the real mass
    into a few cells and degrades the curve; ``"quantile"`` = cell
    edges from approxQuantile, so every cell holds ~equal mass and the
    error bound survives outliers (one extra driver-side quantile
    pass; thresholds are each cell's lower edge in score units). E.g.
    ``_AUC(score_round_digits=4, score_bins="quantile")`` for
    web-scale evals with unbounded margins; the exported default
    singletons stay exact."""

    def __init__(
        self,
        score_round_digits: int | None = None,
        score_bins: str = "width",
    ):
        if score_bins not in ("width", "quantile"):
            raise ValueError(
                f"score_bins must be 'width' or 'quantile', got {score_bins!r}"
            )
        if (
            score_bins == "quantile"
            and score_round_digits is not None
            and not 1 <= score_round_digits <= 5
        ):
            # equi-width tolerates negative digits (F.round to tens);
            # quantile derives nbins = 10**digits, where digits < 1
            # means "fewer than 10 cells" at best and a float bin count
            # at worst — fail at construction, not as a TypeError
            # buried in a MayFail. The UPPER bound (ADVICE r06): the
            # quantile path pushes a 10**digits - 1 element probability
            # list through the driver and the Greenwald-Khanna merge —
            # digits >= 6 makes the binning dominate the job it is
            # meant to cheapen. 10^5 cells already bounds the curve
            # sort; beyond that use exact mode (digits=None).
            raise ValueError(
                "score_bins='quantile' needs 1 <= score_round_digits "
                f"<= 5 (got {score_round_digits}): the bin count is "
                "10**score_round_digits, and >= 10^6 quantile probes "
                "cost more than the curve they bound — use "
                "score_round_digits=None (exact) if you need finer "
                "thresholds"
            )
        self.score_round_digits = score_round_digits
        self.score_bins = score_bins

    @staticmethod
    def scored(df: DataFrame, specimen) -> DataFrame:
        raw = f"{specimen.output_col}_raw"
        if "probability" in df.columns:
            score = vector_to_array(F.col("probability")).getItem(1)
        elif raw in df.columns:
            score = vector_to_array(F.col(raw)).getItem(1)
        elif "rawPrediction" in df.columns:
            score = vector_to_array(F.col("rawPrediction")).getItem(1)
        else:
            score = F.col(specimen.output_col).cast("double")
        return df.select(
            score.alias("__score"), F.col(specimen.label_col).cast("double").alias("__label")
        )

    def _curve(self, df: DataFrame, specimen) -> tuple[DataFrame, float, float]:
        """Per-distinct-threshold cumulative TP/FP (global ordered
        window over the DISTINCT-SCORE table — same construction as
        mllib's sortByKey) → ``(curve, P, N)``. P (positives) and N
        (total rows) come from the SAME stats pass that reads the
        score range — callers must not re-aggregate the data to
        recover them. Binning per ``self.score_round_digits`` (class
        docstring); thresholds stay in original score units (each
        bin's representative value)."""
        scored = ClassificationMeasure.scored(df, specimen)
        stats = scored.agg(
            F.sum("__label").alias("P"),
            F.count(F.lit(1)).alias("N"),
            F.min("__score").alias("lo"),
            F.max("__score").alias("hi"),
            F.sum(
                F.when(F.isnan(F.col("__score")), 1).otherwise(0)
            ).alias("nanK"),
        ).first()
        p, n = float(stats["P"] or 0.0), float(stats["N"])
        d = self.score_round_digits
        key = F.col("__score")
        if d is not None and stats["nanK"]:
            # NaN makes max() NaN and every range comparison False —
            # binning would silently switch off and the huge-curve
            # single-sort-partition scenario resurfaces unguarded.
            raise ValueError(
                f"{stats['nanK']} NaN scores with score_round_digits="
                f"{d}: NaN poisons the observed score range, silently "
                "disabling binning — filter or impute NaN scores before "
                "building a binned threshold curve"
            )
        per_t = None
        if d is not None and stats["hi"] is not None and stats["hi"] > stats["lo"]:
            lo, hi = float(stats["lo"]), float(stats["hi"])
            if self.score_bins == "quantile":
                per_t = self._quantile_binned(scored, lo, hi, 10 ** d)
            if per_t is None:
                # equi-width bins over the observed range, mapped back
                # to score units (bin representative) so thresholds
                # stay meaningful in threshold_scores maps. Also the
                # fallback when quantile edges collapse (near-constant
                # score distribution — tiny curve either way).
                key = F.round((key - lo) / (hi - lo), d) * (hi - lo) + lo
        if per_t is None:
            per_t = scored.groupBy(key.alias("__score")).agg(
                F.sum("__label").alias("tp_here"),
                F.count(F.lit(1)).alias("n_here"),
            )
        w = Window.orderBy(F.desc("__score")).rowsBetween(Window.unboundedPreceding, 0)
        curve = per_t.select(
            F.col("__score").alias("threshold"),
            F.sum("tp_here").over(w).alias("TP"),
            F.sum("n_here").over(w).alias("PP"),
        ).withColumn("P", F.lit(p))
        return curve, p, n

    @staticmethod
    def _quantile_binned(scored: DataFrame, lo: float, hi: float, nbins: int):
        """Equal-mass binning: cell edges from approxQuantile (one
        driver pass, error 1/(4*nbins) of rank), assigned JVM-side by
        Bucketizer's binary search, each cell keyed by its LOWER edge
        in score units. Returns the per-threshold partial-count frame,
        or None when the edges collapse (score nearly constant —
        caller falls back to equi-width)."""
        from pyspark.ml.feature import Bucketizer

        probs = [i / nbins for i in range(1, nbins)]
        qs = scored.approxQuantile("__score", probs, 1.0 / (4 * nbins))
        splits = sorted({float(q) for q in qs if lo < q < hi})
        if not splits:
            return None
        buck = Bucketizer(
            splits=[float("-inf"), *splits, float("inf")],
            inputCol="__score",
            outputCol="__bin",
        )
        per_bin = (
            buck.transform(scored)
            .groupBy("__bin")
            .agg(
                F.sum("__label").alias("tp_here"),
                F.count(F.lit(1)).alias("n_here"),
            )
        )
        reps = [lo, *splits]  # bin i's lower edge; strictly increasing
        rep_df = scored.sparkSession.createDataFrame(
            [(float(i), float(r)) for i, r in enumerate(reps)],
            "__bin double, __score double",
        )
        return per_bin.join(F.broadcast(rep_df), "__bin").drop("__bin")

    def threshold_scores(self, df: DataFrame, specimen) -> MayFail[dict[float, float]]:
        raise NotImplementedError


class _RMSE(RegressionMeasure, ClassificationMeasure):
    name = "RMSE"

    def score(self, df, specimen):
        def run():
            err = F.col(specimen.output_col) - F.col(specimen.label_col)
            return math.sqrt(df.agg(F.avg(err * err).alias("m")).first()["m"])

        return MayFail.of(run)

    def is_better(self, a, b):
        return a < b


class _MAE(RegressionMeasure, ClassificationMeasure):
    name = "MAE"

    def score(self, df, specimen):
        def run():
            err = F.abs(F.col(specimen.output_col) - F.col(specimen.label_col))
            return df.agg(F.avg(err).alias("m")).first()["m"]

        return MayFail.of(run)

    def is_better(self, a, b):
        return a < b


class _MPE(RegressionMeasure, ClassificationMeasure):
    name = "MPE"

    def score(self, df, specimen):
        def run():
            err = F.abs(F.col(specimen.output_col) - F.col(specimen.label_col)) / F.col(
                specimen.label_col
            )
            return df.agg(F.avg(err).alias("m")).first()["m"]

        return MayFail.of(run)

    def is_better(self, a, b):
        return a < b


class _PearsonCorr(RegressionMeasure):
    name = "PearsonCorr"

    def score(self, df, specimen):
        return MayFail.of(
            lambda: df.agg(
                F.corr(
                    F.col(specimen.output_col).cast("double"),
                    F.col(specimen.label_col).cast("double"),
                ).alias("c")
            ).first()["c"]
        )


class _AUC(ClassificationMeasure):
    name = "AUC"

    def score(self, df, specimen):
        def run():
            # Trapezoidal area under (FPR, TPR), threshold-descending —
            # the standard construction, as one window pass. P and N
            # ride along from _curve's stats pass (re-aggregating the
            # curve would re-execute the whole scan+window pipeline).
            curve, p, n = self._curve(df, specimen)
            neg = n - p
            pts = curve.select(
                (F.col("TP") / p).alias("tpr"),
                ((F.col("PP") - F.col("TP")) / neg).alias("fpr"),
            )
            w = Window.orderBy("fpr", "tpr")
            seg = pts.select(
                ((F.col("fpr") - F.lag("fpr", 1, 0.0).over(w))
                 * (F.col("tpr") + F.lag("tpr", 1, 0.0).over(w)) / 2.0).alias("a")
            )
            return seg.agg(F.sum("a").alias("s")).first()["s"]

        return MayFail.of(run)


class _AUCPR(ClassificationMeasure):
    name = "AUCPrecisionRecall"

    def score(self, df, specimen):
        def run():
            curve, _p, _n = self._curve(df, specimen)
            pts = curve.select(
                "threshold",
                (F.col("TP") / F.col("P")).alias("recall"),
                (F.col("TP") / F.col("PP")).alias("precision"),
            )
            # mllib prepends (0, p_first) — trapezoid over the curve in
            # threshold-descending order (recall is non-decreasing along
            # it; ordering by recall alone is ambiguous under ties). lag()
            # only takes a literal default, so the first row's "previous
            # precision" (its own precision, per the prepended point) is
            # expressed as coalesce over a null-default lag.
            w = Window.orderBy(F.desc("threshold"))
            prev_p = F.coalesce(F.lag("precision", 1).over(w), F.col("precision"))
            seg = pts.select(
                ((F.col("recall") - F.lag("recall", 1, 0.0).over(w))
                 * (F.col("precision") + prev_p) / 2.0
                 ).alias("a")
            )
            return seg.agg(F.sum("a").alias("s")).first()["s"]

        return MayFail.of(run)


class _ThresholdMeasure(ClassificationMeasure):
    """Threshold-map-only measures (reference: % raises, %% returns map)."""

    def score(self, df, specimen):
        return MayFail.of(lambda: (_ for _ in ()).throw(
            NotImplementedError(f"{self.name} only provides threshold_scores (reference %%)")
        ))

    def _metric(self, curve: DataFrame):
        raise NotImplementedError

    def threshold_scores(self, df, specimen):
        def run():
            curve, _p, _n = self._curve(df, specimen)
            out = curve.select("threshold", self._metric(curve).alias("v")).collect()
            return {r["threshold"]: r["v"] for r in out}

        return MayFail.of(run)


class _Precision(_ThresholdMeasure):
    name = "Precision"

    def _metric(self, curve):
        return F.col("TP") / F.col("PP")


class _Recall(_ThresholdMeasure):
    name = "Recall"

    def _metric(self, curve):
        return F.col("TP") / F.col("P")


class _FMeasure(_ThresholdMeasure):
    name = "FMeasure"

    def _metric(self, curve):
        p = F.col("TP") / F.col("PP")
        r = F.col("TP") / F.col("P")
        return F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))


class ClusterMeasure(Measure):
    pass


class _SSE(ClusterMeasure):
    """Sum of squared distance to each cluster's mean vector
    (reference Measure.scala SSE) — Summarizer.mean per cluster,
    broadcast-joined back, one pass."""

    name = "SSE"

    def score(self, df, specimen):
        def run():
            from pyspark.ml.stat import Summarizer

            feat = specimen.feature.col_name()
            pred = specimen.output_col
            means = (
                df.groupBy(F.col(pred).alias("__c"))
                .agg(Summarizer.mean(F.col(feat)).alias("__mv"))
                .select("__c", vector_to_array(F.col("__mv")).alias("__mean"))
            )
            arr = df.select(
                F.col(pred).alias("__c"), vector_to_array(F.col(feat)).alias("__v")
            )
            joined = arr.join(F.broadcast(means), "__c")
            sq = F.aggregate(
                F.zip_with(F.col("__v"), F.col("__mean"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            return joined.agg(F.sum(sq).alias("s")).first()["s"]

        return MayFail.of(run)

    def is_better(self, a, b):
        return a < b


class MeasureVector:
    def score(self, df: DataFrame, specimen) -> MayFail[list[float]]:
        raise NotImplementedError


class _ZScore(MeasureVector):
    """Per-coefficient z-scores of a fitted linear regression
    (reference MeasureVector.scala): z_j = β_j·sqrt(Σx_j²)/σ with
    σ² = Σ(y-ŷ)²/(N-M-1)."""

    def score(self, df, specimen):
        def run():
            from pyspark.ml.regression import LinearRegressionModel

            from thundercats_spark.ml.specimen import fitted_estimator

            lr = fitted_estimator(specimen.model)
            assert isinstance(lr, LinearRegressionModel), type(lr)
            betas = list(lr.coefficients)
            cols = specimen.feature.as_list()
            n = df.count()
            m = float(len(cols))
            # df arrives already transformed (score_vector contract)
            sq = (F.col(specimen.label_col) - F.col(specimen.output_col)) ** 2
            sigma2 = df.agg(F.sum(sq).alias("s")).first()["s"] / (n - m - 1)
            sigma = math.sqrt(sigma2)
            sums = df.agg(
                *[F.sum(F.col(c).cast("double") ** 2).alias(c) for c in cols]
            ).first()
            return [
                beta * math.sqrt(sums[c]) / sigma for beta, c in zip(betas, cols)
            ]

        return MayFail.of(run)


RMSE = _RMSE()
MAE = _MAE()
MPE = _MPE()
PearsonCorr = _PearsonCorr()
AUC = _AUC()
AUCPrecisionRecall = _AUCPR()
Precision = _Precision()
Recall = _Recall()
FMeasure = _FMeasure()
SSE = _SSE()
ZScore = _ZScore()
