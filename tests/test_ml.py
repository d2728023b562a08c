"""ML layer tests — mirrors reference AllTest.scala groups: feature
engineering, regression/classification modeling, model selection,
clustering, cross-validation, feature selection, dim reduction."""

import math

import pyspark.sql.functions as F
import pytest

from thundercats_spark.ml import preset
from thundercats_spark.ml.compare import (
    BestNFeaturesSelector,
    FeatureAssemblyGenerator,
    ModelCompare,
    RegressionFeatureCompare,
    Significance90p,
    ZScoreFeatureSelector,
    pca_stage,
)
from thundercats_spark.ml.design import DummyModelDesign, SupervisedModelDesign, UnsupervisedModelDesign
from thundercats_spark.ml.estimators import (
    ColumnRename,
    DebugStep,
    Scaler,
    StringEncoder,
    ZStandardScaler,
)
from thundercats_spark.ml.feature import AssemblyFeature, Feature
from thundercats_spark.ml.measure import (
    AUC,
    MAE,
    MPE,
    RMSE,
    FMeasure,
    PearsonCorr,
    Precision,
    Recall,
    SSE,
    ZScore,
)
from thundercats_spark.ml.validation import CrossValidation, SplitValidation


@pytest.fixture(scope="module")
def reg_df(spark):
    # z = 2v + 1 with mild noise; i is an unrelated index column
    rows = [(float(i), 2.0 * i + 1.0 + (0.01 * (i % 3 - 1)), float(i % 5)) for i in range(100)]
    return spark.createDataFrame(rows, "v double, z double, noise double")


@pytest.fixture(scope="module")
def clf_df(spark):
    rows = [(float(i), float(100 - i), 1.0 if i >= 50 else 0.0) for i in range(100)]
    return spark.createDataFrame(rows, "x double, xr double, label double")


# -- feature engineering (estimators) ----------------------------------------


def test_scaler_normalise(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "v double")
    out = Scaler(inputCol="v", outputCol="s").transform(df)
    vals = [r["s"] for r in out.orderBy("v").collect()]
    assert vals == [0.0, 0.5, 1.0]


def test_scaler_log(spark):
    df = spark.createDataFrame([(1.0,), (10.0,), (100.0,)], "v double")
    out = Scaler(inputCol="v", outputCol="s", normalise=False, logScale=True).transform(df)
    vals = [r["s"] for r in out.orderBy("v").collect()]
    assert vals == [0.0, 1.0, 2.0]


def test_scaler_log_then_normalise(spark):
    df = spark.createDataFrame([(1.0,), (10.0,), (100.0,)], "v double")
    out = Scaler(inputCol="v", outputCol="s", normalise=True, logScale=True).transform(df)
    assert [r["s"] for r in out.orderBy("v").collect()] == [0.0, 0.5, 1.0]


def test_standard_scaler(spark):
    df = spark.createDataFrame([(2.0,), (4.0,), (6.0,)], "v double")
    out = ZStandardScaler(inputCol="v", outputCol="s").transform(df)
    vals = [r["s"] for r in out.orderBy("v").collect()]
    assert abs(sum(vals)) < 1e-9
    sd = math.sqrt(sum(v * v for v in vals) / len(vals))
    assert abs(sd - 1.0) < 1e-9


def test_string_encoder_murmur(spark):
    df = spark.createDataFrame([("hello world",), ("hello world",), ("bye",)], "t string")
    out = StringEncoder(inputCol="t", outputCol="enc").transform(df).collect()
    assert out[0]["enc"] == out[1]["enc"]
    assert len(out[0]["enc"]) == 2 and len(out[2]["enc"]) == 1
    assert all(isinstance(x, float) for x in out[0]["enc"])


def test_column_rename_stage(spark):
    df = spark.createDataFrame([(1,)], "a int")
    assert ColumnRename(inputCol="a", outputCol="b").transform(df).columns == ["b"]


def test_debug_step_passthrough(spark, capsys):
    df = spark.createDataFrame([(1,)], "a int")
    out = DebugStep().transform(df)
    assert out.count() == 1
    assert "a: integer" in capsys.readouterr().out


# -- regression modeling -------------------------------------------------------


def test_linear_reg_rmse_mae(reg_df):
    feat = AssemblyFeature(["v"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="z",
        estimator=preset.linear_reg(Feature("features"), "z", "pred"),
    )
    specimen = design.to_specimen(feat, reg_df)
    rmse = specimen.score(reg_df, RMSE).get
    mae = specimen.score(reg_df, MAE).get
    mpe = specimen.score(reg_df, MPE).get
    assert rmse < 0.1 and mae < 0.1 and mpe < 0.05


def test_dummy_design_pearson(reg_df):
    # DummySpecimen: column 'v' used directly as prediction vs label z
    design = DummyModelDesign(label_col="z")
    specimen = design.to_specimen(Feature("v"), reg_df)
    corr = specimen.score(reg_df, PearsonCorr).get
    assert corr > 0.999


def test_feature_compare_best_of(reg_df):
    design = DummyModelDesign(label_col="z")
    score, best, specimen = (
        RegressionFeatureCompare(PearsonCorr)
        .best_of(design, [Feature("v"), Feature("noise")], reg_df)
        .get
    )
    assert best.col_name() == "v" and score > 0.99
    assert specimen is not None


def test_zscore_vector(reg_df):
    feat = AssemblyFeature(["v", "noise"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="z",
        estimator=preset.linear_reg(Feature("features"), "z", "pred"),
    )
    zs = design.to_specimen(feat, reg_df).score_vector(reg_df, ZScore).get
    assert len(zs) == 2
    assert abs(zs[0]) > abs(zs[1])  # v is significant, noise is not


# -- classification modeling ----------------------------------------------------


def test_logistic_auc(clf_df):
    feat = AssemblyFeature(["x"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="label",
        estimator=preset.logistic_reg(Feature("features"), "label", "pred"),
    )
    specimen = design.to_specimen(feat, clf_df)
    auc = specimen.score(clf_df, AUC).get
    assert auc > 0.99


def test_threshold_maps(clf_df):
    feat = AssemblyFeature(["x"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="label",
        estimator=preset.logistic_reg(Feature("features"), "label", "pred"),
    )
    specimen = design.to_specimen(feat, clf_df)
    prec = specimen.threshold_scores(clf_df, Precision).get
    rec = specimen.threshold_scores(clf_df, Recall).get
    f1 = specimen.threshold_scores(clf_df, FMeasure).get
    assert len(prec) > 10 and set(prec) == set(rec) == set(f1)
    best_t = max(prec, key=lambda t: (prec[t], t))
    assert prec[best_t] == 1.0
    # recall at the lowest threshold is 1 (everything predicted positive)
    assert rec[min(rec)] == 1.0
    # % raises for threshold-only measures (reference semantics)
    assert specimen.score(clf_df, Precision).is_failing


def test_aucpr_pinned_fixture(spark):
    """AUCPR on a hand-computed 5-point curve (mllib semantics: trapezoid
    over threshold-descending PR points with a prepended (0, p_first)).

    scores/labels: (.9,1) (.8,0) (.7,1) (.6,1) (.5,0) → P=3
    t=.9: TP=1 PP=1 → (r=1/3, p=1);   t=.8: TP=1 PP=2 → (1/3, 1/2)
    t=.7: TP=2 PP=3 → (2/3, 2/3);     t=.6: TP=3 PP=4 → (1, 3/4)
    t=.5: TP=3 PP=5 → (1, 3/5)
    area = 1/3·1 + 0 + 1/3·(2/3+1/2)/2 + 1/3·(3/4+2/3)/2 + 0 = 55/72
    """
    from types import SimpleNamespace

    from thundercats_spark.ml.measure import AUCPrecisionRecall

    df = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.6, 1.0), (0.5, 0.0)],
        "pred double, label double",
    )
    spec = SimpleNamespace(output_col="pred", label_col="label")
    out = AUCPrecisionRecall.score(df, spec)
    assert not out.is_failing, out.get_error()
    assert out.get == pytest.approx(55 / 72)


def test_aucpr_separable(clf_df):
    from thundercats_spark.ml.measure import AUCPrecisionRecall

    feat = AssemblyFeature(["x"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="label",
        estimator=preset.logistic_reg(Feature("features"), "label", "pred"),
    )
    specimen = design.to_specimen(feat, clf_df)
    aucpr = specimen.score(clf_df, AUCPrecisionRecall).get
    assert aucpr > 0.99


def test_svm_runs(clf_df):
    feat = AssemblyFeature(["x"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="label",
        estimator=preset.svm(Feature("features"), "label", "pred", max_iters=50),
    )
    specimen = design.to_specimen(feat, clf_df)
    auc = specimen.score(clf_df, AUC).get
    assert auc > 0.95


def test_model_compare(clf_df):
    feat = AssemblyFeature(["x"], "features")
    designs = [
        SupervisedModelDesign(
            output_col="pred", label_col="label",
            estimator=preset.logistic_reg(Feature("features"), "label", "pred"),
        ),
        SupervisedModelDesign(
            output_col="pred", label_col="label",
            estimator=preset.decision_tree(Feature("features"), "label", "pred"),
        ),
    ]
    score, best = ModelCompare(AUC).best_of(designs, feat, clf_df).get
    assert score > 0.9


# -- clustering ------------------------------------------------------------------


def test_kmeans_sse(spark):
    import random

    rnd = random.Random(1)
    rows = [(rnd.gauss(c * 10.0, 0.5), rnd.gauss(c * 10.0, 0.5)) for c in (0, 1, 2) for _ in range(30)]
    df = spark.createDataFrame(rows, "x double, y double")
    feat = AssemblyFeature(["x", "y"], "features")
    sse_scores = {}
    for k in (2, 3):
        design = UnsupervisedModelDesign(
            output_col="cluster", estimator=preset.kmeans(Feature("features"), k, "cluster")
        )
        specimen = design.to_specimen(feat, df)
        sse_scores[k] = specimen.score(df, SSE).get
    assert sse_scores[3] < sse_scores[2]  # true k wins


def test_gmm_runs(spark):
    df = spark.createDataFrame(
        [(float(i % 10),) for i in range(50)], "x double"
    )
    feat = AssemblyFeature(["x"], "features")
    design = UnsupervisedModelDesign(
        output_col="cluster", estimator=preset.gmm(Feature("features"), 2, "cluster")
    )
    out = design.to_specimen(feat, df).transform(df)
    assert set(out.select("cluster").distinct().toPandas()["cluster"]) <= {0, 1}


# -- validation -------------------------------------------------------------------


def test_split_validation(reg_df):
    feat = AssemblyFeature(["v"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="z",
        estimator=preset.linear_reg(Feature("features"), "z", "pred"),
    )
    score = SplitValidation(MPE, train_ratio=0.65).run(reg_df, design, feat).get
    assert score < 0.05


def test_split_validation_bad_ratio(reg_df):
    feat = AssemblyFeature(["v"], "features")
    design = DummyModelDesign("z")
    assert SplitValidation(MPE, train_ratio=1.5).run(reg_df, design, feat).is_failing


def test_cross_validation(reg_df):
    feat = AssemblyFeature(["v"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="z",
        estimator=preset.linear_reg(Feature("features"), "z", "pred"),
    )
    score = CrossValidation(MPE, n_folds=3).run(reg_df, design, feat).get
    assert score < 0.1


# -- feature selection / combinations ----------------------------------------------


def test_gen_combinations(reg_df):
    gen = FeatureAssemblyGenerator(1, 2, ignore_cols=["z"])
    combos = gen.gen_combinations(reg_df)
    # v, noise, v+noise
    assert len(combos) == 3


def test_zscore_selector(reg_df):
    feat = AssemblyFeature(["v", "noise"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="z",
        estimator=preset.linear_reg(Feature("features"), "z", "pred"),
    )
    kept = (
        ZScoreFeatureSelector(Significance90p)
        .select_subset(reg_df, design, feat, ZScore)
        .get
    )
    assert [c for _, c in kept] == ["v"]


def test_best_n_selector(reg_df):
    design = DummyModelDesign("z")
    ranked = (
        BestNFeaturesSelector(1, PearsonCorr)
        .select_subset(reg_df, design, [Feature("v"), Feature("noise")])
        .get
    )
    assert len(ranked) == 1 and ranked[0][1].col_name() == "v"


# -- dimensionality reduction --------------------------------------------------------


def test_pca_post_step(reg_df):
    feat = AssemblyFeature(["v", "noise"], "features")
    est = preset.linear_reg(Feature("pca_features"), "z", "pred")
    pipe = feat.to_pipeline(est, post_step=pca_stage(1, "features", "pca_features"))
    model = pipe.fit(reg_df)
    out = model.transform(reg_df)
    assert "pca_features" in out.columns and "pred" in out.columns
    first = out.select("pca_features").first()[0]
    assert len(first) == 1


def test_features_generators(spark):
    from thundercats_spark.ml.features_gen import (
        encode_strings,
        scale_numbers,
        standardise_numbers,
        vectorise,
    )

    df = spark.createDataFrame(
        [("a b", 1.0, 2), ("c", 4.0, 5)], "s string, d double, i int"
    )
    enc = encode_strings(df, suffix="_enc").fit(df).transform(df)
    assert "s_enc" in enc.columns
    std = standardise_numbers(df, suffix="_std").fit(df).transform(df)
    assert "d_std" in std.columns and "i_std" not in std.columns  # doubles only
    sc = scale_numbers(df, suffix="_sc").fit(df).transform(df)
    vals = sorted(r["d_sc"] for r in sc.collect())
    assert vals == [0.0, 1.0]
    va = vectorise(df, ignore_columns=["s"])
    out = va.transform(df)
    assert len(out.first()["features"]) == 2  # d + i, name-sorted


def test_pipe_helpers(spark, tmp_path, reg_df):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from thundercats_spark.ml import pipe as P

    va = VectorAssembler(inputCols=["v"], outputCol="features")
    lr = LinearRegression(featuresCol="features", labelCol="z", predictionCol="pred")
    pl = Pipeline(stages=[va, lr])

    # estimator extraction / transformer-only split (reference Pipe test)
    est_only = P.estimator(pl).get
    assert len(est_only.getStages()) == 1
    trans_only = P.without_estimator(pl).get
    assert [type(s) for s in trans_only.getStages()] == [VectorAssembler]

    # add / prepend / join
    assert len(P.add(pl, lr).get.getStages()) == 3
    assert len(P.prepend(pl, va).get.getStages()) == 3
    assert len(P.join(pl, pl).get.getStages()) == 2

    # rewire label col (set_* on the final stage)
    rewired = P.set_label_col(pl, "noise").get
    assert rewired.getStages()[-1].getLabelCol() == "noise"
    assert pl.getStages()[-1].getLabelCol() == "z"  # original untouched

    # save/load round trip of a fitted model + fitted_estimator unwrap
    model = pl.fit(reg_df)
    path = str(tmp_path / "pipe_model")
    P.save(path, model).get
    back = P.load(path).get
    fe = P.fitted_estimator(back).get
    assert type(fe).__name__ == "LinearRegressionModel"


def test_custom_transformer_persistence_roundtrip(spark, tmp_path):
    """Every custom transformer survives save -> load with params and
    transform output intact (production model-registry requirement)."""
    from pyspark.ml import Pipeline

    from thundercats_spark.ml.estimators import (
        ColumnRename,
        Scaler,
        StringEncoder,
        ZStandardScaler,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "alpha beta"), (2, 20.0, "beta gamma"), (3, 40.0, "delta")],
        "id long, x double, words string",
    )
    pipe = Pipeline(
        stages=[
            Scaler(inputCol="x", outputCol="x_s", normalise=True, logScale=True),
            ZStandardScaler(inputCol="x", outputCol="x_z"),
            StringEncoder(inputCol="words", outputCol="w_h", numBuckets=1 << 10),
            ColumnRename(inputCol="x_z", outputCol="x_std"),
        ]
    )
    model = pipe.fit(df)
    before = [tuple(r) for r in model.transform(df).orderBy("id").collect()]

    path = str(tmp_path / "custom_stages")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    back = PipelineModel.load(path)
    after = [tuple(r) for r in back.transform(df).orderBy("id").collect()]
    assert before == after
    # params survive the round trip
    sc = back.stages[0]
    assert sc.getOrDefault(sc.logScale) is True
    se = back.stages[2]
    assert se.getOrDefault(se.numBuckets) == 1 << 10


def test_auc_score_rounding_caps_curve_and_approximates_exact(spark):
    """score_round_digits: the binned curve has at most ~10^d+1 points
    and the AUC stays within the rounding granularity of exact — the
    scale control for continuous-score evals."""
    import random
    from types import SimpleNamespace

    from thundercats_spark.ml.measure import _AUC

    rng = random.Random(11)
    rows = [
        (rng.random(), 1.0 if rng.random() < 0.5 + 0.3 * (i % 2) else 0.0)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "pred double, label double")
    spec = SimpleNamespace(output_col="pred", label_col="label")
    exact = _AUC().score(df, spec).get
    approx = _AUC(score_round_digits=2).score(df, spec).get
    assert abs(exact - approx) < 0.02, (exact, approx)
    curve, p, n = _AUC(score_round_digits=2)._curve(df, spec)
    assert curve.count() <= 101  # 2 digits -> at most 101 bins
    assert n == 2000 and 0 < p < 2000
    # default singletons stay exact
    from thundercats_spark.ml.measure import AUC as AUC_singleton

    assert AUC_singleton.score_round_digits is None


def test_auc_binning_is_range_relative(spark):
    """Binning normalizes the observed range, so concentrated or
    unbounded scores (raw margins, sub-0.01 probabilities) keep their
    resolution — the fixed-decimal rounding failure mode where a
    perfect rare-event classifier collapsed to AUC 0.5."""
    from types import SimpleNamespace

    from thundercats_spark.ml.measure import _AUC

    # perfectly separable scores concentrated in [0.001, 0.004]
    rows = [(0.004 + i * 1e-6, 1.0) for i in range(50)] + [
        (0.001 + i * 1e-6, 0.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "pred double, label double")
    spec = SimpleNamespace(output_col="pred", label_col="label")
    assert _AUC(score_round_digits=2).score(df, spec).get > 0.99
    # unbounded raw-margin-style scores too
    rows2 = [(float(40 + i), 1.0) for i in range(50)] + [
        (float(-40 - i), 0.0) for i in range(50)
    ]
    df2 = spark.createDataFrame(rows2, "pred double, label double")
    assert _AUC(score_round_digits=2).score(df2, spec).get > 0.99


def test_auc_quantile_binning_survives_outlier(spark):
    """One extreme outlier stretches the observed range so equi-width
    bins dump the real mass into a single cell (AUC collapses toward
    chance); quantile bins hold ~equal mass per cell and keep the AUC
    bound — the r05 advice case score_bins='quantile' exists for."""
    import random
    from types import SimpleNamespace

    from thundercats_spark.ml.measure import _AUC

    rng = random.Random(3)
    rows = [(rng.uniform(0.6, 1.0), 1.0) for _ in range(500)] + [
        (rng.uniform(0.0, 0.4), 0.0) for _ in range(500)
    ]
    rows.append((1e9, 1.0))  # the range-stretching outlier
    df = spark.createDataFrame(rows, "pred double, label double")
    spec = SimpleNamespace(output_col="pred", label_col="label")
    exact = _AUC().score(df, spec).get
    assert exact > 0.99
    width = _AUC(score_round_digits=2).score(df, spec).get
    assert width < 0.75, width  # equi-width visibly degrades here
    quant = _AUC(score_round_digits=2, score_bins="quantile").score(df, spec).get
    assert abs(quant - exact) < 0.02, (quant, exact)
    # curve stays capped: ~10^d cells either way
    curve, _, _ = _AUC(score_round_digits=2, score_bins="quantile")._curve(
        df, spec
    )
    assert curve.count() <= 101


def test_auc_quantile_binning_matches_width_on_clean_scores(spark):
    """No outlier: both geometries stay within the granularity bound of
    exact (quantile is a safety upgrade, not a semantics change)."""
    import random
    from types import SimpleNamespace

    from thundercats_spark.ml.measure import _AUC

    rng = random.Random(7)
    rows = [
        (rng.random(), 1.0 if rng.random() < 0.5 + 0.3 * (i % 2) else 0.0)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "pred double, label double")
    spec = SimpleNamespace(output_col="pred", label_col="label")
    exact = _AUC().score(df, spec).get
    quant = _AUC(score_round_digits=2, score_bins="quantile").score(df, spec).get
    assert abs(exact - quant) < 0.02, (exact, quant)
    # near-constant scores: quantile edges collapse -> falls back, still sane
    flat = spark.createDataFrame(
        [(0.5, 1.0)] * 40 + [(0.5 - 1e-12, 0.0)] * 40, "pred double, label double"
    )
    assert 0.0 <= _AUC(
        score_round_digits=2, score_bins="quantile"
    ).score(flat, spec).get <= 1.0


def test_auc_nan_scores_raise_when_binning(spark):
    """NaN poisons the observed range and would silently DISABLE
    binning (the huge-curve trap resurfaces unguarded) — reject loudly
    instead. The exact path is untouched; bad score_bins values too."""
    from types import SimpleNamespace

    import pytest as _pytest

    from thundercats_spark.ml.measure import _AUC

    rows = [(0.9, 1.0), (0.1, 0.0), (float("nan"), 1.0)]
    df = spark.createDataFrame(rows, "pred double, label double")
    spec = SimpleNamespace(output_col="pred", label_col="label")
    with _pytest.raises(ValueError, match="NaN"):
        _AUC(score_round_digits=2)._curve(df, spec)
    # through the MayFail-wrapped scoring surface it lands as a failure
    assert _AUC(score_round_digits=2).score(df, spec).is_failing
    with _pytest.raises(ValueError, match="score_bins"):
        _AUC(score_bins="log")


def test_quantile_bins_reject_out_of_range_digits():
    """nbins = 10**digits: under quantile binning, digits outside
    [1, 5] is a construction-time ValueError — digits < 1 gives a
    degenerate/float bin count, digits >= 6 pushes a ~10^6-element
    probability list through the driver and the Greenwald-Khanna
    merge, dominating the job it is meant to cheapen (ADVICE r06).
    Equi-width keeps accepting negative digits — F.round to tens is
    meaningful there — and any large digits (no quantile probe)."""
    import pytest

    from thundercats_spark.ml.measure import _AUC

    for bad in (-1, 0, 6, 9):
        with pytest.raises(ValueError, match="score_round_digits"):
            _AUC(score_round_digits=bad, score_bins="quantile")
    _AUC(score_round_digits=5, score_bins="quantile")  # boundary ok
    _AUC(score_round_digits=-1, score_bins="width")  # still fine
    _AUC(score_round_digits=8, score_bins="width")  # no probe list


def test_debugstep_persistence_roundtrip(spark, tmp_path, capsys):
    """DebugStep (the one custom transformer the r06 round-trip test
    missed) survives Pipeline save -> load and stays a pass-through."""
    from pyspark.ml import Pipeline, PipelineModel

    from thundercats_spark.ml.estimators import DebugStep, Scaler

    df = spark.createDataFrame([(1, 4.0), (2, 8.0)], "id long, x double")
    model = Pipeline(stages=[
        Scaler(inputCol="x", outputCol="s", normalise=True),
        DebugStep(),
    ]).fit(df)
    before = [tuple(r) for r in model.transform(df).orderBy("id").collect()]
    path = str(tmp_path / "debug_pipe")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)
    assert type(back.stages[1]).__name__ == "DebugStep"
    after = [tuple(r) for r in back.transform(df).orderBy("id").collect()]
    assert before == after


def test_fitted_specimen_rescore_equality_after_persistence(
    clf_df, tmp_path
):
    """VERDICT r06 #9: the full train -> persist -> reload -> RE-SCORE
    loop (a model registry's actual workflow): a fitted preset pipeline
    (assembler + logistic) saved and reloaded must yield the identical
    AUC and identical per-row probabilities, and the reloaded model
    must still unwrap via fitted_estimator for coefficient measures."""
    from pyspark.ml import PipelineModel

    from thundercats_spark.ml.design import SupervisedModelDesign
    from thundercats_spark.ml.feature import AssemblyFeature, Feature
    from thundercats_spark.ml import preset
    from thundercats_spark.ml.measure import AUC
    from thundercats_spark.ml.specimen import Specimen, fitted_estimator

    feat = AssemblyFeature(["x"], "features")
    design = SupervisedModelDesign(
        output_col="pred", label_col="label",
        estimator=preset.logistic_reg(Feature("features"), "label", "pred"),
    )
    specimen = design.to_specimen(feat, clf_df)
    auc0 = specimen.score(clf_df, AUC).get

    path = str(tmp_path / "specimen_model")
    specimen.model.write().overwrite().save(path)
    back = Specimen(
        model=PipelineModel.load(path),
        feature=feat, output_col="pred", label_col="label",
    )
    auc1 = back.score(clf_df, AUC).get
    assert auc1 == auc0

    cols = ["x", "probability", "pred"]
    a = [tuple(map(str, r)) for r in
         specimen.transform(clf_df).select(cols).orderBy("x").collect()]
    b = [tuple(map(str, r)) for r in
         back.transform(clf_df).select(cols).orderBy("x").collect()]
    assert a == b
    inner = fitted_estimator(back.model)
    assert type(inner).__name__ == "LogisticRegressionModel"
    assert inner.coefficients is not None
