"""Quality classifier (quality/classifier.py) and deterministic
temperature sampling (curation.py)."""

import random

import pytest
from pyspark.sql import functions as F

from thundercats_spark.operators.curation import (
    sample_to_fractions,
    temperature_keep_fractions,
    temperature_sample,
)
from thundercats_spark.quality.classifier import (
    filter_by_quality,
    linear_quality_score,
    score_quality,
    train_quality_classifier,
)

GOOD_WORDS = "the quick brown fox jumps over a lazy dog and runs home to rest".split()
BAD_WORDS = ["xq%d" % i for i in range(400)]


def _corpus(n=150, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        good = rng.sample(GOOD_WORDS, 8) + rng.sample(GOOD_WORDS, 4)
        rows.append((i, " ".join(good), 1))
        bad = [rng.choice(BAD_WORDS) for _ in range(12)]
        rows.append((n + i, " ".join(bad), 0))
    return rows


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(_corpus(), "doc_id long, text string, label int").cache()


def test_train_and_score_separates(spark, labeled):
    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=25)
    scored = score_quality(model, labeled)
    stats = (
        scored.groupBy("label")
        .agg(F.avg("quality_prob").alias("m"))
        .collect()
    )
    means = {r["label"]: r["m"] for r in stats}
    assert means[1] > 0.9 and means[0] < 0.1
    # held-out-ish sanity: unseen combinations of the same vocab
    test = spark.createDataFrame(
        [(9001, "quick fox runs over the lazy dog"), (9002, "xq7 xq300 xq12 xq99 xq5")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, test).collect()}
    assert s[9001] > 0.5 > s[9002]


def test_filter_by_quality_drops_low(spark, labeled):
    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=25)
    kept = filter_by_quality(model, labeled.drop("label"), threshold=0.5)
    labels = kept.join(labeled.select("doc_id", "label"), "doc_id")
    frac_good = labels.agg(F.avg("label")).first()[0]
    assert frac_good > 0.95


def test_training_is_deterministic(labeled):
    m1 = train_quality_classifier(labeled, n_features=1 << 12, max_iter=15)
    m2 = train_quality_classifier(labeled, n_features=1 << 12, max_iter=15)
    c1 = m1.stages[-1].coefficients.toArray()
    c2 = m2.stages[-1].coefficients.toArray()
    assert (c1 == c2).all()


def test_linear_score_bounds_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "some ordinary words here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", linear_quality_score(F.col("text")).alias("s")
        ).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert rows[2] == pytest.approx(0.5)  # sigmoid(0) for empty docs
    assert rows[3] == pytest.approx(0.5)


def test_linear_score_is_pure_projection(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        d.select(linear_quality_score(F.col("text")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


# --------------------------------------------------------------------------
# temperature sampling
# --------------------------------------------------------------------------


def test_temperature_keep_fractions_limits():
    counts = {"a": 100, "b": 400, "c": 25}
    # T=1: natural mix — keep everything
    assert temperature_keep_fractions(counts, 1.0) == {"a": 1.0, "b": 1.0, "c": 1.0}
    # T=2: keep_s = sqrt(min/c)
    f = temperature_keep_fractions(counts, 2.0)
    assert f["c"] == 1.0
    assert f["a"] == pytest.approx((25 / 100) ** 0.5)
    assert f["b"] == pytest.approx((25 / 400) ** 0.5)
    # T→∞: level to the smallest source
    f = temperature_keep_fractions(counts, 1e9)
    assert f["a"] == pytest.approx(0.25, rel=1e-6)
    assert f["b"] == pytest.approx(0.0625, rel=1e-6)
    with pytest.raises(ValueError):
        temperature_keep_fractions(counts, 0)


def test_temperature_sample_rebalances(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_sample(d, temperature=4.0, source_col="lang")
    before = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # smallest lang untouched; the dominant lang shrinks toward it
    small = min(before, key=before.get)
    big = max(before, key=before.get)
    assert after[small] == before[small]
    assert after[big] < before[big]
    ratio_before = before[big] / before[small]
    ratio_after = after[big] / after[small]
    assert ratio_after < ratio_before


def test_sample_to_fractions_is_replay_stable(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f = {"en": 0.5, "fr": 1.0}
    a = sorted(r["doc_id"] for r in sample_to_fractions(d, f, source_col="lang").collect())
    b = sorted(
        r["doc_id"]
        for r in sample_to_fractions(d.repartition(13), f, source_col="lang").collect()
    )
    assert a == b  # partitioning-independent, unlike sampleBy
    kept_langs = {
        r["lang"] for r in sample_to_fractions(d, f, source_col="lang").select("lang").distinct().collect()
    }
    assert kept_langs <= {"en", "fr"}  # absent sources dropped


def test_quality_model_persistence_roundtrip(spark, labeled, tmp_path):
    from pyspark.ml import PipelineModel

    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=15)
    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, labeled).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(back, labeled).collect()}
    assert a == b


def test_temperature_sample_with_null_sources(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else None) for i in range(60)], "doc_id long, lang string"
    )
    out = temperature_sample(df, temperature=2.0, source_col="lang")
    rows = out.collect()
    assert rows  # no crash; named sources survive
    assert all(r["lang"] is not None for r in rows)  # null sources dropped


def test_classifier_artifact_roundtrip(spark, labeled, tmp_path):
    """Train-once/score-everywhere: the fitted quality pipeline
    persists through ml/pipe save/load (the same artifact lifecycle as
    the BPE tokenizer, bpe_save/bpe_load) and the restored model
    produces BIT-IDENTICAL scores — a serving job never retrains."""
    from thundercats_spark.ml import pipe as P

    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=15)
    path = str(tmp_path / "quality_clf")
    P.save(path, model).get
    back = P.load(path).get

    before = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(model, labeled).collect()
    }
    after = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(back, labeled).collect()
    }
    assert before == after  # exact float equality: same weights, same plan
