"""Model-based document quality filtering — the classifier stage of an
LLM-curation pipeline (the CCNet / GPT-3 "quality filter" pattern:
score every crawl document against a model trained to recognize
high-quality text, keep the high-scoring tail).

Two tiers:

1. ``train_quality_classifier`` / ``score_quality`` — a real trainable
   model: hashed bag-of-token features (HashingTF — the fasttext
   trick: no vocabulary to build or ship, just a feature dimension)
   into Spark ML logistic regression. Training is a Spark job
   (distributed L-BFGS over the feature matrix); scoring is a
   per-row model transform — embarrassingly parallel, no shuffle.

2. ``linear_quality_score`` — a pure-expression linear scorer over the
   engine-portable ``token_ids`` hash space with md5-derived fixed
   weights. This is the *serving* shape of tier 1 (w·x + b through a
   sigmoid) with a deterministic stand-in weight table, so the scoring
   path is oracle-checkable end-to-end in any SQL engine; swap the
   hash-derived weight expression for a broadcast weight-array lookup
   to serve a trained model without changing the plan shape.

Scale: HashingTF + LogisticRegression both operate on sparse vectors;
the training shuffle moves gradient partials (dim-bounded), never
text. Scoring is scan-stage only.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_feature_pipeline(
    text_col: str = "text",
    n_features: int = 1 << 18,
    features_col: str = "features",
) -> list:
    """Tokenize on non-word boundaries and hash each token into a
    fixed ``n_features``-dim sparse count vector. 2^18 features keeps
    hash collisions rare for natural-language vocabularies while the
    model stays ~2 MB — broadcastable to every executor."""
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol=features_col, numFeatures=n_features
    )
    return [tok, tf]


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> PipelineModel:
    """Fit tokenizer → HashingTF → LogisticRegression on labeled docs
    (label 1 = high quality reference text, 0 = rejected/crawl text —
    the standard weak-supervision setup trains against a trusted
    corpus vs raw crawl). Deterministic: L-BFGS from a zero init has
    no RNG dependence."""
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    pipe = Pipeline(stages=[*quality_feature_pipeline(text_col, n_features), lr])
    return pipe.fit(df)


def score_quality(
    model: PipelineModel, df: DataFrame, score_col: str = "quality_prob"
) -> DataFrame:
    """P(high quality) per document. Pure transform — scan-stage, no
    shuffle; the model broadcast is the only data movement."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        score_col, vector_to_array(F.col("probability"))[1]
    ).drop("__tokens", "features", "rawPrediction", "probability", "prediction")


def filter_by_quality(
    model: PipelineModel,
    df: DataFrame,
    threshold: float = 0.5,
    score_col: str = "quality_prob",
) -> DataFrame:
    return score_quality(model, df, score_col).where(F.col(score_col) >= threshold)


# --------------------------------------------------------------------------
# Tier 2: oracle-portable linear scorer (the serving plan shape)
# --------------------------------------------------------------------------


def _hash_weight(token_id: Column, salt: str = "w") -> Column:
    """Deterministic weight in [-1, 1] from a token id: md5-derived,
    so DuckDB/any engine computes the identical table. Serving a
    *trained* model replaces this expression with
    ``element_at(lit(weights), token_id + 1)`` — same plan, real
    coefficients."""
    h = F.md5(F.concat(F.lit(salt + ":"), token_id.cast("string")))
    raw = F.conv(F.substring(h, 1, 6), 16, 10).cast("long")
    return (raw % 2001 - 1000).cast("double") / F.lit(1000.0)


def linear_quality_score(
    text: Column,
    vocab_size: int = 1024,
    salt: str = "w",
    bias: float = 0.0,
) -> Column:
    """sigmoid(mean_token weight(token_id) + bias) — a linear text
    classifier in pure JVM expressions (token hash → weight lookup →
    mean → sigmoid). Empty docs score sigmoid(bias). The mean (not
    sum) keeps scores length-invariant, matching how fasttext averages
    token vectors."""
    from thundercats_spark.functions.text_analysis import token_ids

    ids = token_ids(text, vocab_size=vocab_size)
    total = F.aggregate(
        ids, F.lit(0.0), lambda acc, i: acc + _hash_weight(i, salt)
    )
    n = F.size(ids)
    mean = F.when(n > 0, total / n.cast("double")).otherwise(F.lit(0.0))
    z = mean + F.lit(float(bias))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
