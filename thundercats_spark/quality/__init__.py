from thundercats_spark.quality.classifier import (
    filter_by_quality,
    linear_quality_score,
    score_quality,
    train_quality_classifier,
)
from thundercats_spark.quality.checks import (
    Check,
    expect_in_range,
    expect_non_null,
    expect_row_count_between,
    expect_schema,
    expect_unique,
    validate,
)

__all__ = [
    "Check",
    "expect_schema",
    "expect_unique",
    "expect_non_null",
    "expect_in_range",
    "expect_row_count_between",
    "validate",
    "train_quality_classifier",
    "score_quality",
    "filter_by_quality",
    "linear_quality_score",
]
