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
]
