from thundercats_spark.functional.maybe import (
    Fail,
    IgnorableFail,
    MayFail,
    Ok,
    Pipe,
    pipeline,
)

__all__ = ["MayFail", "Ok", "Fail", "IgnorableFail", "Pipe", "pipeline"]
