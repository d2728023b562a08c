"""Util parity: declarative square-sum aggregates + model printers."""

import pytest

from thundercats_spark.physical.util import (
    Debugger,
    bind,
    sum_of_sqr,
    sum_of_sqr_diff,
)


def test_sum_of_sqr_and_diff(spark):
    df = spark.createDataFrame([(1, 3), (2, 5), (4, 1)], "a int, b int")
    assert sum_of_sqr(df, "a") == pytest.approx(1 + 4 + 16)
    assert sum_of_sqr_diff(df, "a", "b") == pytest.approx(4 + 9 + 9)
    assert sum_of_sqr(df.where("a < 0"), "a") == 0.0  # empty frame


def test_bind_lifts_into_mayfail(spark):
    df = spark.createDataFrame([(1,)], "x int")
    ok = bind(df, lambda d: d.selectExpr("x * 2 AS x"))
    assert ok.get.first()["x"] == 2
    err = bind(df, lambda d: d.select("missing_column"))
    assert err.get_error() is not None


def test_debugger_strings(spark):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import Binarizer, VectorAssembler

    inner = Pipeline(stages=[Binarizer(threshold=0.5, inputCol="v", outputCol="b")])
    pipe = Pipeline(stages=[VectorAssembler(inputCols=["x"], outputCol="v"), inner])
    s = Debugger.pipeline_to_string(pipe)
    assert "VectorAssembler" in s and "Binarizer" in s
    df = spark.createDataFrame([(0.2,), (0.9,)], "x double")
    model = Pipeline(stages=[
        VectorAssembler(inputCols=["x"], outputCol="v"),
        Binarizer(threshold=0.5, inputCol="x", outputCol="b"),
    ]).fit(df)
    ms = Debugger.model_to_string(model)
    assert "VectorAssembler" in ms and "Binarizer" in ms


def test_session_timezone_pinned_utc(spark):
    # epoch_us relies on NTZ->LTZ conversion being the fixed UTC mapping;
    # get_spark must pin the session timezone so host JVM zones (and their
    # DST transitions) can never bend time deltas.
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
