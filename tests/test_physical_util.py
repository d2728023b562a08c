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


def test_local_frame_matches_classic_createdataframe(spark):
    from pyspark.sql import types as T

    from thundercats_spark.physical.util import local_frame

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("b", T.IntegerType()),
        ]
    )
    rows = [(1, "a", 0.5, 7), (2, None, float("nan"), None), (3, "c", -1.0, 0)]
    got = local_frame(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema

    def norm(df):
        out = []
        for r in df.collect():
            vals = []
            for v in r:
                if isinstance(v, float) and v != v:
                    vals.append("nan")
                else:
                    vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=str)

    assert norm(got) == norm(want)
    # empty input keeps the exact schema
    empty = local_frame(spark, [], schema)
    assert empty.schema == schema and empty.count() == 0
    # the execution plan must be a local/Arrow scan, not a pickled RDD
    # (the whole point: no Python workers in consuming stages)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    # a date+decimal-free schema lands as LocalTableScan (zero tasks)
    assert "LocalTableScan" in plan
