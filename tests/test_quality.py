"""Data-quality expectation gates (single-agg-pass validation)."""

from thundercats_spark.quality import (
    expect_in_range,
    expect_non_null,
    expect_row_count_between,
    expect_schema,
    expect_unique,
    validate,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.5), (3, None, 9.9)],
        "id int, name string, score double",
    )


def test_all_checks_pass(spark):
    out = validate(
        _df(spark),
        expect_unique(["id"]),
        expect_non_null(["id", "score"]),
        expect_in_range("score", 0.0, 10.0),
        expect_row_count_between(1, 100),
        expect_schema({"id": "int", "score": "double"}),
    )
    assert not out.is_failing
    assert out.get.count() == 3


def test_violations_all_reported(spark):
    df = _df(spark).unionAll(_df(spark))  # duplicates everything
    out = validate(
        df,
        expect_unique(["id"]),
        expect_non_null(["name"]),
        expect_in_range("score", 0.0, 8.0),
        expect_row_count_between(100),
        expect_schema({"id": "bigint", "missing_col": "int"}),
    )
    assert out.is_failing
    err = out.get_error()
    assert "3 duplicate rows" in err
    assert "name=2" in err
    assert "2 rows out of range" in err
    assert "row_count_between" in err and "got 6" in err
    assert "missing column missing_col" in err
    assert "id is int, expected bigint" in err


def test_validate_composes_with_pipeline(spark):
    df = _df(spark)
    chained = validate(df, expect_unique(["id"])).flat_map(
        lambda ok: validate(ok, expect_non_null(["id"]))
    )
    assert not chained.is_failing


def test_single_agg_job(spark):
    # all row-level metrics fold into ONE aggregation: the validate call
    # triggers exactly one job on a fresh DataFrame
    df = _df(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    validate(
        df,
        expect_unique(["id"]),
        expect_non_null(["id", "name", "score"]),
        expect_in_range("score", 0.0, 10.0),
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= 3  # one agg pass (AQE splits it into sub-jobs)


def test_quality_properties_hypothesis(spark):
    """Property: validate() verdicts agree with direct recomputation on
    arbitrary small frames."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rowss = st.lists(
        st.tuples(st.integers(0, 5), st.one_of(st.none(), st.floats(0, 100))),
        min_size=1,
        max_size=12,
    )

    @given(rowss)
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def run(rows):
        df = spark.createDataFrame(rows, "k int, v double")
        out = validate(df, expect_unique(["k"]), expect_non_null(["v"]))
        ks = [r[0] for r in rows]
        vs = [r[1] for r in rows]
        should_fail = len(ks) != len(set(ks)) or any(v is None for v in vs)
        assert out.is_failing == should_fail

    run()
