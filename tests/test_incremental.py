"""High-watermark incremental batch processing."""

from thundercats_spark.operators.incremental import read_incremental, read_watermark


def test_incremental_watermark_cycle(spark, tmp_path):
    path = str(tmp_path / "data")
    state = str(tmp_path / "state.json")

    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00")],
        "id int, ts string",
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts").write.parquet(path)

    first = read_incremental(spark, path, state, "ts")
    assert first.frame.count() == 2  # no watermark yet → everything
    first.commit()
    assert read_watermark(state) == "2024-01-02 00:00:00"

    # nothing new: empty window, commit is a no-op
    second = read_incremental(spark, path, state, "ts")
    assert second.frame.count() == 0
    assert second.new_watermark is None
    second.commit()
    assert read_watermark(state) == "2024-01-02 00:00:00"

    # append newer + older rows: only strictly-newer ones flow
    spark.createDataFrame(
        [(3, "2024-01-03 00:00:00"), (0, "2023-12-31 00:00:00")],
        "id int, ts string",
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts").write.mode("append").parquet(path)

    third = read_incremental(spark, path, state, "ts")
    rows = third.frame.collect()
    assert [r["id"] for r in rows] == [3]
    third.commit()
    assert read_watermark(state) == "2024-01-03 00:00:00"


def test_uncommitted_run_reprocesses(spark, tmp_path):
    path = str(tmp_path / "data")
    state = str(tmp_path / "state.json")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "id int, ts string"
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts").write.parquet(path)

    inc = read_incremental(spark, path, state, "ts")
    assert inc.frame.count() == 1
    # crash before commit → same window again (at-least-once)
    again = read_incremental(spark, path, state, "ts")
    assert again.frame.count() == 1
