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


# --------------------------------------------------------------------------
# incremental rollup maintenance
# --------------------------------------------------------------------------

import pytest
from pyspark.sql import functions as F

from thundercats_spark.operators.incremental import rollup_update

METRICS = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _batches(spark):
    b1 = spark.createDataFrame(
        [("d1", "a", 10), ("d1", "a", 5), ("d1", "b", 7), ("d2", "a", 1)],
        "day string, k string, v int",
    )
    b2 = spark.createDataFrame(
        [("d2", "a", 4), ("d2", "b", 9), ("d3", "c", 2)],
        "day string, k string, v int",
    )
    b3 = spark.createDataFrame([("d1", "a", 100)], "day string, k string, v int")
    return [b1, b2, b3]


def _expected(spark, batches):
    full = batches[0]
    for b in batches[1:]:
        full = full.unionByName(b)
    return {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in full.groupBy("day", "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


@pytest.mark.parametrize("partitioned", [True, False])
def test_rollup_update_equals_full_recompute(spark, tmp_path, partitioned):
    path = str(tmp_path / "rollup")
    batches = _batches(spark)
    for b in batches:
        rollup_update(
            spark, b, path, ["day", "k"], METRICS,
            partition_col="day" if partitioned else None,
        )
    got = {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == _expected(spark, batches)


def test_rollup_update_prunes_untouched_partitions(spark, tmp_path):
    path = str(tmp_path / "rollup")
    batches = _batches(spark)
    rollup_update(spark, batches[0], path, ["day", "k"], METRICS, partition_col="day")
    # d1/d2 exist; a batch touching only d1 must read back only day=d1
    existing = spark.read.parquet(path).where(F.col("day").isin(["d1"]))
    plan = existing._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "d1" in plan
    before_d2 = {
        (r["day"], r["k"]): r["total"]
        for r in spark.read.parquet(path).where("day = 'd2'").collect()
    }
    rollup_update(spark, batches[2], path, ["day", "k"], METRICS, partition_col="day")
    after_d2 = {
        (r["day"], r["k"]): r["total"]
        for r in spark.read.parquet(path).where("day = 'd2'").collect()
    }
    assert before_d2 == after_d2  # untouched partition byte-stable


def test_rollup_update_hll_approx_distinct(spark, tmp_path):
    from thundercats_spark.operators.incremental import hll_estimate

    path = str(tmp_path / "rollup")
    metrics = {"uniq": ("approx_distinct", "k"), "n": ("count", "*")}
    batches = _batches(spark)
    for b in batches:
        rollup_update(spark, b, path, ["day"], metrics, partition_col="day")
    got = {
        r["day"]: r["uniq"]
        for r in hll_estimate(spark.read.parquet(path), "uniq").collect()
    }
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    exact = {
        r["day"]: r["u"]
        for r in full.groupBy("day").agg(F.count_distinct("k").alias("u")).collect()
    }
    # tiny cardinalities: the HLL estimate is exact
    assert got == exact


def test_rollup_update_rejects_non_distributive(spark, tmp_path):
    with pytest.raises(ValueError, match="mergeable"):
        rollup_update(
            spark, _batches(spark)[0], str(tmp_path / "r"), ["day"],
            {"a": ("avg", "v")},
        )
    with pytest.raises(ValueError, match="group keys"):
        rollup_update(
            spark, _batches(spark)[0], str(tmp_path / "r"), ["day"],
            METRICS, partition_col="k",
        )


def test_rollup_partition_values_with_escapes_and_null(spark, tmp_path):
    """Partition values Spark Hive-escapes (':' -> '%3A') and NULL
    partitions must survive the swap — regression for the
    reconstructed-dir-name bug that silently dropped them."""
    path = str(tmp_path / "rollup")
    metrics = {"total": ("sum", "v")}
    b1 = spark.createDataFrame(
        [("web:en", 5), (None, 3), ("plain", 1)], "src string, v int"
    )
    b2 = spark.createDataFrame(
        [("web:en", 2), (None, 4)], "src string, v int"
    )
    rollup_update(spark, b1, path, ["src"], metrics, partition_col="src")
    rollup_update(spark, b2, path, ["src"], metrics, partition_col="src")
    got = {r["src"]: r["total"] for r in spark.read.parquet(path).collect()}
    assert got == {"web:en": 7, None: 7, "plain": 1}


def test_rollup_partitioned_crash_between_swaps_recovers(spark, tmp_path, monkeypatch):
    """Kill the swap loop between two partition swaps, then replay the
    batch with the same state_doc: the already-swapped partition must
    be SKIPPED (not re-merged/double-counted) and the missing one
    completed — final table equals the straight-through run."""
    import thundercats_spark.operators.incremental as inc

    path = str(tmp_path / "rollup")
    batches = _batches(spark)
    rollup_update(
        spark, batches[0], path, ["day", "k"], METRICS,
        partition_col="day", state_doc={"batch_id": 0},
    )

    real_swap = inc._swap_dir
    calls = {"n": 0}

    def dying_swap(new, target):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash between partition swaps")
        real_swap(new, target)

    # batch 1 touches d2 and d3 -> two partition swaps; die on the 2nd
    monkeypatch.setattr(inc, "_swap_dir", dying_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        rollup_update(
            spark, batches[1], path, ["day", "k"], METRICS,
            partition_col="day", state_doc={"batch_id": 1},
        )
    monkeypatch.setattr(inc, "_swap_dir", real_swap)
    # exactly one partition published with batch 1's journal
    published = [
        d for d in sorted(__import__("os").listdir(path))
        if d.startswith("day=")
        and inc.rollup_state(f"{path}/{d}") == {"batch_id": 1}
    ]
    assert len(published) == 1
    # leftover staging from the crash must not break the replay
    rollup_update(
        spark, batches[1], path, ["day", "k"], METRICS,
        partition_col="day", state_doc={"batch_id": 1},
    )
    got = {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == _expected(spark, batches[:2])
    # a full replay of an already-complete batch is a no-op too
    rollup_update(
        spark, batches[1], path, ["day", "k"], METRICS,
        partition_col="day", state_doc={"batch_id": 1},
    )
    got2 = {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in spark.read.parquet(path).collect()
    }
    assert got2 == _expected(spark, batches[:2])


def test_mid_swap_crash_restores_old_backup(spark, tmp_path):
    """The r05 advice crash window: dying INSIDE _swap_dir between
    os.rename(target, backup) and os.rename(new, target) leaves the
    rollup's only history in ``.old``. The next rollup_update must
    restore the backup BEFORE merging — otherwise the merge reads a
    missing target and the swap's cleanup deletes the only copy
    (permanent history loss). Covers the unpartitioned root and a
    partition dir of the partitioned layout."""
    import os
    import shutil

    batches = _batches(spark)

    # unpartitioned root
    path = str(tmp_path / "flat")
    rollup_update(spark, batches[0], path, ["day", "k"], METRICS,
                  state_doc={"batch_id": 0})
    # simulate the mid-swap crash: history parked in .old, target gone
    os.rename(path, path + ".old")
    rollup_update(spark, batches[1], path, ["day", "k"], METRICS,
                  state_doc={"batch_id": 1})
    got = {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == _expected(spark, batches[:2])
    assert not os.path.exists(path + ".old")

    # partitioned layout: one partition dir mid-swap
    ppath = str(tmp_path / "part")
    rollup_update(spark, batches[0], ppath, ["day", "k"], METRICS,
                  partition_col="day", state_doc={"batch_id": 0})
    d2 = os.path.join(ppath, "day=d2")
    os.rename(d2, d2 + ".old")
    rollup_update(spark, batches[1], ppath, ["day", "k"], METRICS,
                  partition_col="day", state_doc={"batch_id": 1})
    pgot = {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in spark.read.parquet(ppath).collect()
    }
    assert pgot == _expected(spark, batches[:2])
    assert not os.path.exists(d2 + ".old")

    # completed-swap leftover (target present AND stale .old): the
    # recovery must drop the stale backup, not resurrect it
    stale = str(tmp_path / "stale")
    rollup_update(spark, batches[0], stale, ["day", "k"], METRICS,
                  state_doc={"batch_id": 0})
    shutil.copytree(stale, stale + ".old")
    rollup_update(spark, batches[1], stale, ["day", "k"], METRICS,
                  state_doc={"batch_id": 1})
    sgot = {
        (r["day"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in spark.read.parquet(stale).collect()
    }
    assert sgot == _expected(spark, batches[:2])
    assert not os.path.exists(stale + ".old")
