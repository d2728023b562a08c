"""Z-order clustered writes + footer-stats pruning report
(physical/layout.py).

The pruning comparison is the point: the SAME data written three ways
(unsorted, linear-sorted on a, z-ordered on a+b) must show the
z-order layout pruning a box predicate on the NON-leading column
where the linear sort cannot — judged from real parquet footers via
the distributed report, not from plan text."""

import pytest
from pyspark.sql import functions as F

from thundercats_spark.physical.layout import (
    pruning_summary,
    scan_pruning_report,
    write_parquet_zorder,
    zorder_bounds,
    zorder_expr,
)


def _grid_df(spark, n=20_000, seed=7):
    # two independent uniform dimensions + a payload column
    return (
        spark.range(n)
        .withColumn("a", (F.xxhash64("id", F.lit(seed)) % 10_000 + 10_000) % 10_000)
        .withColumn("b", (F.xxhash64("id", F.lit(seed + 1)) % 10_000 + 10_000) % 10_000)
        .withColumn("payload", F.col("id") * 3)
    )


def test_zorder_expr_interleaves_known_bits(spark):
    # buckets: x in {0..3} (2 bits), y in {0..3} (2 bits); boundaries 1,2,3
    bounds = {"x": [1.0, 2.0, 3.0], "y": [1.0, 2.0, 3.0]}
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (2.0, 1.0)],
        "x double, y double",
    )
    got = [r["z"] for r in df.select(zorder_expr(bounds).alias("z")).collect()]
    # bit j of column c -> position j*k + (k-1-c); x is column 0 (high bit)
    def z(bx, by):
        out = 0
        for j in range(2):
            out |= ((bx >> j) & 1) << (2 * j + 1)
            out |= ((by >> j) & 1) << (2 * j)
        return out

    assert got == [z(0, 0), z(3, 0), z(0, 3), z(3, 3), z(2, 1)]
    # x-bucket outranks y-bucket at equal bit position
    assert z(1, 0) > z(0, 1)


def test_zorder_write_roundtrip_and_null_handling(spark, tmp_path):
    df = _grid_df(spark, 5_000).withColumn(
        "a", F.when(F.col("id") % 97 == 0, None).otherwise(F.col("a"))
    )
    path = str(tmp_path / "z")
    bounds = write_parquet_zorder(df, path, ["a", "b"], n_buckets=16, n_files=4)
    assert set(bounds) == {"a", "b"} and len(bounds["a"]) <= 15
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    # exact multiset equality, including the null-a rows (bucket 0)
    assert (
        df.select("id", "a", "b", "payload")
        .exceptAll(back.select("id", "a", "b", "payload"))
        .count()
        == 0
    )
    assert "__z" not in back.columns


def test_zorder_rejects_non_numeric_loudly(spark):
    df = spark.createDataFrame([(1, "x")], "a int, s string")
    with pytest.raises(TypeError, match="numeric"):
        write_parquet_zorder(df, "/tmp/never", ["a", "s"])
    with pytest.raises(ValueError, match="not in frame"):
        write_parquet_zorder(df, "/tmp/never", ["nope"])
    # helper-name collision refuses instead of silently dropping data
    clash = spark.createDataFrame([(1, 2, 3)], "a int, b int, __z int")
    with pytest.raises(ValueError, match="helper column"):
        write_parquet_zorder(clash, "/tmp/never", ["a", "b"])


def test_zorder_sidecar_records_layout(spark, tmp_path):
    from thundercats_spark.physical.layout import read_layout_meta

    df = _grid_df(spark, 3_000)
    path = str(tmp_path / "meta")
    bounds = write_parquet_zorder(df, path, ["a", "b"], n_buckets=16, n_files=4)
    meta = read_layout_meta(spark, path)
    assert meta["cols"] == ["a", "b"] and meta["n_buckets"] == 16
    assert meta["n_files"] == len(spark.read.parquet(path).inputFiles()) == 4
    assert meta["bounds"]["a"] == bounds["a"]
    # the sidecar is invisible to Spark's parquet scan
    assert spark.read.parquet(path).count() == 3_000
    # absent on datasets this module didn't write
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    assert read_layout_meta(spark, plain) is None


def test_maintain_zorder_degenerate_health_never_rebuilds(spark, tmp_path):
    from thundercats_spark.physical.layout import maintain_zorder

    path = str(tmp_path / "const")
    df = spark.createDataFrame([(5.0, 5.0)] * 100, "a double, b double")
    write_parquet_zorder(df, path, ["a", "b"], n_buckets=4, n_files=2)
    res = maintain_zorder(spark, path, rebuild_above=0.25)
    assert res["rebuilt"] is False and "degenerate" in res["reason"]


def test_pruning_report_exact_on_handmade_file(spark, tmp_path):
    path = str(tmp_path / "one")
    spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, v long"
    ).coalesce(1).write.parquet(path)
    # excluded box: k in [1000, 2000] — min/max [0,99] cannot match
    rep = scan_pruning_report(spark, path, {"k": (1000, 2000)})
    s = pruning_summary(rep)
    assert s["files"] == 1 and s["may_match_row_groups"] == 0
    assert s["row_group_skip_fraction"] == 1.0
    # covering box matches everything
    s2 = pruning_summary(scan_pruning_report(spark, path, {"k": (0, None)}))
    assert s2["may_match_row_groups"] == s2["row_groups"] >= 1
    # unknown predicate column fails loudly, not silently conservative
    with pytest.raises(Exception, match="not in parquet schema"):
        scan_pruning_report(spark, path, {"zzz": (0, 1)}).collect()


def test_zorder_prunes_nonleading_column_where_linear_sort_cannot(spark, tmp_path):
    df = _grid_df(spark).cache()
    try:
        n_files = 32
        p_plain = str(tmp_path / "plain")
        p_linear = str(tmp_path / "linear")
        p_z = str(tmp_path / "zorder")
        df.repartition(n_files).write.parquet(p_plain)
        df.repartitionByRange(n_files, "a").sortWithinPartitions("a").write.parquet(
            p_linear
        )
        write_parquet_zorder(df, p_z, ["a", "b"], n_buckets=64, n_files=n_files)

        box_b = {"b": (1000, 1999)}  # ~10% of the b range
        frac = {
            name: pruning_summary(scan_pruning_report(spark, p, box_b))[
                "row_group_skip_fraction"
            ]
            for name, p in [("plain", p_plain), ("linear", p_linear), ("z", p_z)]
        }
        # random and a-sorted layouts leave b unclustered: ~no skipping
        assert frac["plain"] <= 0.1 and frac["linear"] <= 0.1
        # z-order clusters b too: most row groups are skippable
        assert frac["z"] >= 0.5, frac

        # honest trade: on the leading column the dedicated sort wins
        box_a = {"a": (1000, 1999)}
        fa_linear = pruning_summary(scan_pruning_report(spark, p_linear, box_a))[
            "row_group_skip_fraction"
        ]
        fa_z = pruning_summary(scan_pruning_report(spark, p_z, box_a))[
            "row_group_skip_fraction"
        ]
        assert fa_linear >= fa_z >= 0.5
        # 2-D box: only the z layout prunes on BOTH dimensions
        box_ab = {"a": (1000, 1999), "b": (1000, 1999)}
        fab_z = pruning_summary(scan_pruning_report(spark, p_z, box_ab))[
            "row_group_skip_fraction"
        ]
        assert fab_z > fa_z
    finally:
        df.unpersist()


def test_zorder_bounds_dedup_on_constant_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(1000)], "a long, c double"
    )
    bounds = zorder_bounds(df, ["a", "c"], n_buckets=8)
    assert bounds["c"] == [5.0]  # collapsed, not 7 duplicate boundaries
    # and the write still round-trips
    path = str(tmp_path / "const")
    write_parquet_zorder(df, path, ["a", "c"], n_buckets=8, n_files=2)
    assert spark.read.parquet(path).count() == 1000


def test_zorder_bit_budget_guard():
    bounds = {f"c{i}": list(range(1, 70_000)) for i in range(4)}
    with pytest.raises(ValueError, match="bit budget"):
        zorder_expr({k: [float(x) for x in v] for k, v in bounds.items()})


def test_file_minmax_report_exact_bounds(spark, tmp_path):
    path = str(tmp_path / "mm")
    spark.createDataFrame(
        [(i, 100 - i) for i in range(50)], "x long, y long"
    ).coalesce(1).write.parquet(path)
    from thundercats_spark.physical.layout import file_minmax_report

    r = file_minmax_report(spark, path, ["x", "y"]).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["x_min"], row["x_max"]) == (0.0, 49.0)
    assert (row["y_min"], row["y_max"]) == (51.0, 100.0)
    assert row["rows"] == 50


def test_maintain_zorder_rebuilds_on_append_degradation(spark, tmp_path):
    from thundercats_spark.physical.layout import (
        clustering_health,
        file_minmax_report,
        maintain_zorder,
    )

    df = _grid_df(spark, 20_000)
    path = str(tmp_path / "d")
    write_parquet_zorder(df, path, ["a", "b"], n_buckets=64, n_files=32)
    fresh = clustering_health(file_minmax_report(spark, path, ["a", "b"]), ["a", "b"])
    assert fresh["mean_box_volume"] < 0.15, fresh

    # below threshold: no-op, files untouched
    before_files = set(spark.read.parquet(path).inputFiles())
    res = maintain_zorder(spark, path, ["a", "b"], rebuild_above=0.25)
    assert res["rebuilt"] is False
    assert set(spark.read.parquet(path).inputFiles()) == before_files

    # unclustered appends degrade health (each appended file is a
    # full-width box)
    extra = _grid_df(spark, 20_000, seed=99).withColumn(
        "id", F.col("id") + 1_000_000
    )
    extra.repartition(32).write.mode("append").parquet(path)
    degraded = clustering_health(
        file_minmax_report(spark, path, ["a", "b"]), ["a", "b"]
    )
    assert degraded["mean_box_volume"] > fresh["mean_box_volume"] * 2

    # bare call: cols/n_buckets/n_files all come from the sidecar, so
    # the rebuild reproduces the ORIGINAL granularity
    res2 = maintain_zorder(spark, path, rebuild_above=0.25)
    assert res2["rebuilt"] is True
    assert res2["health_after"]["mean_box_volume"] < 0.15
    assert len(spark.read.parquet(path).inputFiles()) == 32
    back = spark.read.parquet(path)
    assert back.count() == 40_000
    # every row survived the rebuild, appended ones included
    assert (
        df.unionByName(extra).exceptAll(back.select(*df.columns)).count() == 0
    )


def test_parquet_bloom_writes_filter_blocks(spark, tmp_path):
    """The bloom block is pinned via the file-size delta (container
    pyarrow predates bloom-offset metadata): same data, bloom on the
    hash column costs ~1.25 bytes/NDV more; blooming BOTH columns
    costs more again; rows round-trip; bad columns fail loudly."""
    from thundercats_spark.physical.io import Write

    df = spark.range(100_000).selectExpr(
        "id", "xxhash64(cast(id as string)) as fp"
    )

    def size_of(p):
        import glob
        import os

        return sum(
            os.path.getsize(f) for f in glob.glob(p + "/*.parquet")
        )

    p0 = str(tmp_path / "plain")
    df.coalesce(1).write.parquet(p0)
    p1 = str(tmp_path / "bloom_fp")
    Write.parquet_bloom(df.coalesce(1), p1, {"fp": 100_000}).get
    p2 = str(tmp_path / "bloom_both")
    Write.parquet_bloom(df.coalesce(1), p2, ["fp", "id"]).get  # auto-NDV

    s0, s1, s2 = size_of(p0), size_of(p1), size_of(p2)
    assert s1 > s0 + 50_000, (s0, s1)  # ~130 KB bloom block at 100k NDV
    assert s2 > s1 + 50_000, (s1, s2)  # second column adds its own block
    assert spark.read.parquet(p1).count() == 100_000
    back = spark.read.parquet(p2)
    assert back.where("fp = 0 and id = -1").count() == 0  # probe path runs

    # monadic failure, like every sibling writer
    res = Write.parquet_bloom(df, str(tmp_path / "x"), ["nope"])
    assert res.is_failing and "not in frame" in res.get_error()


def test_parquet_bloom_with_sorted_layout(spark, tmp_path):
    """sort_cols layers range clustering under the bloom filters: the
    files are range-disjoint on the sort key (footer-verified) AND
    carry the bloom block."""
    from thundercats_spark.physical.io import Write
    from thundercats_spark.physical.layout import file_minmax_report

    df = spark.range(50_000).selectExpr(
        "id", "xxhash64(cast(id as string)) as fp"
    )
    p = str(tmp_path / "sb")
    Write.parquet_bloom(
        df, p, {"fp": 50_000}, sort_cols=["id"], n_files=4
    ).get
    boxes = sorted(
        (r["id_min"], r["id_max"])
        for r in file_minmax_report(spark, p, ["id"]).collect()
    )
    assert len(boxes) == 4
    for (lo1, hi1), (lo2, _) in zip(boxes, boxes[1:]):
        assert hi1 < lo2  # disjoint ranges: the sort really happened
