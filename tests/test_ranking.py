"""Distributed global ranking (operators/ranking.py): exact equality
with the single-partition window formulations, without the sort
partition."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from thundercats_spark.operators.ranking import (
    global_row_number,
    grouped_row_number,
    ntile_from_rn,
)


@pytest.fixture(scope="module")
def rnd(spark):
    # adversarial shape: heavy ties on the primary sort key, unique
    # tie-break, sizes that do NOT divide evenly into partitions
    return spark.range(0, 10007).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).alias("v"),
        (F.col("id") % 5).cast("string").alias("g"),
    ).persist()


def test_global_row_number_equals_window(rnd):
    got = {
        r["k"]: (r["rn"], r["n"])
        for r in global_row_number(rnd, ["v", "k"], total_col="n").collect()
    }
    w = Window.orderBy("v", "k")
    want = {
        r["k"]: r["rn"]
        for r in rnd.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    assert len(got) == 10007
    assert all(got[k] == (want[k], 10007) for k in want)


def test_global_row_number_no_sort_partition(rnd):
    df = global_row_number(rnd, ["v", "k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point: the numbering window shuffles on the bucket id,
    # never onto a single sort partition
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(__b" in plan, plan


def test_global_row_number_empty(spark):
    e = spark.createDataFrame([], "k long, v long")
    assert global_row_number(e, ["v", "k"]).count() == 0


def test_grouped_row_number_equals_window(rnd):
    got = {
        r["k"]: (r["rn"], r["n"])
        for r in grouped_row_number(
            rnd, ["g"], ["v", "k"], total_col="n"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "k")
    want = {
        (r["k"]): (r["rn"], r["n"])
        for r in rnd.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(10, 4), (12, 4), (3, 5), (100, 7), (1, 1)])
def test_ntile_from_rn_matches_sql_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = [
        r["t"]
        for r in df.select(
            ntile_from_rn(F.col("rn"), F.lit(n).cast("long"), k).alias("t")
        ).orderBy("rn").collect()
    ]
    w = Window.orderBy("rn")
    want = [
        r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w)).orderBy("rn").collect()
    ]
    assert got == want, (n, k)


def test_null_ranking_keys_raise(spark):
    df = spark.createDataFrame(
        [(1, 1.0, "a"), (2, None, "a"), (3, 3.0, None)],
        "k long, v double, g string",
    )
    with pytest.raises(ValueError, match="NULL"):
        global_row_number(df, ["v", "k"])
    with pytest.raises(ValueError, match="NULL"):
        grouped_row_number(df.where("v is not null"), ["g"], ["v", "k"])
    # clean subset ranks fine
    clean = df.where("v is not null and g is not null")
    assert global_row_number(clean, ["v", "k"]).count() == 1


def test_grouped_row_number_max_groups_guard(spark):
    """High-cardinality groups must fail LOUDLY (the offset rows are
    O(buckets x groups) on the driver), pointing at the plain window —
    not crawl toward a driver OOM. Raising the bound explicitly works."""
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 200).cast("string").alias("g"),
    )
    with pytest.raises(ValueError, match="max_groups"):
        grouped_row_number(df, ["g"], ["k"], max_groups=100)
    out = grouped_row_number(df, ["g"], ["k"], max_groups=200)
    assert out.count() == 500


def test_sample_boundaries_respects_bucket_count(rnd):
    """n_partitions=1 means ONE bucket -> zero boundaries (the r05
    advice off-by-one appended one), and no request ever yields more
    than n_parts-1 boundaries."""
    from thundercats_spark.operators.ranking import _sample_boundaries

    total = rnd.count()
    assert _sample_boundaries(rnd, ["v", "k"], total, 1) == []
    for n_parts in (2, 3, 8):
        bounds = _sample_boundaries(rnd, ["v", "k"], total, n_parts)
        assert len(bounds) <= n_parts - 1, n_parts
    # and the full operator stays exact with a single requested bucket
    got = [
        r["rn"]
        for r in global_row_number(rnd, ["v", "k"], n_partitions=1)
        .orderBy("rn").collect()
    ]
    assert got == list(range(1, rnd.count() + 1))


def test_ntile_from_rn_exact_beyond_double_resolution(spark):
    """ntile arithmetic must stay in the integer domain: near 2^60 a
    double-precision quotient can cross an integer boundary and
    misassign a bucket. Pin exactness against Python's arbitrary-
    precision integers at the bucket edges, where fp error bites."""
    n = (1 << 60) + 7
    k = 7
    q, r = divmod(n, k)
    big = r * (q + 1)

    def expect(rn):
        if q == 0:
            return rn
        if rn <= big:
            return -(-rn // (q + 1))  # ceil
        return r + -(-(rn - big) // q)

    probes = [1, q, q + 1, big - 1, big, big + 1, big + q, n - 1, n]
    df = spark.createDataFrame([(int(p),) for p in probes], "rn long")
    got = {
        r2["rn"]: r2["t"]
        for r2 in df.select(
            "rn", ntile_from_rn(F.col("rn"), F.lit(n), k).alias("t")
        ).collect()
    }
    assert got == {p: expect(p) for p in probes}


def test_global_running_sum_matches_window(spark):
    from pyspark.sql import Window

    from thundercats_spark.operators.ranking import global_running_sum

    rows = [(i, (i * 37) % 101, (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, w long").repartition(7)
    got = {
        r["id"]: (r["cum_sum"], r["t"])
        for r in global_running_sum(
            df, ["k", "id"], "w", total_col="t", n_partitions=5
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("w").over(w)).collect()
    }
    total = sum(r[2] for r in rows)
    assert got.keys() == want.keys()
    for i in want:
        assert got[i] == (want[i], total), i


def test_global_running_sum_guards_and_edges(spark):
    from thundercats_spark.operators.ranking import global_running_sum

    empty = spark.createDataFrame([], "id long, w long")
    out = global_running_sum(empty, ["id"], "w", total_col="t")
    assert out.count() == 0
    withnull = spark.createDataFrame([(1, None)], "id long, w long")
    with pytest.raises(ValueError, match="NULL"):
        global_running_sum(withnull, ["id"], "w").collect()
    # fractional weights: double accumulation, approx vs sequential
    frac = spark.createDataFrame(
        [(i, 0.1 * (i % 5)) for i in range(50)], "id long, w double"
    )
    got = {
        r["id"]: r["cum_sum"]
        for r in global_running_sum(frac, ["id"], "w", n_partitions=4).collect()
    }
    acc, want = 0.0, {}
    for i in range(50):
        acc += 0.1 * (i % 5)
        want[i] = acc
    assert all(abs(got[i] - want[i]) < 1e-9 for i in want)


def test_ranking_ops_respect_caller_cache(spark):
    from thundercats_spark.operators.ranking import (
        global_row_number,
        global_running_sum,
    )

    df = spark.createDataFrame([(i, i % 7) for i in range(40)], "id long, w long")
    df = df.persist()
    try:
        df.count()
        assert df.is_cached
        global_row_number(df, ["id"]).collect()
        assert df.is_cached, "global_row_number dropped the caller's cache"
        global_running_sum(df, ["id"], "w").collect()
        assert df.is_cached, "global_running_sum dropped the caller's cache"
    finally:
        df.unpersist()


def test_global_running_sum_non_negative_guard(spark):
    from thundercats_spark.operators.ranking import global_running_sum

    df = spark.createDataFrame([(1, 5), (2, -1)], "id long, w long")
    # default: negatives allowed (a running delta is a legitimate use)
    out = {r["id"]: r["cum_sum"] for r in
           global_running_sum(df, ["id"], "w").collect()}
    assert out == {1: 5, 2: 4}
    with pytest.raises(ValueError, match="negative"):
        global_running_sum(df, ["id"], "w", non_negative=True).collect()


def test_exact_percentiles_matches_numpy_and_spark(spark):
    import numpy as np

    from thundercats_spark.operators.ranking import exact_percentiles

    vals = [((i * 37) % 101) * 1.5 for i in range(500)] + [None, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {r["p"]: r["value"] for r in
           exact_percentiles(df, "x", ps, n_partitions=6).collect()}
    clean = np.array([v for v in vals if v is not None])
    for p in ps:
        want = float(np.percentile(clean, p * 100, method="linear"))
        assert abs(got[p] - want) < 1e-9, p
    # matches Spark's own exact percentile aggregate too
    sp = df.agg(F.expr("percentile(x, array(0.25, 0.5, 0.99))")).first()[0]
    for p, w in zip((0.25, 0.5, 0.99), sp):
        assert abs(got[p] - w) < 1e-9


def test_exact_percentiles_edges(spark):
    from thundercats_spark.operators.ranking import exact_percentiles

    empty = spark.createDataFrame([(None,)], "x double")
    assert exact_percentiles(empty, "x", [0.5]).count() == 0
    one = spark.createDataFrame([(42.0,)], "x double")
    r = exact_percentiles(one, "x", [0.0, 0.5, 1.0]).collect()
    assert all(row["value"] == 42.0 for row in r)
    with pytest.raises(ValueError, match="non-empty"):
        exact_percentiles(one, "x", [])
    with pytest.raises(ValueError, match="0, 1"):
        exact_percentiles(one, "x", [1.5])


def test_exact_percentiles_grouped_matches_spark_agg(spark):
    from thundercats_spark.operators.ranking import exact_percentiles_grouped

    rows = [("g%d" % (i % 3), ((i * 37) % 101) * 0.5) for i in range(400)]
    rows += [("g0", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    ps = [0.25, 0.5, 0.99]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_percentiles_grouped(df, ["g"], "x", ps).collect()
    }
    want_rows = df.groupBy("g").agg(
        F.expr("percentile(x, array(0.25, 0.5, 0.99))").alias("v")
    ).collect()
    assert len(got) == 9
    for r in want_rows:
        for p, w in zip(ps, r["v"]):
            assert abs(got[(r["g"], p)] - w) < 1e-9, (r["g"], p)
    # empty input -> empty frame with the right schema
    empty = exact_percentiles_grouped(
        df.where(F.lit(False)), ["g"], "x", ps
    )
    assert empty.count() == 0 and empty.columns == ["g", "p", "value"]


def test_orders_value_percentiles_rewire_matches_legacy_agg(spark, sf_dir):
    """The rewired registered query must return exactly what the
    legacy single-reducer percentile() aggregate returned."""
    from thundercats_spark.queries import all_queries

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["p50"], r["p90"], r["p99"])
        for r in all_queries()["orders_value_percentiles"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    legacy = {
        r["o_orderpriority"]: (r["n_orders"], r["p50"], r["p90"], r["p99"])
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
        )
        .collect()
    }
    assert got == legacy


def test_exact_percentiles_tie_break_and_all_null_groups(spark):
    from thundercats_spark.operators.ranking import (
        exact_percentiles,
        exact_percentiles_grouped,
    )

    # heavily tied values: answer identical with and without tie-break
    rows = [(i, float(i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x double")
    a = {r["p"]: r["value"] for r in
         exact_percentiles(df, "x", [0.1, 0.5, 0.9]).collect()}
    b = {r["p"]: r["value"] for r in
         exact_percentiles(
             df, "x", [0.1, 0.5, 0.9], tie_break_cols=["id"]
         ).collect()}
    assert a == b
    g = {(r["g"], r["p"]): r["value"] for r in exact_percentiles_grouped(
        df.withColumn("g", F.col("id") % 2), ["g"], "x", [0.5],
        tie_break_cols=["id"],
    ).collect()}
    assert len(g) == 2
    # reserved-name guard
    with pytest.raises(ValueError, match="collide"):
        exact_percentiles_grouped(
            df.withColumnRenamed("id", "p"), ["p"], "x", [0.5]
        )


def test_rewired_percentile_queries_keep_all_null_groups(spark):
    """A group whose values are ALL NULL must keep its row (NULL
    percentiles), exactly as the GROUP BY oracles produce it."""
    from thundercats_spark.operators.ranking import exact_percentiles_grouped

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)],
        "g string, x double",
    )
    pct = exact_percentiles_grouped(df, ["g"], "x", [0.5])
    wide = pct.groupBy("g").agg(
        F.max(F.when(F.col("p") == 0.5, F.col("value"))).alias("p50")
    )
    counts = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    out = {r["g"]: (r["n"], r["p50"]) for r in
           counts.join(F.broadcast(wide), "g", "left").collect()}
    assert out == {"a": (2, 2.0), "b": (2, None)}


def test_ranking_ops_reject_helper_column_collisions(spark):
    """ADVICE r06: frames already carrying a helper name (__b/__wrn/
    __off/__tot) or the out_col must raise loudly instead of having
    the column silently replaced and dropped."""
    import pytest

    from thundercats_spark.operators.ranking import (
        global_row_number,
        global_running_sum,
        grouped_row_number,
    )

    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y")], "k long, w long, `__b` string"
    )
    with pytest.raises(ValueError, match="already exist"):
        global_row_number(df, ["k"])
    with pytest.raises(ValueError, match="already exist"):
        global_running_sum(df, ["k"], "w")
    with pytest.raises(ValueError, match="already exist"):
        grouped_row_number(df, ["w"], ["k"])
    # out_col collision on a clean frame
    clean = spark.createDataFrame([(1, 10), (2, 20)], "k long, rn long")
    with pytest.raises(ValueError, match="already exist"):
        global_row_number(clean, ["k"], out_col="rn")
    # total_col collision
    with pytest.raises(ValueError, match="already exist"):
        global_running_sum(clean, ["k"], "rn", out_col="c", total_col="k")


def test_global_row_number_multi_equals_singles(rnd):
    """r11 fusion: one multi invocation == three independent
    global_row_number calls, rank for rank, on an adversarially tied
    frame (and with an explicit n_partitions forcing real buckets)."""
    from thundercats_spark.operators.ranking import global_row_number_multi

    orders = [
        (["v", "k"], "rn_v"),
        (["k"], "rn_k"),
        (["g", "k"], "rn_g"),
    ]
    for n_parts in (None, 7):
        multi = {
            r["k"]: (r["rn_v"], r["rn_k"], r["rn_g"], r["n"])
            for r in global_row_number_multi(
                rnd, orders, total_col="n", n_partitions=n_parts
            ).collect()
        }
        for oc, out in orders:
            single = {
                r["k"]: r["rn"]
                for r in global_row_number(
                    rnd, oc, out_col="rn", n_partitions=n_parts
                ).collect()
            }
            idx = [o for _, o in orders].index(out)
            assert all(
                multi[k][idx] == single[k] for k in single
            ), f"order {oc} diverges at n_partitions={n_parts}"
        assert all(v[3] == 10007 for v in multi.values())


def test_adaptive_parts_small_frame_single_bucket(rnd):
    """r11: bucket count follows the measured total — a 10k-row frame
    gets the 2-bucket floor (one boundary literal instead of ~n_cpus,
    never a constant-foldable SinglePartition window) and still ranks
    exactly; the cap binds only at cluster-scale row counts."""
    from thundercats_spark.operators.ranking import _adaptive_parts

    assert _adaptive_parts(32, 10_007) == 2
    assert _adaptive_parts(32, 3 * (1 << 20)) == 3
    assert _adaptive_parts(32, 10**12) == 32  # cap: requested parallelism
    assert _adaptive_parts(32, 1, rows_per_bucket=1 << 20) == 2
    # exactness on the default (adaptive) path is covered by
    # test_global_row_number_equals_window running post-change; pin the
    # plan here: a small frame's numbering window still partitions on
    # the bucket column (constant bucket), never SinglePartition.
    df = global_row_number(rnd, ["v", "k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
