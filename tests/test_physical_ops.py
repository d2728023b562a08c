"""Relational operators on tiny literal frames (mirrors reference
AllTest.scala "Basic operations" / "Util test" / "Agg test" /
"Optimisation test" groups)."""

import pyspark.sql.functions as F
import pytest

from thundercats_spark.physical.io import schema_map
from thundercats_spark.physical.ops import Agg, F_, Filter, Group, Join, Optimise, Order, Transform


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "a", 40.0)],
        "id int, grp string, v double",
    )


@pytest.fixture(scope="module")
def lookup(spark):
    return spark.createDataFrame([("a", "alpha"), ("b", "beta")], "grp string, name string")


def test_join_left(people, lookup):
    out = Join.left(people, lookup, ["grp"]).get
    rows = {r["id"]: r["name"] for r in out.collect()}
    assert rows == {1: "alpha", 2: "beta", 3: None, 4: "alpha"}


def test_join_inner_on_expr(people, lookup):
    out = Join.inner(people, lookup, people.grp == lookup.grp).get
    assert out.count() == 3


def test_join_outer(spark):
    a = spark.createDataFrame([(1, "x")], "k int, a string")
    b = spark.createDataFrame([(2, "y")], "k int, b string")
    out = Join.outer(a, b, ["k"]).get
    assert out.count() == 2


def test_join_broadcast_plans_bhj(people, lookup):
    out = Join.broadcast_df(people, lookup, on=["grp"], right_columns=["name"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 3  # inner semantics: grp 'c' drops


def test_join_broadcast_multi_key(spark):
    big = spark.createDataFrame([(1, "x", 5), (1, "y", 6), (2, "x", 7)], "k1 int, k2 string, v int")
    tiny = spark.createDataFrame([(1, "x", "m1"), (2, "x", "m2")], "k1 int, k2 string, m string")
    out = Join.broadcast_df(big, tiny, on=["k1", "k2"], right_columns=["m"])
    assert {(r["k1"], r["k2"], r["m"]) for r in out.collect()} == {(1, "x", "m1"), (2, "x", "m2")}


def test_group_agg_map(people):
    out = Group.agg_map_df(people, ["grp"], {"v": "sum"})
    got = {r["grp"]: r["sum(v)"] for r in out.collect()}
    assert got["a"] == 50.0 and got["b"] == 20.0


def test_group_agg_cols(people):
    out = Group.agg_df(people, ["grp"], [F.min("v").alias("mn"), F.max("v").alias("mx")])
    got = {r["grp"]: (r["mn"], r["mx"]) for r in out.collect()}
    assert got["a"] == (10.0, 40.0)


def test_group_pivot(people):
    out = Group.pivot_df(people, ["grp"], "id", F.sum("v"), values=["1", "2"])
    assert set(out.columns) == {"grp", "1", "2"}


def test_filter_where(people):
    assert Filter.where(people, F.col("v") > 15).get.count() == 2


def test_filter_na(people):
    assert Filter.na(people, ["v"]).get.count() == 3


def test_filter_by_range(people):
    assert Filter.by_range(people, "v", (10, 20)).get.count() == 2


def test_order_by(people):
    out = Order.by(people, ["v"], ascending=False).get
    assert out.first()["id"] in (3, 4)  # nulls last... spark puts desc nulls last? check id 4
    out2 = Order.by(Filter.na(people, ["v"]).get, ["v"]).get
    assert [r["id"] for r in out2.collect()] == [1, 2, 4]


def test_add_col(people):
    out = F_.add_col(people, "flag", F.lit(True)).get
    assert out.schema["flag"].dataType.simpleString() == "boolean"


def test_add_cols_single_projection(people):
    out = F_.add_cols(people, {"x": F.lit(1), "y": F.lit(2)}).get
    assert {"x", "y"} <= set(out.columns)


def test_agg_reduce(people):
    assert Agg.reduce(people, "v", "sum").get == 70.0
    assert Agg.reduce(people, "v", "min").get == 10.0


def test_agg_by_key(people):
    out = Agg.by_key_df(people, "grp", "v", "max")
    got = {r["grp"]: r["v"] for r in out.collect()}
    assert got["a"] == 40.0


def test_optimise_materialise(people):
    out = Optimise.materialise(people).get
    assert out.is_cached


def test_optimise_snapshot(people, tmp_path):
    out = Optimise.snapshot(people, str(tmp_path)).get
    assert out.count() == 4
    # lineage is cut: plan is a bare file scan
    assert "Scan parquet" in out._jdf.queryExecution().executedPlan().toString()


def test_optimise_repar(people):
    assert Optimise.repar(people, 4).get.rdd.getNumPartitions() == 4
    assert Optimise.repar(people, 1).get.rdd.getNumPartitions() == 1
    assert Optimise.repar(people, cols=["grp"]).get.count() == 4


def test_transform_select_rename(people):
    out = Transform.select(people, ["id", "grp"]).get
    out = Transform.rename(out, {"grp": "g"}).get
    assert out.columns == ["id", "g"]


def test_schema_map(people):
    assert schema_map(people) == {"id": "int", "grp": "string", "v": "double"}


def test_bind_operator(people):
    from thundercats_spark.functional.maybe import Pipe

    out = (Pipe(people) >> (lambda df: df.filter(F.col("id") > 1)) >> (lambda df: df.count())).done
    assert out.get == 3


def test_reduce_rdd_arbitrary_fn(people):
    from thundercats_spark.physical.ops import reduce_rdd

    out = reduce_rdd(people.where(F.col("v").isNotNull()), "v", lambda a, b: a * b).get
    assert out == 10.0 * 20.0 * 40.0
