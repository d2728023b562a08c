"""Skew operators (salted agg/join equivalence) + profiling pass."""

import pyspark.sql.functions as F
import pytest

from thundercats_spark.functions.profiling import (
    approx_quantiles,
    crosstab,
    freq_items,
    null_ratio,
    summarize,
)
from thundercats_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["sum_v"])
        for r in salted_agg(skewed, ["k"], sum_cols=["v"], salt_on="v").collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"], buckets=8, salt_on="v").groupBy(
        "k", "label"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    out = salted_join(skewed, dim, ["k"], buckets=4, salt_on="v", how="left")
    assert out.count() == skewed.count()
    assert out.where(F.col("label").isNull()).count() == 100


def test_salted_join_rejects_right(spark, skewed):
    dim = spark.createDataFrame([("hot", "x")], "k string, label string")
    with pytest.raises(AssertionError):
        salted_join(skewed, dim, ["k"], how="right")


def test_summarize_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 7.5)], "id int, s string, v double"
    )
    prof = {r["column"]: r for r in summarize(df).collect()}
    assert prof["id"]["count"] == 3 and prof["id"]["nulls"] == 0
    assert prof["s"]["nulls"] == 1
    assert prof["v"]["min"] == 5.0 and prof["v"]["max"] == 7.5
    assert prof["s"]["min"] is None  # non-numeric


def test_approx_quantiles(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "v double")
    q = approx_quantiles(df, "v", [0.5], rel_err=0.01)
    assert abs(q[0] - 50.0) <= 2


def test_freq_items_and_crosstab(spark):
    df = spark.createDataFrame(
        [("a", "x")] * 50 + [("b", "y")] * 5, "c1 string, c2 string"
    )
    fi = freq_items(df, ["c1"], 0.4).first()[0]
    assert "a" in fi
    ct = crosstab(df, "c1", "c2")
    assert ct.count() == 2


def test_null_ratio(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "a int, b string")
    r = null_ratio(df).first()
    assert r["a"] == 0.0 and abs(r["b"] - 2 / 3) < 1e-9


def test_key_skew_report_hand_computed(skewed):
    from thundercats_spark.operators.skew import key_skew_report

    # 1000 rows total; 'hot' = 900. At P=10 the ideal partition holds
    # 100 rows, so hot needs ceil(900*10/1000) = 9 shards; every k{i}
    # key holds 1 row -> salt 1.
    r = key_skew_report(skewed, ["k"], n_partitions=10, top=3).collect()
    assert [row["k"] for row in r] == ["hot", "k0", "k1"]  # tie-broken asc
    hot = r[0]
    assert hot["n"] == 900 and hot["share"] == 0.9
    assert hot["suggested_salt"] == 9
    assert r[1]["n"] == 1 and r[1]["suggested_salt"] == 1
    # exact ceil: a key at exactly one ideal partition suggests 1
    assert r[1]["share"] == 0.001


def test_key_skew_report_multi_key_and_defaults(spark):
    from thundercats_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1)], "k string, j int"
    )
    r = key_skew_report(df, ["k", "j"], n_partitions=4, top=10).collect()
    assert (r[0]["k"], r[0]["j"], r[0]["n"]) == ("a", 1, 2)
    assert r[0]["suggested_salt"] == 2  # ceil(2*4/4) = 2
    # defaults pull P from the session conf without erroring
    assert key_skew_report(df, ["k"]).count() == 2

    with pytest.raises(ValueError, match="non-empty"):
        key_skew_report(df, [])
    with pytest.raises(ValueError, match="top"):
        key_skew_report(df, ["k"], top=0)
    with pytest.raises(ValueError, match="positive"):
        key_skew_report(df, ["k"], n_partitions=0)


def test_key_skew_report_guards_reserved_names(spark):
    from thundercats_spark.operators.skew import key_skew_report

    df = spark.createDataFrame([(1, "x")], "n int, k string")
    with pytest.raises(ValueError, match="collide"):
        key_skew_report(df, ["n"])
    with pytest.raises(ValueError, match="collide"):
        key_skew_report(df, ["k", "n"])
