"""Embedding quantization / norm ops (operators/embeddings.py)."""

import math

import pytest
from pyspark.sql import functions as F

from thundercats_spark.operators.embeddings import (
    dequantize_embeddings,
    embedding_norms,
    quantize_embeddings,
    quantized_dot,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_norms_match_python(emb):
    rows = embedding_norms(emb).orderBy("vec_id").limit(20).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.orderBy("vec_id").limit(20).collect()}
    for r in rows:
        v = raw[r["vec_id"]]
        assert r["dim"] == len(v)
        assert r["l2_norm"] == pytest.approx(math.sqrt(sum(float(x) ** 2 for x in v)), abs=1e-5)
        assert r["max_abs"] == pytest.approx(max(abs(float(x)) for x in v), abs=1e-5)


def test_quantize_roundtrip_error_bound(emb):
    q = quantize_embeddings(emb)
    back = dequantize_embeddings(q)
    joined = (
        back.withColumnRenamed("embedding", "approx")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            "q_scale",
            F.aggregate(
                F.zip_with(
                    "embedding", "approx", lambda a, b: F.abs(a.cast("double") - b.cast("double"))
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("max_err"),
        )
    )
    bad = joined.where(F.col("max_err") > F.col("q_scale") * 0.5 + 1e-9).count()
    assert bad == 0


def test_quantize_range_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["q_scale"] == 0.0 and rows[1]["q"] == [0, 0, 0]
    assert rows[2]["q"] == [64, -127, 32]  # scale = 2/127; 1.0/scale = 63.5 -> 64
    assert max(abs(x) for x in rows[2]["q"]) == 127


def test_quantized_dot_approximates_exact(emb):
    q = quantize_embeddings(emb.limit(50))
    a = q.select(
        F.col("vec_id").alias("id_a"), F.col("q").alias("qa"), F.col("q_scale").alias("sa")
    )
    b = q.select(
        F.col("vec_id").alias("id_b"), F.col("q").alias("qb"), F.col("q_scale").alias("sb")
    )
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b")).limit(200)
    approx = pairs.select(
        "id_a",
        "id_b",
        quantized_dot(F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")).alias("dot_q"),
    )
    raw = emb.limit(50).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in raw}
    norm = {k: math.sqrt(sum(x * x for x in v)) for k, v in vecs.items()}
    for r in approx.collect():
        va, vb = vecs[r["id_a"]], vecs[r["id_b"]]
        exact = sum(x * y for x, y in zip(va, vb))
        # int8 dot error bound: ||a-â||·||b|| + ||â||·||b-b̂|| ≈ (sa/2)√d·||b|| + ...
        d = len(va)
        tol = 0.5 * math.sqrt(d) * (
            (max(abs(x) for x in va) / 127.0) * norm[r["id_b"]]
            + (max(abs(x) for x in vb) / 127.0) * norm[r["id_a"]]
        ) + 1e-6
        assert abs(r["dot_q"] - exact) <= tol, (r["id_a"], r["id_b"], r["dot_q"], exact)


def test_quantize_plan_is_single_stage(emb):
    # pure projection: no Exchange, no Python, scan-stage only
    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
