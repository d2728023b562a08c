"""Physical-plan regression gates: the scale posture (broadcasts land,
filters push down, nothing goes cartesian, Python stays out of the hot
path) must survive refactors. Plans are built, never executed."""

import re

import pytest

from thundercats_spark.queries import all_queries

# queries whose plan BUILD executes jobs (ivf trains centroids, token
# budget fetches quantiles/bucket sums) or that are intentionally
# quadratic brute-force oracles
SKIP = {"ann_ivf_topk", "ann_indexed_topk", "ann_lsh_indexed",
        "dedup_embedding_cosine", "dedup_semantic", "corpus_token_budget"}
# tiny-broadcast cross joins legitimately plan as BNLJ
SCALAR_BNLJ_OK = {
    "q11_important_parts",
    "q22_idle_customers",
    "doc_bigram_logprob",
    "events_funnel_conversion",  # three 1-row stage counts
    "doc_source_mix",  # 1-row corpus total
    "ann_batch_topk",  # broadcast query-vector table (a handful of rows)
    "dedup_simhash",  # 1-row mean-bucket-size stats for the auto hot-band cap
}
# Arrow-kernel operators are allowed (designed) Python-boundary nodes
PY_EVAL_OK = {"dedup_minhash_lsh", "dedup_minhash_oph", "dedup_simhash"}


def _plan(spark, name, sf_dir):
    q = all_queries()[name]
    df = q.spark_fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {
        name: _plan(spark, name, sf_dir)
        for name in all_queries()
        if name not in SKIP
    }


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, bad


def test_nested_loop_only_for_scalar_broadcasts(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in SCALAR_BNLJ_OK
    ]
    assert not bad, bad


def test_python_stays_out_of_hot_path(plans):
    markers = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    bad = [
        n
        for n, p in plans.items()
        if any(m in p for m in markers) and n not in PY_EVAL_OK
    ]
    assert not bad, bad


def test_dimension_joins_broadcast(plans):
    # the multi-dim TPC-H shapes must plan broadcast joins for dims
    for name in ("q5_local_supplier", "q7_nation_volume", "q8_market_share",
                 "q9_product_profit", "q3_shipping_priority"):
        assert "BroadcastHashJoin" in plans[name], name


def test_bigram_counts_join_not_hinted_broadcast(spark, sf_dir):
    """The bigram-counts side grows with the corpus — it must never carry
    a broadcast hint (AQE may still broadcast at runtime when it actually
    fits). Only the 1-row corpus total is allowed the hint."""
    q = all_queries()["doc_bigram_logprob"]
    df = q.spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    inner_joins = [ln for ln in plan.splitlines() if "Join Inner" in ln]
    assert inner_joins and all("broadcast" not in ln for ln in inner_joins), inner_joins
    assert plan.count("strategy=broadcast") == 1  # the scalar total only


def test_filters_reach_parquet_scans(plans):
    # selective scans must show pushed filters
    for name in ("q1_pricing_summary", "q6_forecast_revenue",
                 "q19_disjunctive_revenue", "q14_promo_share"):
        assert re.search(r"PushedFilters: \[[^\]]", plans[name]), name
