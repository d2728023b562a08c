"""Source-mix measurement and rebalancing."""

import pytest

from thundercats_spark.operators.curation import (
    rebalance_fractions,
    rebalance_to_mix,
    source_mix,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_source_mix_fractions_sum_to_one(docs):
    rows = source_mix(docs, "source").collect()
    assert abs(sum(r["fraction"] for r in rows) - 1.0) < 1e-12
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_rebalance_fractions_math():
    fr = rebalance_fractions({"a": 100, "b": 50}, {"a": 0.5, "b": 0.5})
    assert fr == {"a": 0.5, "b": 1.0}  # b is the binding source
    # unnormalized targets are normalized
    fr2 = rebalance_fractions({"a": 100, "b": 50}, {"a": 1, "b": 1})
    assert fr2 == fr
    # dropping a source entirely
    fr3 = rebalance_fractions({"a": 10, "b": 10}, {"a": 1.0})
    assert fr3 == {"a": 1.0} and "b" not in fr3


def test_rebalance_to_mix_deterministic_and_directional(docs):
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    target = {s: 1.0 / len(sources) for s in sources}
    out1 = rebalance_to_mix(docs, target, seed=11)
    out2 = rebalance_to_mix(docs, target, seed=11)
    ids1 = sorted(r["doc_id"] for r in out1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in out2.select("doc_id").collect())
    assert ids1 == ids2  # seeded Bernoulli reproduces
    # mix moved toward uniform: max-min spread shrinks or stays
    before = {r["source"]: r["n_docs"] for r in source_mix(docs).collect()}
    after = {r["source"]: r["n_docs"] for r in source_mix(out1).collect()}
    spread_before = max(before.values()) - min(before.values())
    spread_after = max(after.values()) - min(after.values())
    assert spread_after <= max(spread_before, 1)
