"""Source-mix measurement, rebalancing, decontamination, splits."""

import pyspark.sql.functions as F
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


def test_decontaminate_flag_and_filter(spark):
    from thundercats_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),  # contains the 8-gram
            (2, "totally different words with no overlap at all here"),
            (3, "short doc"),  # < 8 tokens -> no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_contaminated"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_contaminated"] == 0
    assert not out[3]["contaminated"]
    kept = decontaminate(corpus, bench, n=8, mode="filter")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert "n_contaminated" not in kept.columns


def test_corpus_split_deterministic_stratified(docs):
    from thundercats_spark.operators.curation import corpus_split

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = corpus_split(docs, w)
    b = corpus_split(docs, w)
    rows_a = {r["doc_id"]: r["split"] for r in a.select("doc_id", "split").collect()}
    rows_b = {r["doc_id"]: r["split"] for r in b.select("doc_id", "split").collect()}
    assert rows_a == rows_b  # hash split: no randomness at all
    # every row assigned, proportions roughly honored
    n = docs.count()
    counts = {r["split"]: r["c"] for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == n
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    # repartitioning must not move rows between splits
    c = corpus_split(docs.repartition(7), w)
    rows_c = {r["doc_id"]: r["split"] for r in c.select("doc_id", "split").collect()}
    assert rows_c == rows_a


def test_quality_funnel_monotone(docs):
    from thundercats_spark.operators.curation import quality_funnel

    gates = [
        ("nonempty", F.length("text") > 0),
        ("min_chars", F.length("text") >= 100),
        ("impossible", F.length("text") < 0),
    ]
    rows = quality_funnel(docs, gates).orderBy("stage_idx").collect()
    ns = [r["n_pass"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2]  # cumulative gates can only shrink
    assert ns[0] == docs.where(F.length("text") > 0).count()
    assert ns[2] == 0
    assert [r["stage"] for r in rows] == ["nonempty", "min_chars", "impossible"]
