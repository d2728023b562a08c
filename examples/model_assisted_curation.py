"""Example app — the round-4 curation surface end-to-end: model-based
quality filtering, deterministic temperature rebalancing, real BPE
tokenization, incremental corpus accounting, and int8 embedding
serving.

  1. quality model   — train HashingTF+logistic-regression on weak
                       labels (a trusted slice vs the rest), score the
                       whole corpus, keep the confident tail
  2. temperature mix — alpha-sample the kept corpus toward a smoothed
                       language mix (deterministic md5 filter — the
                       same rows survive on any rerun/engine)
  3. BPE tokenizer   — learn merges from the distributed word-count
                       table, encode every doc (Arrow merge-by-rank)
  4. rollup          — fold per-day ingestion batches into a persisted
                       (source) rollup: doc counts, token sums, and a
                       mergeable HLL distinct-word sketch
  5. int8 serving    — quantize the embedding table (4x smaller),
                       run the quantized-domain top-k scan

Run: python examples/model_assisted_curation.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from thundercats_spark.functions.bpe import bpe_encode, bpe_train
from thundercats_spark.operators.curation import temperature_sample
from thundercats_spark.operators.embeddings import quantize_embeddings, quantized_dot
from thundercats_spark.operators.incremental import hll_estimate, rollup_update
from thundercats_spark.quality.classifier import score_quality, train_quality_classifier
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("model-assisted-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1) weak supervision: treat the 'en' slice as the trusted corpus
    # (stand-in for e.g. curated reference text vs raw crawl).
    labeled = docs.withColumn("label", (F.col("lang") == "en").cast("int"))
    model = train_quality_classifier(labeled, max_iter=20)
    scored = score_quality(model, docs)
    # winsorize the model scores per source before thresholding: a
    # source whose classifier scores have a long rogue tail (domain
    # mismatch, adversarial SEO text) can't monopolize either end of
    # the gate — tails are clipped to that source's own [p05, p95]
    # (actual score values, disc bounds), rows are never dropped here
    from thundercats_spark.operators.robust import winsorize_grouped

    scored = winsorize_grouped(
        scored.withColumn("quality_prob", F.round("quality_prob", 6)),
        ["source"], "quality_prob", 0.05, 0.95,
        quantized=True, out_col="q_w",
    )
    kept = scored.where(F.col("q_w") >= 0.3)
    n1 = kept.count()

    # 2) deterministic temperature rebalancing on the skewed lang axis.
    mixed = temperature_sample(kept, temperature=2.0, source_col="lang")
    n2 = mixed.count()

    # 3) learn a tokenizer from what survived; encode it.
    merges = bpe_train(mixed, n_merges=300, top_n=50_000)
    tokenized = bpe_encode(mixed, merges).withColumn(
        "n_bpe", F.size("bpe_tokens")
    )
    tok_stats = tokenized.agg(
        F.sum("n_bpe").alias("tokens"), F.avg("n_bpe").alias("avg")
    ).first()

    # 4) incremental accounting: fold two simulated ingestion batches
    # into a persisted per-source rollup (HLL state merges exactly).
    rollup_dir = tempfile.mkdtemp(prefix="curation_rollup_") + "/rollup"
    metrics = {
        "n_docs": ("count", "*"),
        "tokens": ("sum", "n_bpe"),
        "uniq_langs": ("approx_distinct", "lang"),
    }
    half_a = tokenized.where(F.col("doc_id") % 2 == 0)
    half_b = tokenized.where(F.col("doc_id") % 2 == 1)
    rollup_update(spark, half_a, rollup_dir, ["source"], metrics)
    rollup_update(spark, half_b, rollup_dir, ["source"], metrics)
    rollup = hll_estimate(spark.read.parquet(rollup_dir), "uniq_langs")

    # 5) int8 embedding serving: quantize, then the quantized-domain
    # top-k scan against vector 0.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qz = quantize_embeddings(emb)
    tgt = qz.where(F.col("vec_id") == 0).select(
        F.col("q_scale").alias("sq"), F.col("q").alias("qq")
    )
    topk = (
        qz.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(tgt))
        .select(
            "vec_id",
            quantized_dot(F.col("q"), F.col("q_scale"), F.col("qq"), F.col("sq")).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(5)
    )

    print(f"corpus:      {n0} docs")
    print(f"model gate:  {n1} kept (classifier P(quality) >= 0.3)")
    print(f"temperature: {n2} kept (T=2 lang rebalance)")
    print(f"bpe:         {len(merges)} merges; {tok_stats['tokens']} tokens "
          f"({tok_stats['avg']:.1f}/doc)")
    print("rollup (2 batches folded):")
    for r in rollup.orderBy("source").collect()[:6]:
        print(f"  {r['source']}: {r['n_docs']} docs, {r['tokens']} tokens, "
              f"{r['uniq_langs']} langs")
    print("int8 top-5 neighbours of vec 0:")
    for r in topk.collect():
        print(f"  vec {r['vec_id']}: {r['score']:.4f}")


if __name__ == "__main__":
    main()
