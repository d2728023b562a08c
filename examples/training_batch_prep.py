"""Example app — from curated corpus to training batches, composing
the round-2 curation family end-to-end over ``documents``:

  1. PII scrub          — chained JVM regexp_replace (scan-stage)
  2. decontaminate      — drop docs sharing word 8-grams with the
                          held-out benchmark slice (source 'src0')
  3. keep-best dedup    — one copy per duplicate cluster, retaining
                          the most word-diverse copy (not min-id)
  4. train/val/test     — deterministic md5-bucket split; no example
                          ever migrates between splits across re-runs
  5. sequence packing   — concat-and-chunk docs into 2048-token packs
                          over hash-bucketed parallel streams
  6. funnel accounting  — survival counts through the quality gates

Everything stays declarative: scrubbing and splitting are scan-stage
expressions, decontamination joins 8-byte n-gram hashes (text never
shuffles), dedup shuffles 16-byte pairs, and packing windows within
hash groups (no global sort) — the same code shape at 100 TB.

Run: python examples/training_batch_prep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from thundercats_spark.functions import text_analysis as T
from thundercats_spark.operators import (
    corpus_split,
    decontaminate,
    dedup_keep_best,
    pack_sequences,
    quality_funnel,
)
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-batch-prep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. scrub PII in place (pure projection)
    docs = docs.withColumn("text", T.pii_scrub(F.col("text")))

    # 2. the 'src0' slice stands in for an eval benchmark
    bench = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")
    clean = decontaminate(corpus, bench, n=8, mode="filter")

    # 3. per duplicate cluster keep the most word-diverse copy
    unique = dedup_keep_best(clean, T.distinct_word_ratio(F.col("text")))

    # 4. deterministic split
    split = corpus_split(unique, {"train": 0.9, "val": 0.05, "test": 0.05})

    # 5. pack the train split into 2048-token sequences
    train = split.where(F.col("split") == "train")
    packed = pack_sequences(train, budget=2048, n_groups=16)

    # 6. report
    print("== funnel (gates applied cumulatively) ==")
    quality_funnel(
        docs,
        [
            ("min_chars", F.length("text") >= 100),
            ("min_tokens", T.token_count(F.col("text")) >= 20),
            ("diverse", T.distinct_word_ratio(F.col("text")) >= 0.5),
        ],
    ).show(truncate=False)

    print("== split sizes ==")
    split.groupBy("split").count().orderBy("split").show()

    print("== packing: sequences produced, mean fill (tokens) ==")
    packed.groupBy("pack_group", "pack_seq").agg(
        F.sum("n_tokens").alias("fill")
    ).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg("fill"), 1).alias("mean_fill"),
    ).show()

    n0, n1, n2 = docs.count(), clean.count(), unique.count()
    print(f"docs {n0} -> decontaminated {n1} -> deduped {n2}")


if __name__ == "__main__":
    main()
