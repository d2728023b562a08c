"""Example app — the MEASUREMENT phase a 100 TB pipeline runs before
committing to a configuration. Every knob the curation pipeline
(`llm_corpus_curation.py`) takes — salt factors, training seq_len,
mixture weights, dedup expectations — is an answer these reports give
cheaply up front, instead of a guess discovered expensively mid-run:

  1. key skew        — which keys are hot, and the salt factor each
                       needs (decides salted_agg/salted_join buckets)
  2. dedup forecast  — per-source duplication rates plus the full
                       dropped-id -> kept-id lineage manifest
  3. packing plan    — padding-waste bounds for each candidate
                       training sequence length (bounds EVERY packer)
  4. corpus map      — embedding-space domains with cohesion + label
                       purity (the input to mixture weighting)
  5. snapshot drift  — cluster-share deltas of a new crawl vs the
                       reference snapshot, against FROZEN centroids
  6. shard plan      — cut the corpus into shards of near-equal TOKEN
                       mass (not row count) so equal-sized training
                       readers finish together

Each report is one map-side-combined aggregation or one zero-shuffle
Arrow kernel over the scan — the whole planning phase costs about one
pass over the corpus, which is why it runs BEFORE the pipeline, every
time, rather than once a quarter.

Run: python examples/pipeline_planning.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from thundercats_spark.operators.curation import packing_efficiency_report
from thundercats_spark.operators.dedup import dedup_lineage, dedup_rate_by_source
from thundercats_spark.operators.similarity import (
    cluster_corpus_map,
    cluster_share_drift,
    ivf_train,
)
from thundercats_spark.operators.skew import key_skew_report
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline-planning")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. skew: is any key hot enough that the downstream joins/aggs
    # need salting? suggested_salt == 1 everywhere -> skip the salted
    # operators entirely (they add a merge stage for nothing).
    print("== key skew (orders.o_custkey) ==")
    # collect ONCE and derive everything from the rows — .show() then
    # .collect() on the same frame would run the report job twice
    skew = key_skew_report(orders, ["o_custkey"], top=5).toPandas()
    print(skew.to_string(index=False))
    max_salt = int(skew["suggested_salt"].max())
    print(f"max suggested_salt={max_salt} -> "
          f"{'salting needed' if max_salt > 1 else 'plain groupBy is fine'}")

    # 2. dedup forecast: how much of each source will collapse, and
    # the audit manifest of where every collapsed row will go. The
    # lineage join key here is a 40-char normalized prefix (the
    # synthetic corpus has no full-text dups); production runs use the
    # default full-text identity or a canonicalized URL.
    print("== dedup rate by source ==")
    dedup_rate_by_source(docs, source_col="lang").show(5)
    prefix_key = F.substring(F.lower(F.trim(F.col("text"))), 1, 40)
    lineage = dedup_lineage(docs, dups_only=True, key=prefix_key)
    print(f"lineage manifest rows (docs in collapsing groups): "
          f"{lineage.count()}")

    # 3. packing: padding-waste bounds per candidate seq_len. Pick the
    # largest L whose min_padding_frac stays under the budget.
    print("== packing efficiency ==")
    packing_efficiency_report(docs, seq_lens=[256, 512, 1024, 2048]).show()

    # 4. corpus map: embedding-space domains. Low-cohesion clusters are
    # grab-bags worth re-splitting; label purity shows how well tags
    # track the actual content.
    print("== corpus map (8 domains) ==")
    cents = ivf_train(emb, n_clusters=8)
    cluster_corpus_map(emb, label_col="label", centroids=cents).show(8)

    # 5. drift: before appending a new crawl, compare its cluster
    # shares against the reference snapshot under the SAME centroids.
    # (Here: odd vec_ids stand in for the new crawl.)
    print("== snapshot drift (frozen centroids) ==")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    drift = cluster_share_drift(old, new, cents).toPandas()
    print(drift.to_string(index=False))
    tvd = 0.5 * float(drift["delta"].abs().sum())
    print(f"total variation distance: {tvd:.4f} -> "
          f"{'investigate before appending' if tvd > 0.1 else 'shapes match'}")

    # 6. balanced shards: equal token MASS per shard, deterministic.
    # The per-shard masses differ by less than one max-doc weight.
    print("== balanced shards (8, by token mass) ==")
    from thundercats_spark.functions.text_analysis import token_count
    from thundercats_spark.operators.curation import assign_balanced_shards

    shards = (
        assign_balanced_shards(
            docs.select("doc_id", token_count(F.col("text")).alias("w")),
            8, "w",
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("w").alias("tokens"))
        .orderBy("shard")
        .toPandas()
    )
    print(shards.to_string(index=False))
    spread = int(shards["tokens"].max() - shards["tokens"].min())
    print(f"token-mass spread across shards: {spread} "
          f"(each shard within one max-document weight of ideal, so the "
          f"max-min spread is bounded by twice that)")


if __name__ == "__main__":
    main()
