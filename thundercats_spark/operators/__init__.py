from thundercats_spark.operators.asof import asof_join
from thundercats_spark.operators.components import connected_components, dedup_groups
from thundercats_spark.operators.curation import (
    boilerplate_lines,
    corpus_split,
    decontaminate,
    pack_sequences,
    quality_funnel,
    rebalance_fractions,
    rebalance_to_mix,
    remove_boilerplate_lines,
    source_mix,
    split_bucket,
)
from thundercats_spark.operators.dedup import (
    corpus_bigram_logprob,
    dedup_exact,
    dedup_incremental,
    dedup_keep_best,
    dedup_minhash,
    ensure_parallelism,
    latest_by_key,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from thundercats_spark.operators.incremental import Incremental, read_incremental
from thundercats_spark.operators.resample import resample_ffill
from thundercats_spark.operators.sessionize import sessionize
from thundercats_spark.operators.similarity import (
    ann_batch_topk,
    ann_topk_bruteforce,
    ann_topk_lsh,
    cosine_pairs_bruteforce,
    cosine_pairs_lsh,
)
from thundercats_spark.operators.skew import salted_agg, salted_join

__all__ = [
    "asof_join",
    "sessionize",
    "resample_ffill",
    "connected_components",
    "dedup_groups",
    "dedup_exact",
    "dedup_incremental",
    "dedup_keep_best",
    "dedup_minhash",
    "latest_by_key",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "corpus_bigram_logprob",
    "ensure_parallelism",
    "ann_batch_topk",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "cosine_pairs_bruteforce",
    "cosine_pairs_lsh",
    "salted_agg",
    "salted_join",
    "source_mix",
    "Incremental",
    "read_incremental",
    "rebalance_fractions",
    "rebalance_to_mix",
    "boilerplate_lines",
    "corpus_split",
    "decontaminate",
    "pack_sequences",
    "quality_funnel",
    "remove_boilerplate_lines",
    "split_bucket",
]
