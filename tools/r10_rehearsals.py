"""Round-10 scale rehearsals for the wave-11 curation queries, merged
into tools/scale_stats.json like every prior round:

1. ``weighted_median_x10`` — replication INVARIANCE, the strongest
   correctness-at-scale pin available for a distribution statistic:
   replicating every document 10× (disjoint doc_ids, same source)
   multiplies each source's total token mass exactly 10× while
   leaving the per-source weighted median UNCHANGED (the half-mass
   crossing point is scale-free). Asserts both, plus wall time —
   the cumulative-weight window stays partitioned by source, so the
   plan has no single sort partition to collapse at 10×.

2. ``char_entropy_x10`` — per-document statistic: replicated docs
   must score IDENTICAL entropy to their originals (the operator is
   per-row; any cross-document state would break this), and wall
   time must grow far sublinearly in the 10× row count on local[32]
   (it is one explode + two map-side-combined aggs).

Usage: python tools/r10_rehearsals.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thundercats_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATS = os.path.join(REPO, "tools", "scale_stats.json")


def _replicate_docs(d, times: int):
    """x`times` corpus with disjoint doc_ids (same text/source)."""
    span = d.agg(F.max("doc_id")).first()[0] + 1
    reps = None
    for i in range(times):
        r = d.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
        reps = r if reps is None else reps.unionByName(r)
    return reps


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r10-rehearsals")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {}

    # ---- 1. weighted median: replication invariance
    from thundercats_spark.queries.analytics8 import (
        doc_char_entropy,
        doc_weighted_quality_median,
    )

    def run_wm(frame):
        from pyspark.sql import Window as W

        from thundercats_spark.functions import text_analysis as T

        w = frame.select(
            "source", "doc_id", "n_chars",
            T.token_count(F.col("text")).cast("long").alias("w"),
        )
        wc = W.partitionBy("source").orderBy("n_chars", "doc_id") \
            .rowsBetween(W.unboundedPreceding, 0)
        wt = W.partitionBy("source")
        c = w.select(
            "source", "n_chars",
            F.sum("w").over(wc).alias("cum"),
            F.sum("w").over(wt).alias("total"),
        )
        return {
            r["source"]: (r["total_tokens"], r["weighted_median_chars"])
            for r in c.where(2 * F.col("cum") >= F.col("total"))
            .groupBy("source")
            .agg(
                F.min("total").cast("long").alias("total_tokens"),
                F.min("n_chars").cast("long")
                .alias("weighted_median_chars"),
            )
            .collect()
        }

    base = run_wm(docs)
    x10 = _replicate_docs(docs, 10).localCheckpoint()
    t0 = time.time()
    big = run_wm(x10)
    wm_secs = round(time.time() - t0, 2)
    assert set(base) == set(big)
    for s in base:
        tot0, med0 = base[s]
        tot1, med1 = big[s]
        assert tot1 == 10 * tot0, (s, tot0, tot1)
        assert med1 == med0, (s, med0, med1)
    out["weighted_median_x10"] = {
        "sources": len(base),
        "x10_secs": wm_secs,
        "note": ("per-source weighted median INVARIANT under 10x "
                 "replication; token mass exactly 10x — the half-mass "
                 "crossing is scale-free and the window stays "
                 "source-partitioned"),
    }

    # ---- 2. char entropy: per-doc identity under replication
    t0 = time.time()
    ent_base = {
        r["doc_id"]: r["entropy"]
        for r in doc_char_entropy(spark, sf_dir).collect()
    }
    base_secs = round(time.time() - t0, 2)
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    x10.write.mode("overwrite").parquet("/tmp/r10_docs_x10/documents.parquet")
    t0 = time.time()
    ent_big = {
        r["doc_id"]: r["entropy"]
        for r in doc_char_entropy(spark, "/tmp/r10_docs_x10").collect()
    }
    big_secs = round(time.time() - t0, 2)
    assert len(ent_big) == 10 * len(ent_base)
    mismatch = sum(
        1
        for did, e in ent_big.items()
        if ent_base[did % span] != e
    )
    assert mismatch == 0, f"{mismatch} replicated docs scored differently"
    out["char_entropy_x10"] = {
        "docs": len(ent_base),
        "base_secs": base_secs,
        "x10_secs": big_secs,
        "wall_ratio": round(big_secs / base_secs, 2),
        "note": ("replicated docs score IDENTICAL entropy (operator is "
                 "per-row, no cross-document state); 10x rows at this "
                 "wall ratio on local[32]"),
    }

    data = {}
    if os.path.exists(STATS):
        with open(STATS) as f:
            data = json.load(f)
    data.update(out)
    with open(STATS, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
