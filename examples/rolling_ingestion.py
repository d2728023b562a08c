"""Example app — rolling corpus ingestion with full-history dedup, the
production shape for a crawl pipeline that lands new document batches
daily: each increment dedupes against EVERYTHING ever ingested (exact
first, then near-dup) without rescanning history — both indexes hold
hashes/sketches, never text — then appends survivors to the corpus.

Batch flow per increment (CRASH-SAFE ORDERING — corpus before index):
  1. ``dedup_incremental_prepare``          — exact: 8-byte fingerprint
                                              index, probe only
  2. ``dedup_minhash_incremental_prepare``  — near-dup: persisted LSH
                                              bucket + shingle-set
                                              index, candidate-only
                                              exact-Jaccard verify
  3. append survivors to the corpus (id-upsert, replay-idempotent)
  4. ``commit()`` both indexes (key-idempotent upserts)

Committing an index BEFORE the corpus write would open a crash window
where a replayed batch matches itself in the index and is silently
dropped from the corpus forever; with this ordering a crash at any
step replays cleanly (see ``IncrementalBatch``).

Run: python examples/rolling_ingestion.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from thundercats_spark.operators.dedup import (
    dedup_incremental_prepare,
    dedup_minhash_incremental_prepare,
)
from thundercats_spark.physical.io import Write
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("rolling-ingestion", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tc_ingest_")
    fp_index = f"{work}/fp_index"
    lsh_index = f"{work}/lsh_index"
    corpus = f"{work}/corpus"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # simulate three daily batches: day 2 re-delivers some of day 1
    # verbatim (exact dups) and day 3 ships lightly-edited copies
    # (near-dups) plus genuinely new rows
    day1 = docs.where(F.col("doc_id") % 3 == 0)
    day2 = docs.where(F.col("doc_id") % 3 <= 1)  # half is day-1 again
    day3 = docs.where(F.col("doc_id") % 3 == 2).unionByName(
        day1.limit(50).select(
            (F.col("doc_id") + 10 * n).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit("mirror")).alias("text"),
            "lang", "source", "n_chars",
        )
    )

    # per-batch quality QA: day 1 sets the robust baseline (discrete
    # median/MAD per source — 50% breakdown point, so a polluted batch
    # can't drag its own yardstick); later days are checked against it
    # BEFORE ingestion so a drifted source is visible while the batch
    # is still quarantinable
    from thundercats_spark.functions.text_analysis import quality_score
    from thundercats_spark.operators.robust import mad_outlier_stats_quantized

    def batch_quality(batch):
        return mad_outlier_stats_quantized(
            batch.select(
                "source", F.round(quality_score(F.col("text")), 6).alias("q")
            ),
            ["source"], "q", k=3.0,
        )

    baseline = {
        r["source"]: (r["med"], r["mad"])
        for r in batch_quality(day1).collect()
    }

    for day, batch in (("day1", day1), ("day2", day2), ("day3", day3)):
        if day != "day1":
            qstats = batch_quality(batch).collect()
            drifted = [
                f"{r['source']}({r['med'] - baseline[r['source']][0]:+.3f})"
                for r in qstats
                if r["source"] in baseline
                and abs(r["med"] - baseline[r["source"]][0])
                > 2.0 * baseline[r["source"]][1]
            ]
            # a source with NO baseline is the most suspicious case
            # for a pre-ingestion gate — surface it, never drop it
            unbaselined = sorted(
                r["source"] for r in qstats if r["source"] not in baseline
            )
            print(f"{day}: quality drift vs day1 baseline: "
                  f"{', '.join(drifted) if drifted else 'none'}"
                  + (f"; unbaselined sources: {', '.join(unbaselined)}"
                     if unbaselined else ""))
        exact = dedup_incremental_prepare(batch, fp_index)
        near = dedup_minhash_incremental_prepare(
            exact.survivors, lsh_index, threshold=0.5
        )
        # corpus FIRST (replay-idempotent), indexes after — a crash
        # anywhere in between replays cleanly
        Write.upsert_parquet(near.survivors, corpus, ["doc_id"]).get
        counts = (batch.count(), exact.survivors.count(), near.survivors.count())
        exact.commit()
        near.commit()
        print(
            f"{day}: arrived={counts[0]} after_exact={counts[1]} "
            f"ingested={counts[2]}"
        )

    final = spark.read.parquet(corpus)
    print(f"corpus total: {final.count()} (unique source docs: {n})")

    # nightly layout maintenance: the per-day appends left the corpus
    # unclustered (every file a full-width box for selective scans);
    # re-cluster on the queryable numeric dimensions when health has
    # degraded, then show what a box predicate can now skip from the
    # parquet footers alone
    from thundercats_spark.physical.layout import (
        maintain_zorder,
        pruning_summary,
        scan_pruning_report,
    )

    cols = ["n_chars", "doc_id"]
    res = maintain_zorder(
        spark, corpus, cols, rebuild_above=0.10, n_buckets=32, n_files=8
    )
    print(
        f"layout: rebuilt={res['rebuilt']} "
        f"mean_box_volume {res['health_before']['mean_box_volume']:.2f}"
        + (
            f" -> {res['health_after']['mean_box_volume']:.2f}"
            if res["rebuilt"]
            else ""
        )
    )
    skip = pruning_summary(
        scan_pruning_report(spark, corpus, {"n_chars": (0, 400)})
    )["row_group_skip_fraction"]
    print(f"short-doc box predicate skips {skip:.0%} of row groups via footers")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
