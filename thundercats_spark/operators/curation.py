"""Corpus curation operators: source-mix measurement and rebalancing.

Training-data pipelines control the proportion each source (crawl,
books, code, ...) contributes to the final corpus. ``source_mix``
measures the current mix (one partial-agg pass); ``rebalance_to_mix``
computes per-source Bernoulli sampling fractions that hit a target mix
and applies them with ``DataFrame.sampleBy`` — deterministic under a
seed, no shuffle (sampling happens in the scan stage), any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_mix(df: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-source row count and fraction of corpus (exact int counts;
    fraction = count/total in double)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("total")).alias("fraction"),
        )
        .orderBy(source_col)
    )


def rebalance_fractions(
    counts: dict[str, int], target: dict[str, float]
) -> dict[str, float]:
    """Per-source keep-fractions achieving ``target`` proportions with
    the largest corpus no source can over-fill: N = min(c_s / t_s);
    keep_s = t_s * N / c_s. Pure driver math over the (tiny) per-source
    count map."""
    norm = sum(target.values())
    t = {s: v / norm for s, v in target.items()}
    n_max = min(counts[s] / t[s] for s in t if t[s] > 0 and s in counts)
    return {
        s: min(1.0, (t[s] * n_max) / counts[s]) for s in t if s in counts and counts[s]
    }


def rebalance_to_mix(
    df: DataFrame,
    target: dict[str, float],
    source_col: str = "source",
    seed: int = 7,
) -> DataFrame:
    """Downsample each source so the corpus approaches the ``target``
    mix. Sources absent from ``target`` are dropped. ``sampleBy`` is a
    per-row Bernoulli filter evaluated in the scan stage — one count
    job + one sampled pass, no shuffle, reproducible under ``seed``."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fractions = rebalance_fractions(counts, target)
    return df.sampleBy(source_col, fractions, seed=seed)
