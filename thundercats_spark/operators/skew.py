"""Skew mitigation — salting for hot keys.

AQE's skew-join handling (on in session.py) fixes most cases at
runtime by splitting oversized partitions; these operators are the
explicit, deterministic fallback for the pathological ones: a power-law
key (one user = 10% of events) where even a split partition's single
key stays hot, or an aggregation whose single group overwhelms one
task. No randomness — salt is derived by hashing a discriminator
column, so results are reproducible and re-runs hit identical plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(df: DataFrame, salt_on: str | Column | None, buckets: int) -> Column:
    """Deterministic salt in [0, buckets). Defaults to a hash of the full
    row content, which is stable across runs, partition layouts, and
    cluster sizes (unlike monotonically_increasing_id). Full duplicates
    land in the same bucket — acceptable: identical rows carry no
    discriminating signal to spread on."""
    if isinstance(salt_on, str):
        src = [F.col(salt_on)]
    elif salt_on is not None:
        src = [salt_on]
    else:
        src = [F.col(c) for c in df.columns]
    return F.pmod(F.xxhash64(*src), F.lit(buckets))


def key_skew_report(
    df: DataFrame,
    keys: Sequence[str],
    n_partitions: int | None = None,
    top: int = 20,
) -> DataFrame:
    """Measure key skew BEFORE reaching for ``salted_agg`` /
    ``salted_join`` — at scale you can't eyeball which keys are hot,
    and salting a uniform key only adds a shuffle stage. Reports the
    ``top`` heaviest key values with:

    - ``n`` — exact row count for the key,
    - ``share`` — ``n / total`` (rounded 6),
    - ``suggested_salt`` — ``ceil(n * P / total)`` in exact integer
      arithmetic: how many ideal-partition-sized shards this key needs,
      where ``P`` is ``n_partitions`` (defaults to the session's
      ``spark.sql.shuffle.partitions``). 1 = the key fits one ideal
      partition (no salting needed); k>1 = pass ``buckets>=k`` to the
      salted operators, or rely on AQE's skew split if it's a join.

    Scale shape: ONE groupBy on the keys — identical to the shuffle the
    skewed aggregation itself would run, but map-side partial combine
    means the wire carries ~|distinct keys| (key, long) pairs, not
    rows. The grand total comes from a broadcast cross-join of the
    1-row re-aggregate (never a no-partition window over the counts
    frame, which can be wide for high-cardinality keys); the top-N is
    a TakeOrdered, not a global sort. Ties are broken by the key
    columns ascending so the cut is deterministic."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if top <= 0:
        raise ValueError(f"top must be positive, got {top}")
    reserved = {"n", "share", "suggested_salt"} & set(keys)
    if reserved:
        raise ValueError(
            f"key column(s) {sorted(reserved)} collide with the report's "
            "output columns (n/share/suggested_salt) — rename them first"
        )
    p = int(
        n_partitions
        if n_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if p <= 0:
        raise ValueError(f"n_partitions must be positive, got {p}")
    from thundercats_spark.physical.util import with_grand_total

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return (
        with_grand_total(counts, "__n", "__total")
        .select(
            *keys,
            F.col("__n").alias("n"),
            F.round(F.col("__n") / F.col("__total"), 6).alias("share"),
            # ceil(n*P/total) = (n*P + total - 1) DIV total, exactly in longs
            F.expr(f"(__n * {p} + __total - 1) DIV __total").alias(
                "suggested_salt"
            ),
        )
        .orderBy(F.desc("n"), *[F.asc(k) for k in keys])
        .limit(top)
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    salt_on: str | Column | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial-aggregate on
    (keys, salt) — spreading each hot key over ``buckets`` tasks — then
    merge on keys. Only algebraic aggregates (sum/count here) compose
    across the two stages; that's exactly why the helper restricts
    itself to them."""
    salted = df.withColumn(_SALT, _salt_col(df, salt_on, buckets))
    partial = salted.groupBy(*keys, _SALT).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
    )
    final_aggs = []
    if count:
        final_aggs.append(F.sum("__n").alias("n"))
    final_aggs.extend(F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    salt_on: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a deterministic salt in
    [0, buckets); the small side is replicated ``buckets`` times (one
    copy per salt value) so each (key, salt) shard joins locally. Use
    when one join key dominates and the small side is too large to
    broadcast outright but fine to replicate ``buckets`` ways."""
    assert how in {"inner", "left", "left_semi", "left_anti"}, (
        "salted_join replicates the right side; right/full joins would duplicate it"
    )
    big_s = big.withColumn(_SALT, _salt_col(big, salt_on, buckets))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    out = big_s.join(small_s, [*on, _SALT], how)
    return out.drop(_SALT)
