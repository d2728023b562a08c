"""Distributed global ranking — exact row numbers / rank-derived
statistics by a TOTAL order without the classic Spark scale trap: a
``Window.orderBy(...)`` with no partition key moves the ENTIRE table
onto one sort partition. At 100 TB that single partition is the job.

The scalable formulation is the textbook two-phase rank, made
layout-independent: a seeded driver-side sample of the order keys
picks ~``n_partitions`` range-boundary tuples which become LITERALS in
the plan, every row gets a bucket id as a pure function of its own key
(count of boundaries ≤ key, via ordered struct comparisons), buckets
sort independently under a PARTITIONED window, and tiny per-bucket
counts turn into driver-computed offsets. Because the bucket id is a
function of the row — not of the physical partition layout — every
pass and every recompute agrees by construction. (The tempting
alternative, ``repartitionByRange`` + ``spark_partition_id()``, is NOT
stable across jobs: RangePartitioner re-samples per action, so the
counts pass and the numbering pass can disagree — caught by test.)

``order_cols`` must be a total order over non-null keys (include a
unique tie-break key, e.g. the primary key). With a unique order,
``row_number == rank == dense_rank``, ``percent_rank = (rn-1)/(n-1)``
and ``cume_dist = rn/n`` — every rank-family statistic derives from
this one operator (see ``queries/analytics2.py`` for oracle-pinned
consumers). Bucket balance follows the sample: heavy skew concentrates
in a bucket only when the key itself has few distinct values, which a
unique tie-break column prevents.

Reference parity: no counterpart (the reference has no window layer);
this is Spark-scale infrastructure for the analytics the brief adds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(
    df: DataFrame, order_cols: Sequence[str], boundaries: list[tuple]
) -> F.Column:
    """Bucket id = number of boundary tuples <= the row's key tuple —
    a pure row-local expression (ordered struct comparison per
    boundary; boundary count ~ partition count, so the expression stays
    small). Boundary literals are cast to the key columns' exact types
    (struct comparison rejects mismatched field types)."""
    types = [df.schema[c].dataType for c in order_cols]
    key = F.struct(*[F.col(c) for c in order_cols])
    b = F.lit(0)
    for tup in boundaries:
        lit_tup = F.struct(
            *[F.lit(v).cast(t) for v, t in zip(tup, types)]
        )
        b = b + F.when(key >= lit_tup, 1).otherwise(0)
    return b


def _sample_boundaries(
    df: DataFrame, order_cols: Sequence[str], total: int, n_parts: int
) -> list[tuple]:
    """Seeded sample of order-key tuples -> up to n_parts-1 evenly
    spaced, deduplicated boundary tuples (collected once; they enter
    the plan as literals, so no cross-job consistency is needed)."""
    if n_parts <= 1:
        return []  # one bucket: no boundaries (never over-split)
    target = n_parts * 100
    frac = min(1.0, target / max(total, 1))
    samp = sorted(
        tuple(r) for r in df.select(*order_cols).sample(frac, seed=42).collect()
    )
    if not samp:
        return []
    step = max(1, len(samp) // n_parts)
    bounds: list[tuple] = []
    for i in range(step, len(samp), step):
        if len(bounds) >= n_parts - 1:
            break  # checked BEFORE appending: exactly n_parts buckets max
        if not bounds or samp[i] != bounds[-1]:
            bounds.append(samp[i])
    return bounds


def _count_and_check_nulls(
    df: DataFrame,
    key_cols: Sequence[str],
    group_cols: Sequence[str] | None = None,
    non_negative_col: str | None = None,
) -> int | tuple[int, int]:
    """One agg: total row count + loud rejection of NULL ranking keys
    (+ the distinct-group count when ``group_cols`` is given, + a
    negative-value rejection for ``non_negative_col`` — all folded into
    the same pass so the guards cost no extra job). A NULL key would
    silently vanish through the offset equi-joins (and break the
    driver-side boundary sort), so it is an error here — the window
    formulations treat NULL as an ordinary value, this operator does
    not. Filter or impute upstream."""
    anynull = F.col(key_cols[0]).isNull()
    for c in key_cols[1:]:
        anynull = anynull | F.col(c).isNull()
    nulls = F.sum(F.when(anynull, 1).otherwise(0))
    aggs = [F.count(F.lit(1)).alias("n"), nulls.alias("k")]
    if group_cols is not None:
        aggs.append(
            F.count_distinct(*[F.col(c) for c in group_cols]).alias("g")
        )
    if non_negative_col is not None:
        aggs.append(F.min(non_negative_col).alias("mn"))
    row = df.agg(*aggs).first()
    if row["k"]:
        raise ValueError(
            f"{row['k']} rows have NULL in ranking key columns "
            f"{list(key_cols)}; distributed ranking requires non-null "
            "keys (filter or impute upstream)"
        )
    if non_negative_col is not None and row["n"] and row["mn"] < 0:
        raise ValueError(
            f"column {non_negative_col!r} has negative values "
            f"(min={row['mn']}); this operator requires non-negative "
            "weights (filter or clamp upstream)"
        )
    return row["n"] if group_cols is None else (row["n"], row["g"])


def _require_free_columns(df: DataFrame, names, op: str) -> None:
    """Raise if a helper/output column name already exists on the
    input frame. ``withColumn`` silently REPLACES an existing column
    and the internal ``drop`` then deletes the caller's data — the
    same loud-collision contract ``write_parquet_zorder`` and
    ``key_skew_report`` already enforce (ADVICE r06)."""
    clash = [n for n in names if n is not None and n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: column(s) {clash} already exist on the input frame "
            "and would be silently overwritten/dropped by internal "
            "helper columns — rename them upstream or pass different "
            "out_col/total_col names"
        )


def _adaptive_parts(
    n_parts: int, total: int, rows_per_bucket: int = 1 << 20
) -> int:
    """Bucket count derived from the MEASURED row count (known for
    free from the counting pass): ceil(total / rows_per_bucket), capped
    at the requested/default parallelism. The guide's scale-adaptive
    partitioning (§2) applied to the rank machinery — at cluster scale
    the cap binds and behavior is unchanged, while a small frame stops
    paying for ~n_cpus boundary literals (31 struct comparisons ×
    every row, and their codegen) plus a sample collect, to split 15k
    rows that one sort task handles in milliseconds (measured r11:
    the fixed overhead dominated every small-frame ranking query). A
    2^20-row bucket is a few-hundred-MB sort partition at typical rank
    row widths — inside the guide's 100 MB-1 GB partition target.
    Floor of 2: one bucket would constant-fold the window's partition
    key into an ``Exchange SinglePartition`` — the exact plan shape the
    registry-wide plan gate (tests/test_plan_health.py) bans; two
    buckets keep the partitioned-window invariant auditable at one
    boundary comparison of cost."""
    return max(2, min(n_parts, -(-total // rows_per_bucket)))


def _persist_if_uncached(df: DataFrame) -> tuple[DataFrame, bool]:
    """Persist for the internal multi-pass phase UNLESS the caller
    already cached this frame (following the docstring advice to
    pre-persist) — unpersisting a caller-owned cache in the finally
    block would silently destroy it and force the upstream plan to
    recompute everywhere. Returns (frame, we_own_the_persist)."""
    if df.is_cached:
        return df, False
    return df.persist(), True


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rn",
    total_col: str | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Add exact 1-based global row numbers by ``order_cols`` (a total
    order over non-null keys — NULLs raise) without a single-partition
    sort. ``total_col`` optionally adds the total row count as a
    literal column (known for free from the counting pass — saves
    callers a second job for ratios like percent_rank). The input is
    persisted across the three internal passes (count+null check,
    boundary sample, per-bucket counts) and unpersisted before return,
    so an expensive upstream plan computes twice in total (once for
    the passes, once at consumption) — pre-persist caller-side to make
    it once. Output row order is unspecified (sort at the edge)."""
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    _require_free_columns(
        df, ["__b", out_col, total_col], "global_row_number"
    )
    df, own_cache = _persist_if_uncached(df)
    try:
        total = _count_and_check_nulls(df, order_cols)
        if total == 0:
            out = df.withColumn(out_col, F.lit(None).cast("long"))
            if total_col is not None:
                out = out.withColumn(total_col, F.lit(0).cast("long"))
            return out
        if n_partitions is None:
            n_parts = _adaptive_parts(n_parts, total)
        bounds = _sample_boundaries(df, order_cols, total, n_parts)
        bucketed = df.withColumn("__b", _bucket_expr(df, order_cols, bounds))
        counts = {
            r["__b"]: r["n"]
            for r in bucketed.groupBy("__b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        offsets, acc = {}, 0
        for b in sorted(counts):  # bucket ids ascend with the key order
            offsets[b] = acc
            acc += counts[b]
        omap = F.create_map(
            *[x for b, off in sorted(offsets.items()) for x in (F.lit(b), F.lit(off))]
        )
        w = Window.partitionBy("__b").orderBy(*order_cols)
        out = bucketed.withColumn(
            out_col, F.row_number().over(w).cast("long") + omap[F.col("__b")]
        ).drop("__b")
        if total_col is not None:
            out = out.withColumn(total_col, F.lit(total).cast("long"))
        return out
    finally:
        if own_cache:
            df.unpersist()


def global_row_number_multi(
    df: DataFrame,
    rankings: Sequence[tuple[Sequence[str], str]],
    total_col: str | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Several exact global row-number columns over DIFFERENT total
    orders in ONE machinery invocation — the fused twin of calling
    ``global_row_number`` per order (r11: the RFM triple-NTILE chain
    paid 3× count + 3× sample + 3× bucket-count driver jobs plus a
    re-persist of each intermediate). Fusion: one counting/null pass
    over the union of key columns, one seeded sample collect shared by
    every order (boundaries only steer bucket BALANCE — any boundary
    set yields the same exact ranks), one map-side-only wide aggregate
    counting every (order, bucket) cell (no shuffle: bucket counts per
    order are ≤ n_parts count-if columns in a single 1-row agg), then
    all partitioned rank windows chained in one returned plan.
    ``rankings`` is a sequence of (order_cols, out_col). Same NULL-key
    contract and unspecified output order as ``global_row_number``."""
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    rankings = [(list(oc), out) for oc, out in rankings]
    all_keys: list[str] = []
    for oc, _ in rankings:
        for c in oc:
            if c not in all_keys:
                all_keys.append(c)
    helper = [f"__b{i}" for i in range(len(rankings))]
    _require_free_columns(
        df,
        [*helper, *[out for _, out in rankings], total_col],
        "global_row_number_multi",
    )
    df, own_cache = _persist_if_uncached(df)
    try:
        total = _count_and_check_nulls(df, all_keys)
        if total == 0:
            out = df
            for _, out_col in rankings:
                out = out.withColumn(out_col, F.lit(None).cast("long"))
            if total_col is not None:
                out = out.withColumn(total_col, F.lit(0).cast("long"))
            return out
        if n_partitions is None:
            n_parts = _adaptive_parts(n_parts, total)
        # one shared sample: _sample_boundaries' exact selection logic,
        # applied per order to the same collected rows
        target = n_parts * 100
        frac = min(1.0, target / max(total, 1))
        samp_rows = (
            df.select(*all_keys).sample(frac, seed=42).collect()
            if n_parts > 1
            else []
        )
        bounds_per: list[list[tuple]] = []
        for oc, _ in rankings:
            samp = sorted(tuple(r[c] for c in oc) for r in samp_rows)
            bounds: list[tuple] = []
            if samp:
                step = max(1, len(samp) // n_parts)
                for i in range(step, len(samp), step):
                    if len(bounds) >= n_parts - 1:
                        break
                    if not bounds or samp[i] != bounds[-1]:
                        bounds.append(samp[i])
            bounds_per.append(bounds)
        bucketed = df
        for i, (oc, _) in enumerate(rankings):
            bucketed = bucketed.withColumn(
                helper[i], _bucket_expr(df, oc, bounds_per[i])
            )
        # fused bucket counts: ≤ n_parts count-ifs per order, one 1-row
        # map-side aggregate — no per-order collect jobs
        count_cols = [
            F.sum(
                F.when(F.col(helper[i]) == b, 1).otherwise(0)
            ).alias(f"__c_{i}_{b}")
            for i, (_, _o) in enumerate(rankings)
            for b in range(len(bounds_per[i]) + 1)
        ]
        crow = bucketed.agg(*count_cols).first()
        out = bucketed
        for i, (oc, out_col) in enumerate(rankings):
            offsets, acc = {}, 0
            for b in range(len(bounds_per[i]) + 1):
                offsets[b] = acc
                acc += crow[f"__c_{i}_{b}"] or 0
            omap = F.create_map(
                *[
                    x
                    for b, off in sorted(offsets.items())
                    for x in (F.lit(b), F.lit(off))
                ]
            )
            w = Window.partitionBy(helper[i]).orderBy(*oc)
            out = out.withColumn(
                out_col,
                F.row_number().over(w).cast("long") + omap[F.col(helper[i])],
            )
        out = out.drop(*helper)
        if total_col is not None:
            out = out.withColumn(total_col, F.lit(total).cast("long"))
        return out
    finally:
        if own_cache:
            df.unpersist()


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    weight_col: str,
    out_col: str = "cum_sum",
    total_col: str | None = None,
    n_partitions: int | None = None,
    non_negative: bool = False,
) -> DataFrame:
    """Exact global running sum of ``weight_col`` by ``order_cols``
    (a total order over non-null keys — NULL keys OR weights raise;
    ``non_negative=True`` additionally rejects negative weights in the
    same counting pass, for consumers whose downstream arithmetic
    assumes a monotone cumulative mass)
    without a single-partition sort — the cumulative-mass twin of
    ``global_row_number`` and the primitive under balanced-shard
    assignment and token-budget cuts. Same three-pass shape: boundary
    literals bucket rows as a pure function of the key, buckets run an
    independent PARTITIONED cumulative window, and per-bucket sums
    become driver prefix offsets. ``total_col`` optionally adds the
    grand total as a literal (free from the offsets pass).

    Exactness: integral weights accumulate in long end-to-end (exact at
    any scale); fractional weights accumulate in double, where the
    bucket-then-offset order differs from a sequential scan by normal
    float reassociation. Inclusive semantics: each row's value includes
    its own weight (``SUM ... ROWS UNBOUNDED PRECEDING``). The input is
    persisted across the internal passes and unpersisted before return;
    pre-persist caller-side if the upstream plan is expensive."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    wtype = df.schema[weight_col].dataType
    integral = isinstance(
        wtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    acc_type = "long" if integral else "double"
    _require_free_columns(
        df, ["__b", out_col, total_col], "global_running_sum"
    )
    df, own_cache = _persist_if_uncached(df)
    try:
        total_rows = _count_and_check_nulls(
            df,
            [*order_cols, weight_col],
            non_negative_col=weight_col if non_negative else None,
        )
        if total_rows == 0:
            out = df.withColumn(out_col, F.lit(None).cast(acc_type))
            if total_col is not None:
                out = out.withColumn(total_col, F.lit(0).cast(acc_type))
            return out
        if n_partitions is None:
            n_parts = _adaptive_parts(n_parts, total_rows)
        bounds = _sample_boundaries(df, order_cols, total_rows, n_parts)
        bucketed = df.withColumn("__b", _bucket_expr(df, order_cols, bounds))
        sums = {
            r["__b"]: r["s"]
            for r in bucketed.groupBy("__b")
            .agg(F.sum(F.col(weight_col).cast(acc_type)).alias("s"))
            .collect()
        }
        offsets, acc = {}, 0 if integral else 0.0
        for b in sorted(sums):  # bucket ids ascend with the key order
            offsets[b] = acc
            acc += sums[b]
        omap = F.create_map(
            *[
                x
                for b, off in sorted(offsets.items())
                for x in (F.lit(b), F.lit(off).cast(acc_type))
            ]
        )
        w = (
            Window.partitionBy("__b")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = bucketed.withColumn(
            out_col,
            F.sum(F.col(weight_col).cast(acc_type)).over(w)
            + omap[F.col("__b")],
        ).drop("__b")
        if total_col is not None:
            out = out.withColumn(total_col, F.lit(acc).cast(acc_type))
        return out
    finally:
        if own_cache:
            df.unpersist()


def grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "rn",
    total_col: str | None = None,
    n_partitions: int | None = None,
    max_groups: int = 100_000,
) -> DataFrame:
    """Per-group twin of ``global_row_number`` for LOW-cardinality
    groups whose members are too numerous for a per-group sort
    partition (the ``Window.partitionBy(seg).orderBy(...)`` trap: one
    sort partition per segment). Buckets range over the combined
    (group, order) key, so a group's rows split across ordered buckets
    and number independently; per-(bucket, group) offsets join back
    broadcast. ``total_col`` adds each group's row count. Group keys
    must be non-null too (NULLs raise — they would silently vanish
    through the offset equi-joins). Use the plain window for
    high-cardinality groups, where per-group counts are small and
    this machinery is unnecessary — the O(buckets x groups) offset
    rows collect to the driver, so a frame with more than
    ``max_groups`` distinct groups raises loudly (counted in the same
    pass as the null check — no extra job) instead of silently driving
    toward a driver OOM. The input is persisted across the internal
    passes and unpersisted before return; pre-persist caller-side if
    the upstream plan is expensive."""
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    keys = [*group_cols, *order_cols]
    _require_free_columns(
        df,
        ["__b", "__wrn", "__off", "__tot", out_col, total_col],
        "grouped_row_number",
    )
    df, own_cache = _persist_if_uncached(df)
    try:
        total, n_groups = _count_and_check_nulls(df, keys, group_cols)
        if n_groups > max_groups:
            raise ValueError(
                f"{n_groups} distinct groups exceed max_groups="
                f"{max_groups}: grouped_row_number collects O(buckets x "
                "groups) offset rows to the driver and is built for "
                "LOW-cardinality groups — use a plain "
                "Window.partitionBy(...).orderBy(...) row_number for "
                "high-cardinality groups (per-group partitions are "
                "small there), or raise max_groups explicitly"
            )
        if total == 0:
            out = df.withColumn(out_col, F.lit(None).cast("long"))
            if total_col is not None:
                out = out.withColumn(total_col, F.lit(None).cast("long"))
            return out
        if n_partitions is None:
            n_parts = _adaptive_parts(n_parts, total)
        bounds = _sample_boundaries(df, keys, total, n_parts)
        bucketed = df.withColumn("__b", _bucket_expr(df, keys, bounds))
        rows = (
            bucketed.groupBy("__b", *group_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        by_group: dict = {}
        for r in sorted(rows, key=lambda r: r["__b"]):
            g = tuple(r[c] for c in group_cols)
            by_group.setdefault(g, []).append((r["__b"], r["__n"]))
        off_rows, totals = [], {}
        for g, parts in by_group.items():
            acc = 0
            for b, n in parts:
                off_rows.append((int(b), *g, acc))
                acc += n
            totals[g] = acc
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        gfields = df.select(*group_cols).schema.fields  # exact group types
        off_schema = StructType(
            [StructField("__b", IntegerType(), False), *gfields,
             StructField("__off", LongType(), False)]
        )
        from thundercats_spark.physical.util import local_frame

        off_df = local_frame(spark, off_rows, off_schema)
        tot_schema = StructType([*gfields, StructField("__tot", LongType(), False)])
        tot_df = local_frame(
            spark, [(*g, int(n)) for g, n in totals.items()], tot_schema
        )
        w = Window.partitionBy("__b", *group_cols).orderBy(*order_cols)
        out = (
            bucketed.withColumn("__wrn", F.row_number().over(w).cast("long"))
            .join(F.broadcast(off_df), ["__b", *group_cols])
            .withColumn(out_col, F.col("__wrn") + F.col("__off"))
            .drop("__wrn", "__off", "__b")
        )
        if total_col is not None:
            out = out.join(F.broadcast(tot_df), list(group_cols)).withColumnRenamed(
                "__tot", total_col
            )
        return out
    finally:
        if own_cache:
            df.unpersist()


def disc_rank(p: float, n: int) -> int:
    """The 1-based ``percentile_disc`` rank: the smallest k with
    cume_dist k/n >= p, i.e. ``ceil(n*p)`` — computed with EXACT
    rational arithmetic on p's shortest decimal form (``str(p)``), not
    IEEE multiply-then-ceil. The float product overshoots at
    adversarial pairs (25 * 0.28 = 7.000000000000001 -> ceil 8, one
    rank high); the decimal-intent exact product gives 7. This is
    bit-identical to DuckDB's ``quantile_disc`` with a DECIMAL quantile
    literal — the form every oracle SQL string uses — verified over a
    7,102-point (n<=500, p) grid with 0 mismatches (DOUBLE-typed
    quantiles take DuckDB's float path and can differ by one rank at
    exactly those adversarial pairs; don't cast the literal)."""
    import math
    from fractions import Fraction

    return max(1, math.ceil(Fraction(str(p)) * n))


def _percentile_plan(
    ps: Sequence[float], n: int, mode: str = "cont"
) -> list[tuple]:
    """Shared boundary-rank plan: for each p, the 1-based lo/hi ranks
    and the interpolation fraction. One implementation so the global
    and grouped operators (and their SQL-oracle parity) cannot drift
    apart. ``mode="cont"`` = SQL ``percentile_cont`` (interpolate at
    ``h = (n-1)p``); ``mode="disc"`` = SQL ``percentile_disc`` via
    ``disc_rank`` (exact decimal-intent rank, no interpolation). disc
    answers are actual data values, so downstream comparisons against
    them (e.g. MAD outlier thresholds) are reproducible across engines
    with no last-ulp interpolation divergence.

    cont keeps IEEE ``h = (n-1)*p`` deliberately: at the adversarial
    decimal-integral pairs (e.g. n=26, p=0.28) the float h overshoots
    by ~1 ulp, so lo/hi straddle where exact math would pin one rank —
    but the result differs from the exact-h value by ``frac*(hi-lo)``
    with frac ~1e-15, absorbed by the queries' round(6) for any value
    gap below ~5e8. disc had no such damping (a one-rank miss returns
    a DIFFERENT DATA VALUE outright), hence exact arithmetic there."""
    import math

    out = []
    for p in ps:
        if mode == "disc":
            r = disc_rank(p, n)
            out.append((p, r, r, 0.0))
        else:
            h = (n - 1) * p
            lo = math.floor(h)
            out.append((p, lo + 1, math.ceil(h) + 1, h - lo))
    return out


def _check_mode(mode: str) -> None:
    if mode not in ("cont", "disc"):
        raise ValueError(f"mode must be 'cont' or 'disc', got {mode!r}")


def _check_ps(ps: Sequence[float]) -> list[float]:
    ps = [float(p) for p in ps]
    if not ps:
        raise ValueError("ps must be non-empty")
    if any(p < 0.0 or p > 1.0 for p in ps):
        raise ValueError(f"percentiles must be in [0, 1], got {ps}")
    return ps


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: Sequence[float],
    n_partitions: int | None = None,
    tie_break_cols: Sequence[str] = (),
    mode: str = "cont",
) -> DataFrame:
    """EXACT percentiles computed distributed — ``mode="cont"``
    (default) is SQL ``percentile_cont`` (linear interpolation at
    ``h = (n-1)p``); ``mode="disc"`` is SQL ``percentile_disc`` (the
    smallest value with cume_dist >= p — an ACTUAL data value, which
    makes downstream threshold comparisons engine-reproducible) — the scale path where Spark's exact ``percentile``
    aggregate buffers every value of the group in one reducer's memory
    and approx_percentile trades away exactness. Rides
    ``global_row_number`` over the value order (boundary-literal
    buckets, partitioned windows — never a single-partition sort),
    then fetches ONLY the <= 2|ps| boundary-rank rows and interpolates
    driver-side (a bounded collect). NULL values are ignored, matching
    both engines' aggregate semantics. Ties never change the ANSWER
    (the sorted multiset's k-th value is unique however equal values
    are ordered among themselves), but they do affect BALANCE: bucket
    ids are a pure function of the order key, so a heavily-tied value
    column (low-cardinality scores, modal token counts) concentrates
    each popular value in one bucket — pass ``tie_break_cols`` (e.g.
    the table's primary key, non-null) to spread ties across buckets
    at scale. Returns a small frame ``(p, value)`` ordered by p (empty
    when the input has no non-null values)."""
    spark = df.sparkSession
    ps = _check_ps(ps)
    _check_mode(mode)
    tb = list(tie_break_cols)
    vals = df.select(
        F.col(value_col).cast("double").alias("__v"), *tb
    ).where(F.col("__v").isNotNull())
    # persist across the probe + boundary-rank fetch: global_row_number
    # released its internal cache on return, and without this the
    # upstream plan would recompute for each of the two actions below
    rn = global_row_number(
        vals, ["__v", *tb], out_col="__rn", total_col="__n",
        n_partitions=n_partitions,
    ).persist()
    try:
        first = rn.select("__n").first()
        n = int(first["__n"]) if first is not None else 0
        if n == 0:
            return spark.createDataFrame([], "p double, value double")
        plan = _percentile_plan(ps, n, mode)
        ranks = sorted({r for _, lo, hi, _ in plan for r in (lo, hi)})
        at = {
            r["__rn"]: r["__v"]
            for r in rn.where(F.col("__rn").isin(*ranks)).collect()
        }
        rows = [
            (p, float(at[lo] + frac * (at[hi] - at[lo])))
            for p, lo, hi, frac in plan
        ]
        from pyspark.sql.types import DoubleType, StructField, StructType

        from thundercats_spark.physical.util import local_frame

        return local_frame(
            spark,
            sorted(rows),
            StructType(
                [
                    StructField("p", DoubleType()),
                    StructField("value", DoubleType()),
                ]
            ),
        )
    finally:
        rn.unpersist()


def exact_percentiles_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
    n_partitions: int | None = None,
    max_groups: int = 100_000,
    tie_break_cols: Sequence[str] = (),
    mode: str = "cont",
) -> DataFrame:
    """Per-group twin of ``exact_percentiles`` for LOW-cardinality
    groups whose members are too numerous for the per-group buffering
    of Spark's exact ``percentile`` aggregate (which materializes each
    group's entire value set in one reducer — the 100x-scale OOM in a
    "percentiles by segment" report where every segment is a fat slice
    of the table). Rides ``grouped_row_number``; the per-group
    boundary ranks are computed driver-side from the group totals
    (one cheap agg over the internally-persisted narrow rank frame)
    and fetched via one broadcast semi-join (<= 2|ps| x groups rows
    collected — bounded like the operator's other driver math, and
    guarded by ``max_groups`` upstream). Returns a long-format frame
    ``(group_cols..., p, value)``; pivot at the edge for wide reports.
    NULL values are ignored per aggregate semantics; NULL GROUP keys
    raise (the module's loud-NULL contract — a NULL-keyed group row
    as GROUP BY produces is not expressible through the offset
    equi-joins; filter or impute upstream). ``tie_break_cols`` spreads
    heavily-tied values across buckets, and ``mode`` picks
    cont/disc percentile semantics, as in ``exact_percentiles``."""
    spark = df.sparkSession
    ps = _check_ps(ps)
    _check_mode(mode)
    reserved = {"p", "value"} & set(group_cols)
    if reserved:
        raise ValueError(
            f"group column(s) {sorted(reserved)} collide with the "
            "output columns (p/value) — rename them first"
        )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    gfields = df.select(*group_cols).schema.fields
    out_schema = StructType(
        [*gfields, StructField("p", DoubleType()),
         StructField("value", DoubleType())]
    )
    tb = list(tie_break_cols)
    vals = df.select(
        *group_cols, F.col(value_col).cast("double").alias("__v"), *tb
    ).where(F.col("__v").isNotNull())
    rn = grouped_row_number(
        vals, group_cols, ["__v", *tb], out_col="__rn", total_col="__n",
        n_partitions=n_partitions, max_groups=max_groups,
    ).persist()
    try:
        totals = {
            tuple(r[c] for c in group_cols): r["__gn"]
            for r in rn.groupBy(*group_cols)
            .agg(F.first("__n").alias("__gn"))
            .collect()
        }
        if not totals:
            return spark.createDataFrame([], out_schema)
        plan: dict[tuple, list] = {}
        need = []
        for g, n in totals.items():
            for p, lo, hi, frac in _percentile_plan(ps, int(n), mode):
                plan.setdefault(g, []).append((p, lo, hi, frac))
                need.append((*g, lo))
                need.append((*g, hi))
        from thundercats_spark.physical.util import local_frame

        need_df = local_frame(
            spark,
            list(set(need)),
            StructType([*gfields, StructField("__rn", LongType(), False)]),
        )
        at = {
            (tuple(r[c] for c in group_cols), r["__rn"]): r["__v"]
            for r in rn.join(
                F.broadcast(need_df), [*group_cols, "__rn"], "left_semi"
            ).collect()
        }
        rows = [
            (*g, p, float(at[(g, lo)] + frac * (at[(g, hi)] - at[(g, lo)])))
            for g, items in plan.items()
            for p, lo, hi, frac in items
        ]
        return local_frame(spark, sorted(rows), out_schema)
    finally:
        rn.unpersist()


def _idiv(a, b):
    """Exact integer floor-division for non-negative long Columns.
    Plain ``/`` goes through double, which loses integer resolution
    above 2^53; ``a - pmod(a, b)`` is an exact multiple of ``b``, and
    decimal division of an exact multiple is exact at any long."""
    return ((a - F.pmod(a, b)).cast("decimal(38,0)") / b).cast("long")


def ntile_from_rn(rn, n, k: int):
    """SQL NTILE(k) from a 1-based row number ``rn`` and group size
    ``n`` (Columns): the first ``n % k`` buckets hold ``n//k + 1``
    rows, the rest ``n//k`` — the exact window-function distribution,
    as a plain expression (no window needed once rn exists). All
    arithmetic stays in the integer domain (``_idiv``), honoring the
    module's exact-at-any-scale contract — fp quotients can cross an
    integer boundary above 2^53 rows."""
    rn = rn.cast("long")
    n = n.cast("long")
    klit = F.lit(k).cast("long")
    q = _idiv(n, klit)
    r = n - q * klit
    big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    return (
        F.when(q == 0, rn)  # fewer rows than buckets: one row per bucket
        # ceil(a/d) == (a + d - 1) div d, exactly, in integers
        .when(rn <= big, _idiv(rn + q, q + 1))
        .otherwise(r + _idiv(rn - big + q - F.lit(1), q))
        .cast("int")
    )
