"""Round-7 scale rehearsals (VERDICT r06 #5/#6/#7). Three probes no
small-SF correctness run exercises, each merged into
tools/scale_stats.json so the round's BENCH artifact records the scale
posture:

1. ``cc_iterative_x10`` — connected components FORCED onto the
   distributed pointer-halving path (``small_graph_rows=0``) over an
   adversarial long-chain (diameter 65,536) + hot-hub graph. Asserts
   iteration count <= ceil(log2(diameter)) + 2 and exact equality with
   the driver union-find. Since the 500k-edge fast path landed, no
   rehearsal had actually run the iterative loop at scale-shape.

2. ``robust_million_groups`` — ``mad_outlier_stats`` at the raised
   ceiling: 10^6 synthetic groups x 3 rows (the grouped-ranking driver
   math is O(buckets x groups); this is the size the default
   max_groups=100k guard exists to stop — here it is raised
   deliberately). Result stays DISTRIBUTED (r07 localCheckpoint);
   spot-checks closed-form medians for a sample of groups.

3. ``skew_join_ab`` — 90%-hot-key join A/B at x10 rows: sort-merge
   with AQE skew-split OFF vs ON vs ``salted_join`` (buckets=32),
   broadcast disabled on all three so the skewed shuffle actually
   happens (broadcast is always the FIRST choice when the dim fits —
   this report is for when it doesn't). AQE's skew thresholds are
   lowered to fire at rehearsal scale; real clusters keep defaults
   because real partitions are GB-sized. The wall-clocks tell a user
   when explicit salting still beats AQE: AQE splits oversized
   PARTITIONS, salting splits oversized KEYS — a single key hotter
   than the advisory size stays one task under AQE alone unless the
   skew split kicks in, and salted_agg-style pre-spreading is the only
   lever for non-join aggregations.

Added during the round: 4. ``skew_agg_ab`` — the aggregation-side
skew A/B (algebraic aggs collapse map-side and never need salting;
exact count_distinct salts on the VALUE hash, and only pays once a
key's distinct state outgrows a reducer), and 5. ``affinity_x10`` —
part_affinity_lift candidate-pair growth at x10 facts (linear by
basket-size bound; the n_ab>=2 REPORT legitimately explodes under
replication, so the candidate count is the work metric).

Usage: python tools/r07_rehearsals.py [--skip-robust]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thundercats_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATS = os.path.join(REPO, "tools", "scale_stats.json")


def merge_stats(key: str, value) -> None:
    data = {}
    if os.path.exists(STATS):
        with open(STATS) as f:
            data = json.load(f)
    data[key] = value
    with open(STATS, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def cc_iterative_rehearsal(spark) -> dict:
    from thundercats_spark.operators.components import connected_components

    diameter = 65_536
    chain = spark.range(diameter).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    hub = spark.range(1, 150_000).select(
        F.lit(10_000_000).alias("id_a"),
        (F.col("id") + 10_000_000).alias("id_b"),
    )
    bridge = spark.createDataFrame(
        [(1000, 10_000_050)], "id_a long, id_b long"
    )
    edges = chain.union(hub).union(bridge)

    stats: dict = {}
    t0 = time.time()
    out = connected_components(edges, small_graph_rows=0, stats=stats)
    n_nodes = out.count()
    iter_secs = time.time() - t0
    assert stats["path"] == "iterative", stats

    bound = math.ceil(math.log2(diameter)) + 2
    assert stats["iterations"] <= bound, (stats, bound)

    # exact equality with the driver union-find (the two paths must be
    # indistinguishable to every consumer)
    t0 = time.time()
    ref = connected_components(edges, small_graph_rows=10**9)
    mismatch = (
        out.withColumnRenamed("component", "c1")
        .join(ref.withColumnRenamed("component", "c2"), "id", "full")
        .where(
            F.col("c1").isNull()
            | F.col("c2").isNull()
            | (F.col("c1") != F.col("c2"))
        )
        .count()
    )
    uf_secs = time.time() - t0
    assert mismatch == 0, f"{mismatch} label mismatches vs union-find"
    n_comp = out.select("component").distinct().count()
    assert n_comp == 1  # bridge fuses chain + hub into one component
    return {
        "diameter": diameter,
        "n_nodes": n_nodes,
        "sym_edges": stats["sym_edges"],
        "iterations": stats["iterations"],
        "iteration_bound": bound,
        "iterative_secs": round(iter_secs, 2),
        "union_find_secs": round(uf_secs, 2),
        "mismatches": mismatch,
    }


def robust_million_groups(spark) -> dict:
    from thundercats_spark.operators.robust import mad_outlier_stats

    n_groups = 1_000_000
    rows_per = 3
    # deterministic values: group g holds {g%7, g%7+1, g%7+5} → median
    # g%7+1, deviations {1,0,4} → MAD 1, outliers at k=3: |4| > 3*1 → 1
    df = (
        spark.range(n_groups * rows_per)
        .select(
            (F.col("id") % n_groups).alias("g"),
            (F.col("id") / n_groups).cast("int").alias("r"),
        )
        .select(
            "g",
            (
                (F.col("g") % 7)
                + F.when(F.col("r") == 0, 0.0)
                .when(F.col("r") == 1, 1.0)
                .otherwise(5.0)
            ).alias("v"),
        )
    )
    t0 = time.time()
    out = mad_outlier_stats(
        df, ["g"], "v", k=3.0, max_groups=n_groups, tie_break_cols=[]
    )
    n_out = out.count()
    secs = time.time() - t0
    assert n_out == n_groups, n_out
    sample = {r["g"]: r for r in out.where(F.col("g") % 99_991 == 0).collect()}
    for g, r in sample.items():
        want_med = float(g % 7 + 1)
        assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (
            3, want_med, 1.0, 1,
        ), (g, r)
    return {
        "n_groups": n_groups,
        "rows": n_groups * rows_per,
        "secs": round(secs, 2),
        "sampled_groups_checked": len(sample),
        "distributed_result": True,
    }


def skew_join_ab(spark) -> dict:
    from thundercats_spark.operators.skew import salted_join

    n_big, n_keys = 10_000_000, 10_000
    # 90% of rows carry key 0; the rest spread uniformly
    big = spark.range(n_big).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.col("id") % n_keys)
        .alias("k"),
        (F.col("id") % 97).alias("payload"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("dim")
    )
    agg = lambda j: j.groupBy("k").agg(
        F.sum(F.col("payload") + F.col("dim")).alias("s")
    )

    def timed(build, reps=3):
        build().write.format("noop").mode("overwrite").save()  # warm
        xs = []
        for _ in range(reps):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            xs.append(time.time() - t0)
        return round(statistics.median(xs), 2)

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # fire AQE's split at rehearsal scale (local partitions are MB,
        # not the GB a real cluster sees with default 256m thresholds)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16m",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = timed(lambda: agg(big.join(small, "k")))
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        aqe = timed(lambda: agg(big.join(small, "k")))
        salted = timed(lambda: agg(salted_join(big, small, ["k"], buckets=32)))
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    return {
        "rows_big": n_big,
        "hot_key_share": 0.9,
        "plain_smj_secs": plain,
        "aqe_skew_split_secs": aqe,
        "salted_32_secs": salted,
        "note": (
            "broadcast disabled on all variants (the report targets "
            "non-broadcastable dims); AQE thresholds lowered to fire "
            "at MB-scale local partitions"
        ),
    }


def main():
    spark = get_spark("r07-rehearsals")
    spark.sparkContext.setLogLevel("ERROR")

    r = cc_iterative_rehearsal(spark)
    merge_stats("cc_iterative_x10", r)
    print("cc_iterative_x10:", json.dumps(r))

    if "--skip-robust" not in sys.argv:
        r = robust_million_groups(spark)
        merge_stats("robust_million_groups", r)
        print("robust_million_groups:", json.dumps(r))

    r = skew_join_ab(spark)
    merge_stats("skew_join_ab", r)
    print("skew_join_ab:", json.dumps(r))

    r = skew_agg_ab(spark)
    merge_stats("skew_agg_ab", r)
    print("skew_agg_ab:", json.dumps(r))

    r = affinity_x10_rehearsal(spark)
    merge_stats("affinity_x10", r)
    print("affinity_x10:", json.dumps(r))


def affinity_x10_rehearsal(spark) -> dict:
    """Wave-7 addendum: part_affinity_lift at x10 facts. The pair
    fan-out is bounded by per-basket size (replicated orders join
    within themselves — basket-size distribution unchanged), so pair
    rows and wall-clock should grow ~linearly with baskets, never
    quadratically with parts."""
    from thundercats_spark.queries import all_queries

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scale_check import build_tpch_replica

    q = all_queries()["part_affinity_lift"].spark_fn
    base = "/root/testdata/sf0.1"
    x10 = build_tpch_replica(spark, base, 10)

    def candidates(sf_dir):
        # the JOIN WORK metric: distinct (pair) rows BEFORE the
        # n_ab >= 2 report filter. (The filtered output is NOT a work
        # metric on replicas: every base pair's count multiplies by
        # the replica factor, so once-off pairs cross the >=2 bar and
        # the report legitimately explodes — first run measured 334x
        # output growth against exactly 10x join work.)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
        return (
            a.join(b, "k").where(F.col("pa") < F.col("pb")).count()
        )

    def run(sf_dir):
        t0 = time.time()
        out = q(spark, sf_dir)
        n = out.count()
        return n, round(time.time() - t0, 2)

    run(base)  # warm
    n1, t1 = run(base)
    n10, t10 = run(x10)
    c1, c10 = candidates(base), candidates(x10)
    return {
        "candidate_pairs_x1": c1, "candidate_pairs_x10": c10,
        "candidate_growth": round(c10 / c1, 2) if c1 else None,
        "report_rows_x1": n1, "report_rows_x10": n10,
        "secs_x1": t1, "secs_x10": t10,
        "time_growth": round(t10 / t1, 2) if t1 else None,
    }


def skew_agg_ab(spark) -> dict:
    """Aggregation-side twin of skew_join_ab: AQE has NO skew handling
    for aggregations (the skew-split only rewrites join stages), so a
    90%-hot group key leaves one reducer holding 9M rows however
    adaptive the plan is — UNLESS map-side partial aggregation already
    collapses the key (sum/count collapse per-partition to one row per
    (key, partition): the hot key costs each mapper one cell, and the
    'hot' reduce key receives n_partitions rows — skew solved for
    free). salted_agg exists for the aggregations where partial
    aggregation does NOT collapse (high-cardinality intermediate
    state: collect_list/distinct-ish accumulators) — rehearsed here
    via count_distinct over a wide value domain, where the partial
    state for the hot key is ~its distinct set."""
    n_big = 10_000_000
    big = spark.range(n_big).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.col("id") % 10_000)
        .alias("k"),
        (F.col("id") % 1_000_003).alias("v"),
    )

    def timed(build, reps=3):
        build().write.format("noop").mode("overwrite").save()
        xs = []
        for _ in range(reps):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            xs.append(time.time() - t0)
        return round(statistics.median(xs), 2)

    # algebraic agg: partial aggregation collapses the hot key map-side
    plain_sum = timed(lambda: big.groupBy("k").agg(F.sum("v").alias("s")))

    # non-collapsing agg: exact distinct per key (expand + 2 shuffles
    # in Spark's planning; the hot key's distinct set is the state)
    plain_cd = timed(
        lambda: big.groupBy("k").agg(F.count_distinct("v").alias("d"))
    )
    # salted two-phase: distinct within (k, salt) shards, then merge
    # counts — exact because v is hash-sharded: each distinct v lands
    # in exactly one shard, so shard-distinct counts ADD.
    def salted_cd():
        salted = big.withColumn(
            "__s", F.pmod(F.xxhash64("v"), F.lit(32))
        )
        part = salted.groupBy("k", "__s").agg(
            F.count_distinct("v").alias("pd")
        )
        return part.groupBy("k").agg(F.sum("pd").alias("d"))

    salted_cd_secs = timed(salted_cd)
    # sanity: identical results
    a = {r["k"]: r["d"] for r in
         big.groupBy("k").agg(F.count_distinct("v").alias("d")).collect()}
    b = {r["k"]: r["d"] for r in salted_cd().collect()}
    assert a == b
    return {
        "rows": n_big,
        "hot_key_share": 0.9,
        "plain_sum_secs": plain_sum,
        "plain_count_distinct_secs": plain_cd,
        "salted_count_distinct_secs": salted_cd_secs,
        "note": (
            "sum/count need no salting (map-side partial agg collapses "
            "hot keys); count_distinct's per-key state does not "
            "collapse — salting on the VALUE hash shards it exactly"
        ),
    }


if __name__ == "__main__":
    main()
