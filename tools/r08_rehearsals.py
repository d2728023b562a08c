"""Round-8 scale rehearsals. One new iterative operator landed this
round (hierarchy_paths pointer doubling) — rehearse it on the two
adversarial shapes no small-SF correctness run exercises, and merge
the telemetry into tools/scale_stats.json like every prior round:

1. ``hierarchy_deep_chain`` — a 131,072-deep single chain (the
   recursive-CTE killer: DuckDB/naive Spark walk it in O(depth) steps;
   pointer doubling must land in ceil(log2(D)) + 1 iterations).
   Asserts the iteration bound and closed-form depths (depth(i) = i on
   a chain) for head/middle/tail nodes.

2. ``hierarchy_wide_forest`` — 1M nodes in 127 shallow trees
   (parent = id div 128, depth <= 2 at 1M < 128^3): the breadth case
   where state size, not depth, is the work. Asserts iterations <= 2
   (= ceil(log2 2) + 1) and exact spot depths.

3. ``hierarchy_mixed`` — the REALISTIC adversarial mix: the 1M-node
   shallow forest PLUS a 131,072-deep chain in one edge set. This is
   what the done/active parking exists for: the telemetry must show
   the ~1.1M shallow bulk parking after round 1 and only the ~131k
   chain tail riding the remaining ~16 rounds — without parking every
   round would shuffle all 1.13M live rows.

Usage: python tools/r08_rehearsals.py
"""

from __future__ import annotations

import json
import math
import os
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


def deep_chain(spark) -> dict:
    from thundercats_spark.operators.hierarchy import hierarchy_paths

    depth = 131_072
    edges = spark.range(1, depth + 1).select(
        F.col("id").alias("child"), (F.col("id") - 1).alias("parent")
    )
    stats: dict = {}
    t0 = time.time()
    out = hierarchy_paths(edges, stats=stats)
    got = {
        r["node"]: (r["root_key"], r["depth"])
        for r in out.where(
            F.col("node").isin(0, 1, depth // 2, depth - 1, depth)
        ).collect()
    }
    secs = round(time.time() - t0, 2)
    n = out.count()
    bound = math.ceil(math.log2(depth)) + 1
    assert stats["iterations"] <= bound, (stats, bound)
    for node in (0, 1, depth // 2, depth - 1, depth):
        assert got[node] == (0, node), (node, got[node])
    assert n == depth + 1, n
    return {
        "depth": depth,
        "n_nodes": n,
        "iterations": stats["iterations"],
        "iteration_bound": bound,
        "secs": secs,
        "spot_checks": "exact",
    }


def wide_forest(spark) -> dict:
    from thundercats_spark.operators.hierarchy import hierarchy_paths

    n = 1_000_000
    edges = spark.range(128, n).select(
        F.col("id").alias("child"), F.expr("id div 128").alias("parent")
    )
    stats: dict = {}
    t0 = time.time()
    out = hierarchy_paths(edges, stats=stats)
    # closed-form: depth(i) = number of div-128 steps to reach < 128
    sample = [200, 128 * 128, 128 * 128 * 60 + 5, n - 1]
    got = {
        r["node"]: (r["root_key"], r["depth"])
        for r in out.where(F.col("node").isin(sample)).collect()
    }
    secs = round(time.time() - t0, 2)
    total = out.count()
    assert stats["iterations"] <= 2, stats

    def model(i):
        d = 0
        while i >= 128:
            i //= 128
            d += 1
        return i, d

    for node in sample:
        assert got[node] == model(node), (node, got[node], model(node))
    return {
        "n_nodes": total,
        "n_trees": 127,
        "max_depth": 2,
        "iterations": stats["iterations"],
        "secs": secs,
        "spot_checks": "exact",
    }


def mixed(spark) -> dict:
    from thundercats_spark.operators.hierarchy import hierarchy_paths

    n, depth = 1_000_000, 131_072
    forest = spark.range(128, n).select(
        F.col("id").alias("child"), F.expr("id div 128").alias("parent")
    )
    base = 10_000_000
    chain = spark.range(1, depth + 1).select(
        (F.col("id") + base).alias("child"),
        (F.col("id") - 1 + base).alias("parent"),
    )
    edges = forest.unionByName(chain)
    stats: dict = {}
    t0 = time.time()
    out = hierarchy_paths(edges, stats=stats)
    got = {
        r["node"]: (r["root_key"], r["depth"])
        for r in out.where(
            F.col("node").isin(n - 1, base + depth, base)
        ).collect()
    }
    secs = round(time.time() - t0, 2)
    total = out.count()
    assert got[base + depth] == (base, depth)
    assert got[base] == (base, 0)
    assert total == (n - 1) + (depth + 1), total
    # the parking evidence: after round 1 the shallow 1M bulk is gone
    # and only the chain tail iterates
    act = stats["active_per_iteration"]
    assert act[0] > 1_000_000 and act[1] < 140_000, act
    return {
        "n_nodes": total,
        "chain_depth": depth,
        "iterations": stats["iterations"],
        "active_per_iteration": act,
        "secs": secs,
        "spot_checks": "exact",
    }


def sliding_distinct(spark) -> dict:
    """Wave-9 rehearsal: the exact sliding-distinct operator at
    scale-shape. Synthetic activity with a CLOSED FORM — users 0..U-1,
    user u active exactly on days d ≡ u (mod 7) over D days — so the
    7-day window [d-6, d] of any day d >= 6 covers all residues:
    users_7d == U exactly, and for d < 6 exactly the users with
    u % 7 <= d. Work = U × D/7 activity-days × ≤7 exploded rows; the
    x1 → x10 user sweep pins that wall time tracks that product
    linearly (no quadratic self-join hiding anywhere)."""
    from thundercats_spark.queries.analytics6 import sliding_distinct_users

    days = 140
    out = {}
    # first x1 pass is a discarded warmup: codegen + shuffle-service
    # spin-up would otherwise inflate the small side of the ratio
    for label, users in (("warmup", 20_000), ("x1", 20_000), ("x10", 200_000)):
        ev = (
            spark.range(users)
            .select(
                F.col("id").alias("user_id"),
                F.explode(
                    F.sequence(
                        (F.col("id") % 7).cast("int"),
                        F.lit(days - 1),
                        F.lit(7),
                    )
                ).alias("d"),
            )
            .select(
                F.lit("a").alias("event_type"),
                "user_id",
                (
                    F.lit("2024-01-01 12:00:00").cast("timestamp")
                    + F.make_interval(days=F.col("d"))
                ).alias("ts"),
            )
        )
        t0 = time.time()
        res = sliding_distinct_users(ev)
        rows = {r["day"]: r["users_7d"] for r in res.collect()}
        secs = round(time.time() - t0, 2)
        # closed form: full windows saturate at U; the ramp-in days
        # count exactly the residues seen so far
        assert rows["2024-01-10"] == users, rows["2024-01-10"]
        assert rows["2024-05-19"] == users  # day 139, last full window
        per_residue = users // 7
        rem = users % 7
        for d in range(6):
            want = sum(per_residue + (1 if r < rem else 0) for r in range(d + 1))
            got = rows[f"2024-01-0{d + 1}"]
            assert got == want, (d, got, want)
        if label == "warmup":
            continue
        out[label] = {
            "users": users,
            "activity_days": users * (days // 7),
            "secs": secs,
        }
    out["wall_ratio_x10_vs_x1"] = round(out["x10"]["secs"] / out["x1"]["secs"], 2)
    out["work_ratio"] = 10.0
    return out


def stateful_stream_x10(spark) -> dict:
    """Wave-9 rehearsal: the two STATEFUL streaming paths at x1 → x10
    the sf0.1 events volume (100k → 1M rows). The replica corpus is 10
    disjoint copies of the events table (user_id/event_id offset per
    copy), so within-user time structure is preserved and the exact
    interval-join pair count scales by EXACTLY 10 — a closed-form
    linearity oracle. Each scale asserts (a) the stream-stream
    interval join emits exactly the batch self-join's pair count and
    (b) the state-store windowed agg reproduces the batch GROUP BY
    row-for-row in total count."""
    import shutil
    import tempfile

    from thundercats_spark.queries import load
    from thundercats_spark.streaming.windows import (
        run_available_now_to_memory,
        stream_stream_join,
        windowed_agg,
    )

    ev1 = load(spark, "/root/testdata/sf0.1", "events")["events"]
    base = tempfile.mkdtemp(prefix="stream_x10_")
    out: dict = {}
    try:
        # first x1 pass is a DISCARDED warmup: the first streaming
        # query in a session pays codegen/JIT/state-store class
        # loading that later runs get free — without it the x1 side
        # of the wall ratio conflates one-time warmup with the
        # per-run engine overhead the rehearsal is measuring
        for label, copies in (("warmup", 1), ("x1", 1), ("x10", 10)):
            # cast ts to the LTZ timestamp type: watermarks reject
            # TIMESTAMP_NTZ, and the loaded events frame can carry
            # either depending on the parquet annotation (session tz
            # is pinned UTC, so the cast is deterministic)
            frames = [
                ev1.select(
                    (F.col("event_id") + F.lit(i * 10_000_000)).alias(
                        "event_id"
                    ),
                    F.col("ts").cast("timestamp").alias("ts"),
                    (F.col("user_id") + F.lit(i * 1_000_000)).alias(
                        "user_id"
                    ),
                    "event_type",
                    "value",
                    "props",
                )
                for i in range(copies)
            ]
            src = frames[0]
            for fdf in frames[1:]:
                src = src.unionByName(fdf)
            path = f"{base}/{label}"
            src.write.mode("overwrite").parquet(path)
            static = spark.read.parquet(path)
            n_rows = static.count()

            # batch oracle: the SHARED predicate definition (one copy
            # of the attribution window across oracle SQL twin users)
            from thundercats_spark.queries.analytics6 import (
                batch_view_click_pairs,
            )

            batch_pairs = batch_view_click_pairs(static).count()

            stream = spark.readStream.schema(static.schema).parquet(path)
            t0 = time.time()
            joined = stream_stream_join(
                stream.where(F.col("event_type") == "click").select(
                    "user_id", F.col("event_id").alias("cid"),
                    F.col("ts").alias("cts"),
                ),
                stream.where(F.col("event_type") == "view").select(
                    "user_id", F.col("event_id").alias("vid"),
                    F.col("ts").alias("vts"),
                ),
                key="user_id", left_ts="cts", right_ts="vts",
                within="1 hour", watermark="2 hours",
            )
            got_pairs = run_available_now_to_memory(
                joined, "append", require_single_batch=True
            ).count()
            join_secs = round(time.time() - t0, 2)
            assert got_pairs == batch_pairs, (label, got_pairs, batch_pairs)

            t0 = time.time()
            agg = windowed_agg(
                stream, "ts", ["event_type"],
                [F.count(F.lit(1)).alias("n")],
                window="1 day", watermark="1 hour",
            )
            live = run_available_now_to_memory(agg, "complete")
            stream_total = live.agg(F.sum("n")).collect()[0][0]
            agg_secs = round(time.time() - t0, 2)
            assert stream_total == n_rows, (label, stream_total, n_rows)

            if label == "warmup":
                continue
            out[label] = {
                "rows": n_rows,
                "pairs": got_pairs,
                "join_secs": join_secs,
                "agg_secs": agg_secs,
            }
        assert out["x10"]["pairs"] == 10 * out["x1"]["pairs"], out
        out["pair_linearity"] = "exact 10x (disjoint-copy closed form)"
        out["join_wall_ratio"] = round(
            out["x10"]["join_secs"] / out["x1"]["join_secs"], 2
        )
        out["agg_wall_ratio"] = round(
            out["x10"]["agg_secs"] / out["x1"]["agg_secs"], 2
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main():
    spark = get_spark("r08-rehearsals")
    spark.sparkContext.setLogLevel("ERROR")

    r = deep_chain(spark)
    merge_stats("hierarchy_deep_chain", r)
    print("hierarchy_deep_chain:", json.dumps(r))

    r = wide_forest(spark)
    merge_stats("hierarchy_wide_forest", r)
    print("hierarchy_wide_forest:", json.dumps(r))

    r = mixed(spark)
    merge_stats("hierarchy_mixed", r)
    print("hierarchy_mixed:", json.dumps(r))

    r = sliding_distinct(spark)
    merge_stats("sliding_distinct_x10", r)
    print("sliding_distinct_x10:", json.dumps(r))

    r = stateful_stream_x10(spark)
    merge_stats("stateful_stream_x10", r)
    print("stateful_stream_x10:", json.dumps(r))

    spark.stop()


if __name__ == "__main__":
    main()
