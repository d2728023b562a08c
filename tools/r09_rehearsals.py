"""Round-9 scale rehearsals. One new iterative operator landed this
round (dag_reachability — squaring closure for multi-parent graphs);
rehearse it on the shapes no small-SF pytest exercises, and merge the
telemetry into tools/scale_stats.json like every prior round:

1. ``dag_layered`` — a 20-layer, 500-nodes/layer DAG (each node wired
   to 2 parents in the previous layer: ancestor windows grow one node
   per layer). Depth 19 → the squaring loop must land in
   ceil(log2(19)) + 2 rounds (doubling + the fixpoint-confirm pass),
   NOT 19. Asserts the bound, the root-pair count against the closed
   form, and wall time. Sized to the operator's honest cost model: the
   per-round compose join's intermediate is the midpoint-relay volume
   (Σ over midpoints of in-pairs × out-pairs), which for dense layered
   windows grows as closure × average-ancestry — the docstring's
   documented reason to prefer level-by-level label propagation when
   only root labels are needed on a very wide graph.

2. ``dag_diamond_ladder`` — the adversarial MAX-PATHS shape: a ladder
   of D stacked diamonds (2 parallel nodes per rung) has 2^D distinct
   paths top-to-bottom; path ENUMERATION is exponential, but the pair
   closure (what the operator materializes) stays O(nodes²) and min/max
   depths are exact closed forms (min = max through every diamond).
   Proves the algorithm's cost tracks the CLOSURE, not the path count —
   the property that makes it usable on citation/category graphs.

3. ``scd2_x10`` — the round's windowed gaps-and-islands query family:
   replicate sf0.1 orders x10 by disjoint customer offsets. Segment
   count must scale exactly 10x (disjoint copies), wall sublinear
   (per-customer windows, no global sort except presentation).

Usage: python tools/r09_rehearsals.py
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


def dag_layered(spark) -> dict:
    from thundercats_spark.operators.hierarchy import dag_reachability

    layers, per = 20, 500
    n = layers * per
    # node id = layer*per + j; parents of (L, j) are (L-1, j) and
    # (L-1, (j+1) mod per) — every node reaches layer 0, and the
    # reachable-root set of (L, j) is the j..j+L window mod per, so
    # the closure size has a closed form: sum_L per*min(L+1, per).
    ids = spark.range(n).select(
        F.col("id").alias("child"),
        (F.col("id") / per).cast("long").alias("layer"),
        (F.col("id") % per).alias("j"),
    ).where(F.col("layer") > 0)
    edges = ids.select(
        "child",
        ((F.col("layer") - 1) * per + F.col("j")).alias("parent"),
    ).unionByName(
        ids.select(
            "child",
            ((F.col("layer") - 1) * per + (F.col("j") + 1) % per).alias(
                "parent"
            ),
        )
    )
    stats: dict = {}
    t0 = time.time()
    out = dag_reachability(edges, stats=stats)
    n_pairs = out.count()
    secs = round(time.time() - t0, 2)
    depth = layers - 1
    bound = math.ceil(math.log2(depth)) + 2  # doubling + fixpoint confirm
    assert stats["iterations"] <= bound, (stats["iterations"], bound)
    expected_pairs = sum(per * min(lay + 1, per) for lay in range(layers))
    assert n_pairs == expected_pairs, (n_pairs, expected_pairs)
    # spot-check one node's root window: node (depth, 0) reaches
    # depth+1 roots, min depth == max depth == depth (every edge
    # climbs exactly one layer, so all paths have equal length)
    probe = {
        r["root_key"]: (r["min_depth"], r["max_depth"])
        for r in out.where(F.col("node") == (layers - 1) * per).collect()
    }
    assert len(probe) == layers and all(
        v == (depth, depth) for v in probe.values()
    ), list(probe.items())[:3]
    return {
        "n_nodes": n,
        "depth": depth,
        "iterations": stats["iterations"],
        "iteration_bound": bound,
        "n_root_pairs": n_pairs,
        "pairs_per_iteration": stats["pairs_per_iteration"],
        "secs": secs,
    }


def dag_diamond_ladder(spark) -> dict:
    from thundercats_spark.operators.hierarchy import dag_reachability

    d = 24  # 2^24 = 16.7M distinct paths; closure stays ~3 rows/node
    # rung r: nodes a_r, b_r (ids 3r+1, 3r+2), junction j_r (3r+3=3(r+1));
    # junction 0 is the root (id 0). Edges: a_r->j_{r-1}... build child->parent
    rows = []
    for r in range(d):
        base = 3 * r
        rows += [
            (base + 1, base),      # a_r -> junction below
            (base + 2, base),      # b_r -> junction below
            (base + 3, base + 1),  # next junction -> a_r
            (base + 3, base + 2),  # next junction -> b_r
        ]
    edges = spark.createDataFrame(rows, "child long, parent long")
    stats: dict = {}
    t0 = time.time()
    out = dag_reachability(edges, stats=stats, roots_only=False)
    n_pairs = out.count()
    secs = round(time.time() - t0, 2)
    top = {
        r["root_key"]: (r["min_depth"], r["max_depth"])
        for r in out.where(
            (F.col("node") == 3 * d) & (F.col("root_key") == 0)
        ).collect()
    }
    # top junction to root: every path alternates junction->arm->junction,
    # 2 edges per diamond — min == max == 2d despite 2^d distinct paths
    assert top[0] == (2 * d, 2 * d), top
    bound = math.ceil(math.log2(2 * d)) + 2
    assert stats["iterations"] <= bound, (stats["iterations"], bound)
    n_nodes = 3 * d + 1
    assert n_pairs <= n_nodes * n_nodes, n_pairs
    return {
        "diamonds": d,
        "distinct_paths_top_to_root": 2 ** d,
        "n_nodes": n_nodes,
        "closure_pairs": n_pairs,
        "iterations": stats["iterations"],
        "iteration_bound": bound,
        "secs": secs,
    }


def scd2_x10(spark) -> dict:
    from thundercats_spark.queries import load
    from thundercats_spark.queries.analytics7 import scd2_intervals

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = load(spark, sf_dir, "orders")["orders"].select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    ).localCheckpoint()
    max_cust = orders.agg(F.max("o_custkey")).first()[0] + 1

    def run(df):
        t0 = time.time()
        n = scd2_intervals(
            df, key="o_custkey", ts="o_orderdate",
            attr="o_orderpriority", tiebreak="o_orderkey",
        ).count()
        return n, round(time.time() - t0, 2)

    n1, s1 = run(orders)  # warm
    n1, s1 = run(orders)
    x10 = None
    for k in range(10):
        c = orders.withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(k * max_cust)
        )
        x10 = c if x10 is None else x10.unionByName(c)
    x10 = x10.localCheckpoint()
    n10, s10 = run(x10)
    n10, s10 = run(x10)
    assert n10 == 10 * n1, (n1, n10)
    return {
        "sf_dir": sf_dir,
        "segments_x1": n1,
        "segments_x10": n10,
        "secs_x1": s1,
        "secs_x10": s10,
        "wall_ratio": round(s10 / s1, 2),
    }


def main():
    spark = get_spark("r09-rehearsals")
    spark.sparkContext.setLogLevel("ERROR")

    r = dag_layered(spark)
    merge_stats("dag_layered", r)
    print("dag_layered:", json.dumps(r))

    r = dag_diamond_ladder(spark)
    merge_stats("dag_diamond_ladder", r)
    print("dag_diamond_ladder:", json.dumps(r))

    r = scd2_x10(spark)
    merge_stats("scd2_x10", r)
    print("scd2_x10:", json.dumps(r))

    spark.stop()


if __name__ == "__main__":
    main()
