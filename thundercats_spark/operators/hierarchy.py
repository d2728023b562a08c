"""Hierarchy (forest) closure over a (child, parent) edge DataFrame —
the recursive-CTE workload (org charts, category trees, thread
reply-chains, folder layouts) that plain SQL engines express with
``WITH RECURSIVE`` and Spark has no built-in for.

Algorithm: pointer DOUBLING (path halving's read-only cousin). State is
one row per node ``(node, anc, d)`` — the farthest known ancestor and
the exact distance to it. Each iteration self-joins the state on
``anc = node`` and composes jumps: ``(node, anc', d + d')``. Jump
length doubles per round, so a forest of depth D converges in
ceil(log2(D)) + 1 iterations — NOT O(D) like the naive one-step walk
(the difference between 20 and ~1M joins on a degenerate chain).
Roots carry a self-pointer with distance 0, which is the fixpoint.

Scale notes: each iteration is one equi-join shuffle on the ancestor
key, state stays exactly |nodes| rows throughout (never the closure's
|paths| ~ n·depth rows — the transitive-closure blowup the reference
recursive-CTE formulation materializes). Lineage is cut per iteration
(the classic iterative-Spark trap); convergence is an anti-join count
against the root set. A ``max_iters`` ceiling turns a CYCLE (which
pointer doubling would chase forever) into a loud error at
~log2-of-impossible-depth instead of a hung job.

Reference parity: no counterpart (the reference has no recursive
operator); VERDICT r07 #5 named the hierarchy walk as the one
relational shape with no registry representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thundercats_spark.operators.components import _cut_lineage


def hierarchy_paths(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iters: int = 40,
    reliable: bool = False,
) -> DataFrame:
    """Resolve every node of a forest to its root: returns one row per
    node ``(node, root_key, depth)`` where ``depth`` is the exact edge
    count to the root (roots themselves appear with ``depth = 0``).

    ``edges`` holds one row per child→parent link; a node with no
    child-row is a root. Every parent value must itself appear as a
    node or a root — i.e. the edge set must be closed (parents that
    never appear as children are taken as roots automatically). NULL
    child or parent keys raise: a NULL link is a data bug, not a root
    marker. ``max_iters`` bounds the doubling loop; 40 covers depth
    2^39 — hitting it means a CYCLE, and the error says so.

    ``reliable=True`` swaps localCheckpoint for reliable checkpointing
    (set ``spark.sparkContext.setCheckpointDir`` first) — same
    trade-off as ``connected_components``.
    """
    e = edges.select(
        F.col(child_col).alias("node"), F.col(parent_col).alias("anc")
    )
    # One guard scan: NULL links and multi-parent children both break
    # the forest contract (pointer doubling would silently multiply a
    # multi-parent node's rows per iteration — a DAG needs a different
    # operator, not a quiet wrong answer).
    g = e.agg(
        F.sum(
            (F.col("node").isNull() | F.col("anc").isNull()).cast("int")
        ).alias("nulls"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("node")).alias("nd"),
    ).first()
    if g["nulls"]:
        raise ValueError(
            f"{g['nulls']} edge(s) with NULL {child_col!r}/"
            f"{parent_col!r}: a NULL link is a data bug — roots are "
            "nodes with no child-row, not NULL parents"
        )
    if g["n"] != g["nd"]:
        raise ValueError(
            f"{g['n'] - g['nd']} duplicate child key(s): a node with "
            "multiple parents makes this a DAG, not a forest — "
            "hierarchy_paths requires at most one parent per node"
        )
    # Roots: parents that never appear as children. Self-pointer,
    # distance 0 — the doubling fixpoint.
    roots = (
        e.select(F.col("anc").alias("node"))
        .distinct()
        .join(e.select("node").distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("anc"), F.lit(0).alias("d"))
    )
    state = _cut_lineage(
        e.withColumn("d", F.lit(1)).unionByName(roots), reliable
    )
    # Root keys are constant across iterations — compute once for the
    # convergence anti-join. Small relative to |nodes| in any real
    # hierarchy, but never assumed broadcastable (AQE decides).
    root_keys = _cut_lineage(state.where(F.col("node") == F.col("anc")).select("node"), reliable)

    for _ in range(max_iters):
        pending = state.join(
            root_keys.select(F.col("node").alias("anc")), "anc", "left_anti"
        ).count()
        if pending == 0:
            break
        nxt = (
            state.alias("s")
            .join(
                state.select(
                    F.col("node").alias("anc"),
                    F.col("anc").alias("anc2"),
                    F.col("d").alias("d2"),
                ).alias("j"),
                "anc",
            )
            .select(
                F.col("s.node").alias("node"),
                F.col("anc2").alias("anc"),
                (F.col("s.d") + F.col("d2")).alias("d"),
            )
        )
        state = _cut_lineage(nxt, reliable)
    else:
        raise RuntimeError(
            f"hierarchy_paths did not converge in {max_iters} doubling "
            f"iterations (depth would exceed 2^{max_iters - 1}) — the "
            "edge set almost certainly contains a CYCLE, or a parent "
            "key that resolves to a missing node"
        )
    return state.select(
        "node", F.col("anc").alias("root_key"), F.col("d").alias("depth")
    )
