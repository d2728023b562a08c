"""Connected components over a pair-edge DataFrame — the exact
transitive closure for dedup grouping (the greedy min-id rule in
operators/dedup.py is its one-pass approximation).

Algorithm: alternating min-label propagation. Each iteration joins the
current labels to the edge list and takes the min label over each
node's neighborhood (including itself), until no label changes. This is
the standard DataFrame formulation (large-star/small-star's simple
cousin); convergence is O(graph diameter) iterations — near-dup
clusters are small and dense, so it converges in a handful of rounds.

Scale notes: each iteration is one shuffle (groupBy node). Lineage is
cut by checkpointing every iteration so the plan doesn't grow
unboundedly (the classic iterative-Spark trap). Early exit via a cheap
count of changed labels. Two checkpoint modes:

- ``reliable=False`` (default): ``localCheckpoint`` — executor
  memory/disk, fastest, but pinned to live executors and lost on
  failure. Right for minutes-long jobs.
- ``reliable=True``: ``checkpoint()`` to the SparkContext checkpoint
  dir (set one with ``spark.sparkContext.setCheckpointDir`` — HDFS/S3
  on a cluster), which survives executor loss; hours-long 100 TB dedup
  runs should use this so a lost executor doesn't restart the whole
  iteration chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut_lineage(df: DataFrame, reliable: bool) -> DataFrame:
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint_every: int = 3,
    reliable: bool = False,
) -> DataFrame:
    """→ (id, component) where component = min node id in the
    component. Nodes = every id appearing in ``edges``. Set
    ``reliable=True`` for fault-tolerant checkpoints (requires
    ``setCheckpointDir``); see module docstring."""
    sym = _cut_lineage(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        # materialize ONCE: the edge list feeds every iteration and every
        # convergence check — without this the upstream plan (often an
        # expensive pair-mining job) re-executes per iteration.
        reliable,
    )
    labels = _cut_lineage(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id")),
        reliable,
    )
    for i in range(max_iter):
        neigh = sym.join(labels, sym.b == labels.id).select(
            F.col("a").alias("id"),
            F.col("component"),
            F.lit(None).cast(labels.schema["component"].dataType).alias("__old"),
        )
        # Carry each node's previous label through the same groupBy
        # (exactly one self row per id → max(__old) recovers it), so the
        # convergence probe below is a filter over the checkpointed
        # result — no extra join, no extra shuffle.
        new_labels = (
            labels.select("id", "component", F.col("component").alias("__old"))
            .unionByName(neigh)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.max("__old").alias("__old"),
            )
        )
        # Pointer-halving (label-of-label): follow each node's label to
        # that NODE's label. Labels only decrease and every label is a
        # node id, so this contracts chains geometrically — convergence
        # becomes O(log diameter) rounds instead of O(diameter), which
        # is what makes long duplicate CHAINS (A~B~C~...) safe: plain
        # min-propagation moves one hop per round and silently returns
        # wrong labels once max_iter is hit.
        hop = new_labels.select(
            F.col("id").alias("component"), F.col("component").alias("__c2")
        )
        new_labels = new_labels.join(hop, "component").select(
            "id", F.col("__c2").alias("component"), "__old"
        )
        # checkpoint every round: the convergence check + next iteration
        # both consume new_labels, and the iteration plan would otherwise
        # deepen geometrically. (checkpoint_every kept for API compat.)
        _ = checkpoint_every
        new_labels = _cut_lineage(new_labels, reliable)
        changed = (
            new_labels.where(F.col("component") != F.col("__old")).limit(1).count()
        )
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (graph diameter exceeds 2^max_iter)"
        )
    return labels


def dedup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    reliable: bool = False,
) -> DataFrame:
    """Exact-transitive dedup: collapse every connected component of
    near-duplicate ``pairs`` to its min-id representative. Rows not in
    any pair survive untouched. Adds ``group_id``/``group_size``."""
    comp = connected_components(pairs, "id_a", "id_b", reliable=reliable)
    comp = comp.withColumnRenamed("id", id_col)
    sized = comp.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    comp = comp.join(sized, "component")
    labeled = df.join(comp, id_col, "left").select(
        df["*"],
        F.coalesce(F.col("component"), F.col(id_col)).alias("group_id"),
        F.coalesce(F.col("group_size"), F.lit(1)).alias("group_size"),
    )
    return labeled.where(F.col(id_col) == F.col("group_id"))
