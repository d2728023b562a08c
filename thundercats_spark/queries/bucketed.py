"""Bucketed fact-fact join rehearsal (SURVEY §7 candidate 1).

The one SortMergeJoin class the headline bench still pays a full
shuffle for is the fact-fact orders⋈lineitem join (q3/q10 shape). A
real deployment pre-buckets both fact tables on the join key once at
ingest, and every subsequent orderkey join plans with ZERO exchanges —
the shuffle is paid once per table lifetime, not once per query. This
module wires ``physical.io.Bucketed`` (49c) into that exact headline
shape so the zero-exchange claim is asserted on a REAL query plan, not
a toy join (tests/test_plan_health.py) and rehearsed at x10 scale
(tools/scale_check.py → scale_stats "bucketed_q3").

Not a registry entry: the driver's correctness harness runs against
parquet paths, while bucket metadata lives in the session catalog —
value parity with the unbucketed ``q3_shipping_priority`` (which IS
driver-verified) is pinned in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thundercats_spark.queries import load
from thundercats_spark.queries.tpch import _day_str, _revenue_col


def build_bucketed_facts(
    spark: SparkSession,
    sf_dir: str,
    num_buckets: int = 32,
    prefix: str = "tc_bkt",
    tables: tuple[str, ...] = ("orders", "lineitem"),
) -> tuple[str, ...]:
    """One-time ingest-side layout: write the requested fact tables as
    catalog tables bucketed (and sorted) on their orderkey with the
    SAME bucket count, so any orderkey equi-join between them satisfies
    both sides' required distribution from the files alone. Cost: one
    shuffle-free scan + bucketed write per table (the bucketBy writer
    hashes rows to bucket files within each task — no exchange).
    Returns the table names in the order requested."""
    keys = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
    unknown = set(tables) - set(keys)
    if unknown:
        raise ValueError(f"unknown fact tables: {sorted(unknown)}")
    t = load(spark, sf_dir, *tables)
    from thundercats_spark.physical.io import Bucketed

    names = []
    for tbl in tables:
        name = f"{prefix}_{tbl}"
        Bucketed.write(
            t[tbl], name, [keys[tbl]], num_buckets, sort_cols=[keys[tbl]]
        ).get
        names.append(name)
    return tuple(names)


def q3_shipping_priority_bucketed(
    spark: SparkSession, sf_dir: str, prefix: str = "tc_bkt"
) -> DataFrame:
    """The q3 headline shape over the pre-bucketed fact tables:
    customer still broadcasts (1:10 vs orders at every SF), and the
    orders⋈lineitem SortMergeJoin consumes the bucket layout — no
    Exchange anywhere in the plan (the post-join groupBy(l_orderkey,
    o_date) is satisfied by the join's orderkey partitioning, since
    orderkey ⊆ the grouping keys). Identical results to
    ``q3_shipping_priority`` (pytest-pinned)."""
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp")
    cust = (
        load(spark, sf_dir, "customer")["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    ords = (
        spark.table(f"{prefix}_orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        spark.table(f"{prefix}_lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_orderkey", _day_str("o_orderdate").alias("o_date"))
        .agg(_revenue_col())
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_date")
    )


def multi_supplier_pairs(li: DataFrame) -> DataFrame:
    """The q21-core shape on ANY lineitem frame: per-order count of
    ordered line-pairs with differing suppliers. Shared by the bucketed
    variant and its raw-parquet parity base so the pin compares
    LAYOUTS of one query, not two hand-synced copies."""
    a = li.select("l_orderkey", "l_suppkey")
    b = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
    )
    return (
        a.join(
            b,
            (a.l_orderkey == b.r_orderkey) & (a.l_suppkey != b.r_suppkey),
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_cross_supplier_pairs"))
    )


def lineitem_multi_supplier_bucketed(
    spark: SparkSession, prefix: str = "tc_bkt"
) -> DataFrame:
    """Fact-fact SELF-join variant (the q21 core): pair each lineitem
    with the other suppliers' lines of the SAME order. Both sides read
    the one bucketed lineitem table, so the SortMergeJoin consumes the
    bucket layout twice — and the per-order pair count that follows
    groups on the join key itself, so the WHOLE plan runs with zero
    hash exchanges (pytest-pinned). Unbucketed, this shape shuffles
    the fact table twice at every run; bucketed, never again."""
    return multi_supplier_pairs(spark.table(f"{prefix}_lineitem"))


def q10_returned_items_bucketed(
    spark: SparkSession, sf_dir: str, prefix: str = "tc_bkt"
) -> DataFrame:
    """The q10 headline shape over the pre-bucketed fact tables — the
    variant where the DOWNSTREAM aggregation key (c_custkey) differs
    from the bucket key: the orders⋈lineitem join is still satisfied
    from the files (no exchange), and the single hash exchange left in
    the plan is the post-join groupBy(c_custkey) — which by then
    carries only the filtered, joined, 4-column aggregate input, not
    the fact table. Identical results to ``q10_returned_items``
    (pytest-pinned)."""
    from thundercats_spark.queries.tpch import q10_filters, q10_shape

    dims = load(spark, sf_dir, "customer", "nation")
    cust = (
        dims["customer"]
        .join(
            F.broadcast(dims["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "n_name")
    )
    ords, li = q10_filters(
        spark.table(f"{prefix}_orders"), spark.table(f"{prefix}_lineitem")
    )
    return q10_shape(ords, li, cust)
