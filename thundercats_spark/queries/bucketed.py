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
) -> tuple[str, str]:
    """One-time ingest-side layout: write orders and lineitem as
    catalog tables bucketed (and sorted) on their orderkey with the
    SAME bucket count, so any orderkey equi-join between them satisfies
    both sides' required distribution from the files alone. Cost: one
    shuffle-free scan + bucketed write per table (the bucketBy writer
    hashes rows to bucket files within each task — no exchange).
    Returns the (orders, lineitem) table names."""
    t = load(spark, sf_dir, "orders", "lineitem")
    from thundercats_spark.physical.io import Bucketed

    ot, lt = f"{prefix}_orders", f"{prefix}_lineitem"
    Bucketed.write(
        t["orders"], ot, ["o_orderkey"], num_buckets, sort_cols=["o_orderkey"]
    ).get
    Bucketed.write(
        t["lineitem"], lt, ["l_orderkey"], num_buckets, sort_cols=["l_orderkey"]
    ).get
    return ot, lt


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
