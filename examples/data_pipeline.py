"""Example app — the reference's samples/DataPipeline.scala re-expressed
on this engine and the driver's tables: read → select → filter → trim →
join → windowed aggregate → write parquet → read back, all inside one
MayFail pipeline so the first failure short-circuits with a traceback.

Run: python examples/data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from thundercats_spark.functional.maybe import pipeline
from thundercats_spark.physical.io import Read, Screen, Write
from thundercats_spark.physical.ops import Filter, Group, Join, Transform
from thundercats_spark.preprocess.text import trim
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = tempfile.mkdtemp(prefix="tc_pipeline_")
    spark = get_spark("data-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    # STEP 1: read + clean + join (reference DataPipeline STEP #1)
    result = pipeline(
        Read.parquet(spark, f"{sf_dir}/orders.parquet"),
        lambda orders: Transform.select(
            orders, ["o_custkey", "o_orderdate", "o_totalprice", "o_orderstatus"]
        ),
        lambda orders: Filter.where(orders, F.col("o_totalprice") > 0),
        # join customer dimension (trimmed name) onto the fact
        lambda orders: Read.parquet(spark, f"{sf_dir}/customer.parquet").flat_map(
            lambda cust: trim(cust, "c_name").flat_map(
                lambda cust: Join.inner(
                    orders, cust, F.col("o_custkey") == F.col("c_custkey")
                )
            )
        ),
        lambda joined: Screen.show_df(joined, title="orders ⋈ customer"),
        # STEP 2: per-(segment, year) aggregate, then per-segment series
        lambda joined: Group.agg(
            joined.withColumn("year", F.year("o_orderdate")),
            ["c_mktsegment", "year"],
            [F.avg("o_totalprice").alias("avg_price")],
        ),
        lambda yearly: Group.agg(
            yearly,
            ["c_mktsegment"],
            [
                F.collect_list("avg_price").alias("yearly_avg_prices"),
                F.min("avg_price").alias("min_avg"),
                F.max("avg_price").alias("max_avg"),
                F.avg("avg_price").alias("mean_avg"),
            ],
        ),
        lambda series: Screen.show_df(series, title="per-segment series", hide_complex=True),
        lambda series: Write.parquet(series, f"{out_dir}/series.parquet", overwrite=True),
        # STEP 3: read back
        lambda _: Read.parquet(spark, f"{out_dir}/series.parquet"),
        lambda back: Screen.show_schema(back),
        lambda back: back.count(),
    )

    if result.is_failing:
        print("[ERROR]", result.get_error())
        sys.exit(1)
    print(f"[DONE] {result.get} segment rows written to {out_dir}/series.parquet")


if __name__ == "__main__":
    main()
