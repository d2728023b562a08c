"""Example app — the reference's samples/ClassificationPipeline.scala
re-expressed on this engine and the driver's tables: build a labeled
training set with relational ops, train presets via ModelDesign,
compare features, validate with CV, and report measures.

Task on the test data: predict whether an order is high-priority
(URGENT/HIGH) from price, item stats, and customer balance.

Run: python examples/classification_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from thundercats_spark.ml import AssemblyFeature, Feature, SupervisedModelDesign
from thundercats_spark.ml import preset
from thundercats_spark.ml.compare import ModelCompare
from thundercats_spark.ml.measure import AUC, FMeasure
from thundercats_spark.ml.validation import SplitValidation
from thundercats_spark.physical.io import Read, Screen
from thundercats_spark.physical.ops import Group, Join
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("classification-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    # STEP 1: assemble the labeled training frame (monadic relational ops)
    frame = (
        Read.parquet(spark, f"{sf_dir}/orders.parquet")
        .flat_map(
            lambda orders: Read.parquet(spark, f"{sf_dir}/lineitem.parquet").flat_map(
                lambda li: Group.agg(
                    li,
                    ["l_orderkey"],
                    [
                        F.sum("l_quantity").alias("total_qty"),
                        F.avg("l_discount").alias("avg_disc"),
                        F.count(F.lit(1)).alias("n_lines"),
                    ],
                ).flat_map(
                    lambda per_order: Join.inner(
                        orders, per_order, F.col("o_orderkey") == F.col("l_orderkey")
                    )
                )
            )
        )
        .flat_map(
            lambda joined: Read.parquet(spark, f"{sf_dir}/customer.parquet").flat_map(
                lambda cust: Join.broadcast(
                    joined,
                    cust.withColumnRenamed("c_custkey", "o_custkey"),
                    on=["o_custkey"],
                    right_columns=["c_acctbal"],
                )
            )
        )
        .map(
            lambda df: df.select(
                "o_totalprice",
                "total_qty",
                "avg_disc",
                "n_lines",
                "c_acctbal",
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("double").alias("label"),
            )
        )
    )
    if frame.is_failing:
        print("[ERROR]", frame.get_error())
        sys.exit(1)
    df = frame.get.cache()
    Screen.show_df(df, title="Training frame")

    # STEP 2: compare model designs on the same feature set
    feat = AssemblyFeature(
        ["o_totalprice", "total_qty", "avg_disc", "n_lines", "c_acctbal"], "features"
    )
    designs = [
        SupervisedModelDesign(
            output_col="pred", label_col="label",
            estimator=preset.logistic_reg(Feature("features"), "label", "pred"),
        ),
        SupervisedModelDesign(
            output_col="pred", label_col="label",
            estimator=preset.decision_tree(Feature("features"), "label", "pred"),
        ),
        SupervisedModelDesign(
            output_col="pred", label_col="label",
            estimator=preset.random_forest(Feature("features"), "label", "pred"),
        ),
    ]
    best = ModelCompare(AUC).best_of(designs, feat, df)
    if best.is_failing:
        print("[ERROR]", best.get_error())
        sys.exit(1)
    score, design = best.get
    print(f"best design: {type(design.estimator.getStages()[-1]).__name__}  AUC={score:.4f}")

    # STEP 3: hold-out validation + threshold curve of the winner
    holdout_auc = SplitValidation(AUC, train_ratio=0.7).run(df, design, feat)
    print(f"holdout AUC: {holdout_auc.get_or_else(float('nan')):.4f}")
    specimen = design.to_specimen(feat, df)
    f1_curve = specimen.threshold_scores(df, FMeasure).get
    best_t = max(f1_curve, key=lambda t: f1_curve[t])
    print(f"best F1 threshold: {best_t:.4f} -> F1={f1_curve[best_t]:.4f}")
    print("[DONE]")


if __name__ == "__main__":
    main()
