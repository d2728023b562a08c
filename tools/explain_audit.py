"""Plan audit: physical-plan health metrics for every registry query.

For each query builds the DataFrame (no execution) and reports join
strategies, exchange (shuffle) count, and scan pushdown — the numbers
that decide whether a plan survives a 100× scale-up. Run after adding
or changing a query:

    python tools/explain_audit.py [sf_dir] [query ...]

Flags worth chasing: BNLJ > 0 on anything but a tiny/literal side;
scans with no PushedFilters where the query filters scan columns;
exchange counts far above the number of logical joins+aggs.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def audit(plan: str) -> dict:
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "scans": plan.count("Scan parquet"),
        "pushed_scans": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        # Python-boundary operators: rows leave the JVM here. Should be 0
        # except for Arrow-kernel operators (minhash/simhash/ivf/multimodal).
        "py_eval": sum(
            plan.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    from thundercats_spark.queries import all_queries

    header = f"{'query':34s} bhj smj shj bnlj cart exch scans pushed py_eval"
    print(header)
    print("-" * len(header))
    worst: list[str] = []
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = q.spark_fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            a = audit(qe.explainString(mode))
        except Exception as exc:  # noqa: BLE001 - audit must cover all queries
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}")
            continue
        print(
            f"{name:34s} {a['bhj']:3d} {a['smj']:3d} {a['shj']:3d} {a['bnlj']:4d} "
            f"{a['cartesian']:4d} {a['exchanges']:4d} {a['scans']:5d} "
            f"{a['pushed_scans']:6d} {a['py_eval']:7d}"
        )
        if a["cartesian"] or (a["bnlj"] and "bruteforce" not in name and "cosine" not in name):
            worst.append(name)
    if worst:
        print(
            f"\nALERT cartesian/BNLJ (fine if it is a 1-row scalar broadcast "
            f"— threshold/avg cross joins): {', '.join(worst)}"
        )


if __name__ == "__main__":
    main()
