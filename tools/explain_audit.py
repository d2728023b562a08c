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

import sys

sys.path.insert(0, ".")


from thundercats_spark.plans import audit_df  # noqa: E402


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

    from thundercats_spark.queries import all_queries

    header = f"{'query':34s} bhj smj shj bnlj cart exch scans pushed py_eval"
    print(header)
    print("-" * len(header))
    worst: list[str] = []
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            a = audit_df(q.spark_fn(spark, sf_dir))
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
