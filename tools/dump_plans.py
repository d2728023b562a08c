"""Dump ``explain("formatted")`` for named registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query (e.g. suffix
``before`` / ``after`` for the optimization-round plan evidence).
Queries whose spark_fn executes eagerly (streaming drives, operators
with internal collects) still produce the plan of the RETURNED frame —
for those the interesting passes are the internal jobs, noted in
OPTIMIZATION notes rather than the final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from thundercats_spark.queries import all_queries
    from thundercats_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        try:
            df = registry[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - keep dumping the rest
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"query: {name}\nsf_dir: {sf_dir}\nmode: explain formatted\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
