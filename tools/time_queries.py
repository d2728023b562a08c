"""Time named registry queries with bench.py's exact methodology
(local[$SPARK_GRAFT_CPUS], warm-up + median-of-3, noop sink) without
paying for the whole 94-query bench between optimization iterations.

Usage: python tools/time_queries.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from thundercats_spark.queries import all_queries
    from thundercats_spark.session import get_spark

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # same JVM/footer warmup as bench.py
    registry["q1_pricing_summary"].spark_fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    def run_once(name: str) -> float:
        t0 = time.time()
        df = registry[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        run_once(name)  # warmup
        samples = sorted(run_once(name) for _ in range(reps))
        out[name] = round(samples[len(samples) // 2], 3)
        print(f"{out[name]:8.3f}  {name}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
