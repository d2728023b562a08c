"""Per-stage profile of one registry query: run it warm under a
UI-enabled session, then read stage metrics back through the Spark REST
API. Points at WHERE the seconds go (stage name, task time, shuffle
bytes, task count) — the empirical half of guide §1.1 without the
interactive UI.

Usage: python tools/profile_query.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from thundercats_spark.queries import all_queries
    from thundercats_spark.session import get_spark

    spark = get_spark(
        "profile-query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    sc = spark.sparkContext

    registry["q1_pricing_summary"].spark_fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    app_id = sc.applicationId
    base = f"http://localhost:4047/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    for name in names:
        # warmup
        df = registry[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        t0 = time.time()
        df = registry[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for st in rest("/stages?status=complete"):
            if st["stageId"] not in stage_ids:
                continue
            dur = (st.get("executorRunTime") or 0) / 1000.0
            cpu = (st.get("executorCpuTime") or 0) / 1e9
            rows.append((
                dur,
                st["stageId"],
                st["numCompleteTasks"],
                cpu,
                (st.get("inputBytes") or 0) / 1e6,
                (st.get("shuffleReadBytes") or 0) / 1e6,
                (st.get("shuffleWriteBytes") or 0) / 1e6,
                (st.get("name") or "").split("\n")[0][:70],
            ))
        rows.sort(reverse=True)
        print(f"{'taskSec':>8} {'stage':>5} {'tasks':>5} {'cpuSec':>7} "
              f"{'inMB':>7} {'shrMB':>7} {'shwMB':>7}  name")
        for dur, sid, nt, cpu, inb, shr, shw, nm in rows:
            print(f"{dur:8.2f} {sid:5d} {nt:5d} {cpu:7.2f} {inb:7.1f} "
                  f"{shr:7.1f} {shw:7.1f}  {nm}")
        # wall not covered by task time = scheduling/driver/plan overhead
        tot = sum(r[0] for r in rows)
        print(f"sum taskSec {tot:.2f} over {wall:.2f}s wall "
              f"(x{max(1, int(os.environ.get('SPARK_GRAFT_CPUS', '32')))} cores)")


if __name__ == "__main__":
    main()
