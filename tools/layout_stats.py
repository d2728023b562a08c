"""Layout rehearsal: measure the z-order pruning fractions that
PERF_NOTES.md quotes, from real parquet footers, and merge them into
tools/scale_stats.json (which bench.py inlines into the round's BENCH
record).

The comparison writes the SAME 200k-row 2-D uniform frame three ways
(unsorted, linear-sorted on `a`, z-ordered on `a,b`; 64 files each)
and judges three 10%-box predicates purely from row-group min/max
stats via the distributed scan_pruning_report. The fractions are
layout geometry — they do not move with corpus size, so one size
suffices (unlike the dedup candidate-bound rehearsals next door).

Usage: python tools/layout_stats.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thundercats_spark.physical.layout import (  # noqa: E402
    pruning_summary,
    scan_pruning_report,
    write_parquet_zorder,
)
from thundercats_spark.session import get_spark  # noqa: E402

STATS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_stats.json")


def main() -> None:
    spark = get_spark("layout-stats", shuffle_partitions=32)
    n, n_files = 200_000, 64
    df = (
        spark.range(n)
        .withColumn("a", (F.xxhash64("id", F.lit(7)) % 10_000 + 10_000) % 10_000)
        .withColumn("b", (F.xxhash64("id", F.lit(8)) % 10_000 + 10_000) % 10_000)
        .withColumn("payload", F.col("id") * 3)
        .cache()
    )
    df.count()
    d = tempfile.mkdtemp(prefix="layout_stats_")
    try:
        df.repartition(n_files).write.parquet(d + "/plain")
        df.repartitionByRange(n_files, "a").sortWithinPartitions("a").write.parquet(
            d + "/linear"
        )
        write_parquet_zorder(df, d + "/z", ["a", "b"], n_buckets=64, n_files=n_files)
        boxes = {
            "b10pct": {"b": (1000, 1999)},
            "a10pct": {"a": (1000, 1999)},
            "ab_box": {"a": (1000, 1999), "b": (1000, 1999)},
        }
        out: dict = {"rows": n, "files": n_files}
        for layout in ("plain", "linear", "z"):
            for label, box in boxes.items():
                s = pruning_summary(
                    scan_pruning_report(spark, f"{d}/{layout}", box)
                )
                out[f"{layout}_{label}_rg_skip"] = round(
                    s["row_group_skip_fraction"], 3
                )
        print(json.dumps(out, indent=2))
        stats = json.load(open(STATS)) if os.path.exists(STATS) else {}
        stats["zorder_pruning"] = out
        with open(STATS, "w") as f:
            json.dump(stats, f, indent=2, sort_keys=True)
        print(f"merged into {STATS}")
    finally:
        df.unpersist()
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
