"""Physical-plan introspection: the metrics that decide whether a plan
survives a 100× scale-up, as a library API (tools/explain_audit.py is
the CLI over the query registry; tests/test_plan_health.py pins the
invariants).

- join strategies: broadcast-hash is the win for dim joins; sort-merge
  is correct for fact-fact; cartesian is almost always a bug;
  broadcast-nested-loop is legitimate ONLY for 1-row scalar frames.
- exchanges: every one is a full shuffle of its input.
- pushed_scans: scans whose filters reached the parquet reader.
- py_eval: operators where rows cross into Python — keep out of hot
  paths except designed Arrow kernels.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def audit_plan(plan: str) -> dict[str, int]:
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "scans": plan.count("Scan parquet"),
        "pushed_scans": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "py_eval": sum(plan.count(t) for t in _PY_MARKERS),
    }


def audit_df(df: DataFrame) -> dict[str, int]:
    """Audit a DataFrame's formatted physical plan (no execution)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return audit_plan(df._jdf.queryExecution().explainString(mode))
