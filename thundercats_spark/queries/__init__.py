"""Query registry: every implemented operator/query from SURVEY.md §2
registers a (spark_fn, oracle_sql) pair here. ``spark_fn(spark, sf_dir)
-> DataFrame``; ``oracle_sql`` is ANSI SQL DuckDB runs on the same
parquet (views pre-registered by the driver), or None for ops that SQL
can't express (driver then does a rows-only check)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Read driver tables. ``events.ts`` is parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects — read it as nanos long
    (legacy flag) and convert to a microsecond timestamp (``div 1000``:
    integer division, no float rounding)."""
    out = {}
    for t in tables:
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events":
            from pyspark.sql import functions as F
            from pyspark.sql.types import LongType

            if isinstance(df.schema["ts"].dataType, LongType):
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[t] = df
    return out


def all_queries() -> dict[str, Query]:
    # Import side-effect populates the registry.
    from thundercats_spark.queries import (  # noqa: F401
        analytics,
        analytics2,
        llm_ops,
        relational,
        tpch,
        tpch2,
    )

    return dict(_REGISTRY)
