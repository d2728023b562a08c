"""Relational operators — Join / Group / Filter / Order / F_ / Agg / Optimise.

Re-expression of reference physical/Op.scala. Key Spark-first departures:

- ``Join.broadcast``: the reference hand-rolls a collected-map +
  mapPartitions hash join over RDD rows (Op.scala:42-97). That caps the
  build side at driver memory, loses codegen, and serializes through
  Python at our layer. We instead emit a ``broadcast()`` hint and let
  Spark plan a BroadcastHashJoin — same semantics (left join keeping
  selected right columns), JVM-side, AQE-aware.
- ``Agg.on`` / ``Agg.byKeyAsRDD``: the reference drops to RDD
  ``reduce``/``reduceByKey`` (Op.scala:164-172) for "shuffle-less"
  aggregation. DataFrame aggregations already do map-side partial
  aggregation in Tungsten; we express both as declarative aggs and keep
  whole-stage codegen. ``Agg.reduce`` accepts either a named builtin or
  an arbitrary binary Column function applied via ``F.reduce``-style
  tree aggregation on an array — but the hot path is builtins.
- Everything returns MayFail for pipeline composition; ``*_df`` variants
  return bare DataFrames.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from thundercats_spark.functional.maybe import MayFail

JoinOn = Sequence[str] | Column


class Join:
    """Joins. ``on`` is a list of column names (reference ``Join.On``) or
    a Column expression (reference ``Join.With``, Op.scala:25-26)."""

    @staticmethod
    def _join_df(df1: DataFrame, df2: DataFrame, on: JoinOn, how: str) -> DataFrame:
        on_arg = list(on) if not isinstance(on, Column) else on
        return df1.join(df2, on_arg, how)

    @staticmethod
    def left(df1, df2, on: JoinOn) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Join._join_df(df1, df2, on, "left"))

    @staticmethod
    def inner(df1, df2, on: JoinOn) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Join._join_df(df1, df2, on, "inner"))

    @staticmethod
    def outer(df1, df2, on: JoinOn) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Join._join_df(df1, df2, on, "outer"))

    @staticmethod
    def semi(df1, df2, on: JoinOn) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Join._join_df(df1, df2, on, "left_semi"))

    @staticmethod
    def anti(df1, df2, on: JoinOn) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Join._join_df(df1, df2, on, "left_anti"))

    @staticmethod
    def cross(df1, df2) -> MayFail[DataFrame]:
        """Explicit cartesian product. Legitimate only when one side is
        tiny (scalar/config frames) — broadcast it so the plan is a
        BroadcastNestedLoopJoin, never a shuffled CartesianProduct."""
        return MayFail.of(lambda: df1.crossJoin(df2))

    @staticmethod
    def broadcast_df(
        df_big: DataFrame,
        df_tiny: DataFrame,
        on: Sequence[str],
        right_columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """Broadcast the small side, left-join keeping ``right_columns``
        (reference Op.scala:42). One left row may match many right rows,
        exactly like the reference's flatMap join. Planned as a
        BroadcastHashJoin — verify with ``.explain``."""
        keep = list(dict.fromkeys([*on, *(right_columns or df_tiny.columns)]))
        right = df_tiny.select(*keep)
        joined = df_big.join(F.broadcast(right), list(on), "inner")
        return joined

    @staticmethod
    def broadcast(df_big, df_tiny, on, right_columns=None) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Join.broadcast_df(df_big, df_tiny, on, right_columns))


class Group:
    """Grouped aggregation (reference Op.scala:101-123)."""

    @staticmethod
    def agg_map_df(
        df: DataFrame, by: Sequence[str | Column], m: dict[str, str]
    ) -> DataFrame:
        """Reference ``Group.Map`` strategy: {column -> funcName}."""
        return df.groupBy(*by).agg(m)

    @staticmethod
    def agg_df(df: DataFrame, by: Sequence[str | Column], aggs: Sequence[Column]) -> DataFrame:
        """Reference ``Group.Agg`` strategy: explicit agg Columns."""
        return df.groupBy(*by).agg(*aggs)

    @staticmethod
    def agg_map(df, by, m) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Group.agg_map_df(df, by, m))

    @staticmethod
    def agg(df, by, aggs) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Group.agg_df(df, by, aggs))

    @staticmethod
    def pivot_df(
        df: DataFrame,
        by: Sequence[str],
        pivot_col: str,
        agg: Column,
        values: Sequence[str] | None = None,
    ) -> DataFrame:
        """Pivot with explicit ``values`` when known — skips the extra
        distinct-scan job, which matters on wide data."""
        g = df.groupBy(*by)
        p = g.pivot(pivot_col, list(values)) if values else g.pivot(pivot_col)
        return p.agg(agg)

    @staticmethod
    def pivot(df, by, pivot_col, agg, values=None) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Group.pivot_df(df, by, pivot_col, agg, values))


class Filter:
    """Row filters (reference Op.scala:125-143). All push down to the scan."""

    @staticmethod
    def where(df: DataFrame, cond: Column) -> MayFail[DataFrame]:
        return MayFail.of(lambda: df.filter(cond))

    @staticmethod
    def na_df(df: DataFrame, cols: Sequence[str]) -> DataFrame:
        # Drop rows where ANY of the cols is null (reference Filter.na).
        return df.na.drop(how="any", subset=list(cols))

    @staticmethod
    def na(df, cols) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Filter.na_df(df, cols))

    @staticmethod
    def by_range_df(df: DataFrame, column: str, bound: tuple) -> DataFrame:
        lb, ub = bound
        return df.where((F.col(column) >= lb) & (F.col(column) <= ub))

    @staticmethod
    def by_range(df, column, bound) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Filter.by_range_df(df, column, bound))


class Order:
    @staticmethod
    def by(df: DataFrame, cols: Sequence[str | Column], ascending: bool = True) -> MayFail[DataFrame]:
        """Global sort (reference Op.scala:145). NOTE: a full sort is a
        range-partitioned shuffle — at 100 TB prefer ``sort_within`` or a
        top-k (``orderBy().limit(k)`` which Spark plans as TakeOrdered,
        no global sort)."""
        return MayFail.of(lambda: df.orderBy(*cols, ascending=ascending))

    @staticmethod
    def sort_within(df: DataFrame, cols: Sequence[str | Column]) -> MayFail[DataFrame]:
        """Per-partition sort — no shuffle; the scale-safe variant."""
        return MayFail.of(lambda: df.sortWithinPartitions(*cols))


class F_:
    """Column-level helpers (reference Op.scala:151-157)."""

    @staticmethod
    def add_col(df: DataFrame, col_name: str, c: Column) -> MayFail[DataFrame]:
        return MayFail.of(lambda: df.withColumn(col_name, c))

    @staticmethod
    def add_cols(df: DataFrame, cols: dict[str, Column]) -> MayFail[DataFrame]:
        # Single projection for many columns — avoids N analysis passes.
        return MayFail.of(lambda: df.withColumns(cols))

    @staticmethod
    def lift(df: DataFrame) -> MayFail[DataFrame]:
        return MayFail.of(lambda: df)


_BUILTIN_REDUCERS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
    "product": lambda c: F.exp(F.sum(F.log(F.col(c)))),  # positive values
}


class Agg:
    """Whole-column / by-key reduction (reference Op.scala:159-173).

    The reference's RDD reduce loses Tungsten; both forms here stay
    declarative so Catalyst plans partial aggregation (map-side combine)
    before the exchange."""

    @staticmethod
    def reduce(df: DataFrame, column: str, how: str = "sum"):
        """Scalar reduction of one column → MayFail[python value]."""

        def run():
            return df.agg(_BUILTIN_REDUCERS[how](column).alias("r")).collect()[0]["r"]

        return MayFail.of(run)

    @staticmethod
    def by_key_df(df: DataFrame, key: str, column: str, how: str = "sum") -> DataFrame:
        return df.groupBy(key).agg(_BUILTIN_REDUCERS[how](column).alias(column))

    @staticmethod
    def by_key(df, key, column, how="sum") -> MayFail[DataFrame]:
        return MayFail.of(lambda: Agg.by_key_df(df, key, column, how))


class Optimise:
    """Lineage/physical-layout optimisers (reference Op.scala:175-203)."""

    @staticmethod
    def snapshot(df: DataFrame, temp_dir: str, spark: SparkSession | None = None) -> MayFail[DataFrame]:
        """Cut lineage by round-tripping through parquet. At scale this is
        the checkpoint for iterative jobs whose plans grow unboundedly."""
        import uuid

        s = spark or df.sparkSession
        path = f"{temp_dir}/{uuid.uuid4()}.parquet"

        def run():
            df.write.parquet(path)
            return s.read.parquet(path)

        return MayFail.of(run)

    @staticmethod
    def materialise(df: DataFrame) -> MayFail[DataFrame]:
        def run():
            df.cache()
            df.count()
            return df

        return MayFail.of(run)

    @staticmethod
    def repar(df: DataFrame, num: int | None = None, cols: Sequence[str | Column] | None = None) -> MayFail[DataFrame]:
        def run():
            if cols:
                return df.repartition(*cols) if num is None else df.repartition(num, *cols)
            if num is not None and num <= 1:
                return df.coalesce(1)
            return df.repartition(num)

        return MayFail.of(run)


class Transform:
    """Escape hatch + projection helpers (reference IO.scala:341-356)."""

    @staticmethod
    def apply(df: DataFrame, f: Callable[[DataFrame], DataFrame]) -> MayFail[DataFrame]:
        return MayFail.of(lambda: f(df))

    @staticmethod
    def select(df: DataFrame, cols: Sequence[str]) -> MayFail[DataFrame]:
        return MayFail.of(lambda: df.select(*cols))

    @staticmethod
    def rename(df: DataFrame, mapping: dict[str, str]) -> MayFail[DataFrame]:
        return MayFail.of(lambda: df.withColumnsRenamed(mapping))


def reduce_rdd(df: DataFrame, column: str, f: Callable):
    """Escape hatch with exact reference semantics (Op.scala:164
    ``Agg.on``): arbitrary Python binary reducer over one column via
    RDD tree-reduce. Slow path — prefer ``Agg.reduce`` (declarative,
    codegen) whenever the reducer is a named aggregate."""
    return MayFail.of(lambda: df.select(column).rdd.map(lambda r: r[0]).treeReduce(f))
