"""Data-quality expectations in the engine's errors-as-values style.

``validate(df, checks...)`` returns ``Ok(df)`` when every expectation
holds, else ``Fail`` whose error message lists EVERY violated check —
so a pipeline gate reads:

    validated = validate(df, expect_unique(["id"]), expect_non_null(["ts"]))
    result = validated.flat_map(lambda ok: Write.parquet(ok, path))

Scale: all row-level expectations compile into ONE aggregation pass
(conditional counts folded into a single ``agg``) — a 100 TB validation
costs one scan regardless of how many checks are attached. Schema and
row-count checks are metadata-only / reuse the same pass.

Extends reference physical/Util.scala's schemaMap + Filter.na family
(Op.scala:131) into declarative pipeline gates.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thundercats_spark.functional.maybe import Fail, MayFail, Ok


@dataclass
class Check:
    name: str
    # metric expressions evaluated in the shared single agg pass;
    # verdict maps the collected metric values to None (pass) or a
    # violation message.
    metrics: dict[str, Column]
    verdict: object  # Callable[[dict], str | None]


def expect_unique(keys: Sequence[str]) -> Check:
    key = ", ".join(keys)
    tag = f"unique({key})"
    return Check(
        name=tag,
        metrics={
            f"{tag}.rows": F.count(F.lit(1)),
            f"{tag}.distinct": F.count_distinct(*[F.col(k) for k in keys]),
        },
        verdict=lambda m, tag=tag: (
            None
            if m[f"{tag}.rows"] == m[f"{tag}.distinct"]
            else f"{tag}: {m[f'{tag}.rows'] - m[f'{tag}.distinct']} duplicate rows"
        ),
    )


def expect_non_null(cols: Sequence[str]) -> Check:
    tag = f"non_null({', '.join(cols)})"
    metrics = {
        f"{tag}.{c}": F.sum(F.col(c).isNull().cast("long")) for c in cols
    }
    return Check(
        name=tag,
        metrics=metrics,
        verdict=lambda m, tag=tag, cols=tuple(cols): (
            lambda bad: None
            if not bad
            else f"{tag}: nulls in " + ", ".join(f"{c}={n}" for c, n in bad)
        )([(c, m[f"{tag}.{c}"]) for c in cols if m[f"{tag}.{c}"]]),
    )


def expect_in_range(col: str, lo, hi) -> Check:
    tag = f"in_range({col}, [{lo}, {hi}])"
    return Check(
        name=tag,
        metrics={
            f"{tag}.out": F.sum(
                (~F.col(col).between(lo, hi)).cast("long")
            )
        },
        verdict=lambda m, tag=tag: (
            None
            if not m[f"{tag}.out"]
            else f"{tag}: {m[f'{tag}.out']} rows out of range"
        ),
    )


def expect_row_count_between(lo: int, hi: int | None = None) -> Check:
    tag = f"row_count_between({lo}, {hi})"
    return Check(
        name=tag,
        metrics={f"{tag}.n": F.count(F.lit(1))},
        verdict=lambda m, tag=tag, lo=lo, hi=hi: (
            None
            if m[f"{tag}.n"] >= lo and (hi is None or m[f"{tag}.n"] <= hi)
            else f"{tag}: got {m[f'{tag}.n']}"
        ),
    )


def expect_schema(expected: dict[str, str]) -> Check:
    """Metadata-only: every (column, simple-type-string) must be present
    (extra columns are allowed)."""
    return Check(name=f"schema({sorted(expected)})", metrics={}, verdict=expected)


def validate(df: DataFrame, *checks: Check) -> MayFail[DataFrame]:
    """Evaluate all checks; one aggregation job total."""
    failures: list[str] = []

    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    agg_metrics: dict[str, Column] = {}
    row_checks: list[Check] = []
    for c in checks:
        if not c.metrics:  # schema check
            for col, typ in c.verdict.items():
                if col not in actual:
                    failures.append(f"{c.name}: missing column {col}")
                elif actual[col] != typ:
                    failures.append(
                        f"{c.name}: {col} is {actual[col]}, expected {typ}"
                    )
            continue
        agg_metrics.update(c.metrics)
        row_checks.append(c)

    if agg_metrics:
        row = df.agg(*[expr.alias(k) for k, expr in agg_metrics.items()]).first()
        m = row.asDict()
        for c in row_checks:
            msg = c.verdict(m)
            if msg:
                failures.append(msg)

    if failures:
        return Fail(ValueError("; ".join(failures)))
    return Ok(df)
