"""Every registry query runs on sf0.001 and returns a stable schema.
(The full DuckDB value-parity check is tools/verify_oracle.py + the
driver's t2 gate.)"""

import pytest

from thundercats_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark_fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, name
    # deterministic: same plan, same result on re-run
    again = q.spark_fn(spark, sf_dir).limit(5).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


def test_oracle_query_output_is_scalar_only(spark, sf_dir):
    """The driver canonicalizes results via pandas sort_values, which
    cannot hash list/dict cells — an array/map/struct output column
    makes an oracle-checked query driver-red even when its values are
    exact (r04: embedding_quantize). Gate: every oracle-registered
    query must emit only atomic columns; serialize nested values
    (e.g. F.array_join) before registering."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name, q in sorted(QUERIES.items()):
        if not q.oracle:
            continue
        df = q.spark_fn(spark, sf_dir)
        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, (
        f"oracle-checked queries emit non-scalar columns the driver's "
        f"pandas canonicalizer cannot hash: {offenders}"
    )


def test_registry_names_are_wellformed():
    import re

    for name in QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_oracle_sql_mentions_known_tables_only():
    # every oracle must reference only the driver's pre-registered views
    import re

    known = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, q in QUERIES.items():
        if not q.oracle:
            continue
        froms = set(re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", q.oracle, re.I))
        unknown = {f.lower() for f in froms} - known - {"walk"}  # CTE names
        # allow CTE names defined in the same statement
        ctes = {m.lower() for m in re.findall(r"(\w+)\s+AS\s*\(", q.oracle, re.I)}
        assert unknown <= ctes, (name, unknown - ctes)
