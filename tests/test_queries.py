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
