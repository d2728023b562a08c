"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given SF, compare row count, column names, and order-insensitive values.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    """pandas DataFrame → canonical sorted list of row tuples."""
    import math
    from decimal import Decimal

    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, Decimal):
                vals.append(("dec", str(v)))
            elif isinstance(v, float):
                vals.append(("f", repr(v)))
            elif hasattr(v, "isoformat"):
                vals.append(("t", v.isoformat()))
            else:
                vals.append((type(v).__name__, str(v)))
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from thundercats_spark.session import get_spark

    spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    fails, passes, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:2000]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:2000]}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            fails.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL  {name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            fails.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"FAIL  {name}: row count {len(sdf)} vs {len(odf)}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            fails.append((name, f"values differ, e.g. {diffs}"))
            print(f"FAIL  {name}: value mismatch e.g. {diffs}")
        else:
            passes.append(name)
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(passes)} ok, {len(rows_only)} rows-only, {len(fails)} FAIL")
    if fails:
        for n, m in fails:
            print(f"  FAIL {n}: {m[:300]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
