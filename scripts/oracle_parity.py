"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` in DuckDB on
the same parquet tables and compares row-count, schema (column names),
and order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from signal_collect_spark.session import get_spark

    spark = get_spark(app_name="oracle_parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(spark_rows)} rows  [{t_spark:.1f}s spark]")
            continue
        t0 = time.monotonic()
        res = con.sql(oracles[name])
        duck_cols = [c for c in res.columns]
        duck_rows = res.fetchall()
        t_duck = time.monotonic() - t0
        ok_schema = sorted(spark_cols) == sorted(duck_cols)
        a = normalize(spark_rows, spark_cols)
        b = normalize(duck_rows, duck_cols)
        ok = ok_schema and a == b
        status = "OK " if ok else "FAIL"
        print(
            f"  {name:28s} {status} rows {len(a)}/{len(b)} "
            f"[{t_spark:.1f}s spark, {t_duck:.1f}s duck]"
        )
        if not ok:
            failures.append(name)
            if not ok_schema:
                print(f"    schema: spark={spark_cols} duck={duck_cols}")
            else:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                extra_a = [x for x in a if x not in set(b)][:3]
                extra_b = [y for y in b if y not in set(a)][:3]
                print(f"    first diffs: {diffs}")
                print(f"    only-spark: {extra_a}\n    only-duck:  {extra_b}")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
