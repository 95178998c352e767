"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from kgraph_framework_spark.session import get_spark

    spark = get_spark("check-correctness", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        s_cols = df.columns
        s_rows = [tuple(r) for r in df.collect()]
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:24s} rows={len(s_rows):7d} (rows-only, no oracle) "
                  f"[{t_spark:5.1f}s]")
            if len(s_rows) == 0:
                failures.append((name, "0 rows"))
            continue
        t0 = time.monotonic()
        rel = con.sql(oracles[name])
        d_cols = rel.columns
        d_rows = rel.fetchall()
        t_duck = time.monotonic() - t0
        ok_cols = sorted(s_cols) == sorted(d_cols)
        a, b = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
        ok_vals = a == b
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(f"  {name:24s} rows={len(s_rows):7d}/{len(d_rows):7d} "
              f"cols={'ok' if ok_cols else f'{s_cols} vs {d_cols}'} "
              f"vals={'ok' if ok_vals else 'MISMATCH'} "
              f"[spark {t_spark:5.1f}s duck {t_duck:5.1f}s] {status}")
        if not (ok_cols and ok_vals):
            failures.append((name, "cols" if not ok_cols else "vals"))
            if not ok_vals and len(a) == len(b):
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"      spark={x}\n      duck ={y}")
            elif len(a) != len(b):
                sa, sb = set(a), set(b)
                print(f"      only-spark: {list(sa - sb)[:3]}")
                print(f"      only-duck : {list(sb - sa)[:3]}")

    print(f"\n{len(failures)} failures: {[f[0] for f in failures]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
