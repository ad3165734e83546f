"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, comparing
row count, column names, and an order-insensitive value hash
(values normalized: floats rounded via repr, timestamps → isoformat).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tools._normalize import norm as _norm  # noqa: E402
from tools._normalize import value_hash  # noqa: E402


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from sandbox_data_pipeline_spark.catalog import TABLES
    from sandbox_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracle = queries(), oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(get_spark(), sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            continue
        if name not in oracle:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracle[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        elif value_hash(scols, srows) != value_hash(dcols, drows):
            problems.append("value-hash mismatch")
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(_norm(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted("|".join(_norm(r[i]) for i in dorder) for r in drows)
                sonly = [x for x in sset if x not in set(dset)][:3]
                donly = [x for x in dset if x not in set(sset)][:3]
                for x in sonly:
                    print(f"        spark-only: {x[:200]}")
                for x in donly:
                    print(f"        duck-only:  {x[:200]}")
        else:
            print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
