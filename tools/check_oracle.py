"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, comparing
row count, column names, and an order-insensitive value hash
(values normalized: floats rounded via repr, timestamps → isoformat).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

sys.path.insert(0, ".")


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


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
