"""Generate the all-queries correctness artifact (CORRECTNESS_FULL_r{N}.json)
by running every queries() entry against its DuckDB oracle via
tools/check_oracle.py's strict comparator, at one scale factor.

Usage: python tools/full_correctness.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dask_mwu_spark.session import get_spark  # noqa: E402
from tools.check_oracle import TABLES, compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_FULL.json"
    spark = get_spark("full-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    per_query: dict[str, dict] = {}
    rows_only: list[str] = []
    failures: list[str] = []
    n_exact = 0
    for name, fn in queries.items():
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"spark: {e}"
            failures.append(name)
            per_query[name] = rec
            print(f"FAIL {name}: spark error")
            continue
        if name not in oracles:
            rec["status"] = "rows_only"
            rows_only.append(name)
            per_query[name] = rec
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"duckdb: {e}"
            failures.append(name)
            per_query[name] = rec
            print(f"FAIL {name}: duckdb error")
            continue
        problems = compare(name, sdf, ddf)
        rec["oracle_rows"] = len(ddf)
        rec["elapsed_s"] = round(time.time() - t0, 2)
        if problems:
            rec["status"] = "FAIL"
            rec["problems"] = problems
            failures.append(name)
            print(f"FAIL {name}: {problems[0]}")
        else:
            rec["status"] = "exact"
            n_exact += 1
            print(f"ok   {name}: exact ({len(sdf)} rows)")
        per_query[name] = rec
    spark.stop()
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    artifact = {
        "sf": float(sf),
        "checker": "tools/check_oracle.py (stricter than driver: exact equality)",
        "total": len(queries),
        "exact": n_exact,
        "rows_only": rows_only,
        "failures": failures,
        "queries": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}: {n_exact}/{len(queries)} exact, "
          f"{len(rows_only)} rows-only, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
