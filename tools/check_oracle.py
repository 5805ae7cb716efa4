"""Driver-sim comparator: run every __spark_entry__.queries() entry on
Spark and its oracle_sql() pair on DuckDB over the same sf dir, compare
rows / schema / values (the same canonicalization the round driver uses:
sort columns by name, sort rows, stringify), and report per-entry wall
time so the slowest entries can be attacked.

    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] \
        [--json out.json] [entry ...]

With --json the results land as a committable artifact (the fallback
correctness evidence when the round driver's own CORRECTNESS_r{N}.json
fails to materialize, VERDICT r2 item 1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("entries", nargs="*", help="subset of entry names")
    args = ap.parse_args()

    from apt_search_engine_spark.session import get_spark

    spark = get_spark("oracle-check")
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    qs = entry.queries()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    names = args.entries or list(qs)
    results: dict[str, dict] = {}
    n_fail = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, args.sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            results[name] = {
                "rows": len(sdf), "oracle": False, "spark_sec": round(t_spark, 2),
            }
            print(f"{name}: NO-ORACLE rows={len(sdf)} [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        odf = con.execute(oracles[name]).fetchdf()
        t_duck = time.time() - t0
        s, o = canon(sdf), canon(odf)
        ok_rows = len(s) == len(o)
        ok_schema = list(s.columns) == list(o.columns)
        ok_vals = ok_rows and ok_schema and s.astype(str).equals(o.astype(str))
        results[name] = {
            "rows": ok_rows, "schema": ok_schema, "vals": ok_vals,
            "n_spark": len(s), "n_oracle": len(o),
            "spark_sec": round(t_spark, 2), "duckdb_sec": round(t_duck, 2),
        }
        if not ok_vals:
            n_fail += 1
        print(
            f"{name}: rows={ok_rows} ({len(s)}/{len(o)}) schema={ok_schema} "
            f"vals={ok_vals} [spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
        )
        if not ok_vals and len(s) and len(o):
            print("SPARK:\n", s.head(8))
            print("ORACLE:\n", o.head(8))
    total = time.time() - t_all
    print(f"== {len(names) - n_fail}/{len(names)} pass, wall {total:.0f}s")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"sf_dir": args.sf_dir, "wall_sec": round(total, 1),
                 "n_pass": len(names) - n_fail, "n_total": len(names),
                 "entries": results},
                f, indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
