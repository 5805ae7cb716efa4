"""spark-submit entrypoint: run any cataloged operator over a table dir.

    spark-submit --py-files aptse.zip apt_search_engine_spark/jobs/run_op.py \
        --op dedup_exact --sf-dir /data/tables --out /data/result \
        [--show 20] [--list]

Every operator in the engine's catalog (extras/docops.SPARK_QUERIES —
the same entries the driver's correctness gate verifies against DuckDB)
becomes deployable from the CLI: `--op <name>` runs it over the parquet
tables under --sf-dir (documents.parquet, events.parquet, lineitem.parquet,
... — the TESTDATA.md layout) and writes the result parquet to --out
(or prints --show rows for a dry look). `--list` prints the catalog.

This is deliberately thin: the operator library is the API; this job
only binds it to spark-submit so a cluster user can run e.g. a
winnowing-fingerprint pass or a TPC-H-shaped rollup without writing a
driver script.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import argparse
import json
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--op", default=None, help="operator name (see --list)")
    p.add_argument("--sf-dir", default=None,
                   help="dir holding the input parquet tables")
    p.add_argument("--out", default=None,
                   help="write the result parquet here")
    p.add_argument("--show", type=int, default=0,
                   help="print N result rows instead of / besides writing")
    p.add_argument("--list", action="store_true",
                   help="print the operator catalog and exit")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from apt_search_engine_spark.extras.docops import SPARK_QUERIES

    if args.list:
        for name in sorted(SPARK_QUERIES):
            print(name)
        return 0
    if not args.op or not args.sf_dir:
        print("--op and --sf-dir are required (or --list)", file=sys.stderr)
        return 2
    if args.op not in SPARK_QUERIES:
        print(f"unknown op {args.op!r}; try --list", file=sys.stderr)
        return 2
    if not args.out and not args.show:
        print("nothing to do: pass --out and/or --show", file=sys.stderr)
        return 2

    from apt_search_engine_spark.session import get_spark

    spark = get_spark(f"aptse-op-{args.op}")
    t0 = time.time()
    df = SPARK_QUERIES[args.op](spark, args.sf_dir)
    n = None
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    if args.show:
        df.show(args.show, truncate=80)
    stats = {
        "op": args.op,
        "sf_dir": args.sf_dir,
        "out": args.out,
        "rows_written": n,
        "wall_sec": round(time.time() - t0, 3),
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
