"""spark-submit entrypoint: tombstone or purge documents in a disk index.

    spark-submit --py-files aptse.zip apt_search_engine_spark/jobs/delete.py \
        --index-dir /data/index --doc-ids id1 id2 ...          # tombstone
    spark-submit ... delete.py --index-dir /data/index \
        --doc-ids-path /data/dead_ids.parquet                  # bulk
    spark-submit ... delete.py --index-dir /data/index --purge # maintenance

Deletion semantics (indexing/deletes.py): tombstoned docs vanish from
every query path immediately; corpus statistics stay pre-delete until
--purge rewrites the index (Lucene delete-before-merge). Prints one JSON
line: {"deleted_total": N} or {"purged": N}.
"""

from __future__ import annotations

import os
import sys

# spark-submit / direct-path invocation puts THIS directory on sys.path,
# not the repo root — bootstrap the package like every entry script must
# when run without --py-files packaging
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index-dir", required=True)
    p.add_argument("--doc-ids", nargs="*", default=None,
                   help="doc_id strings to tombstone")
    p.add_argument("--doc-ids-path", default=None,
                   help="parquet path with a doc_id column to tombstone")
    p.add_argument("--purge", action="store_true",
                   help="rewrite the index without tombstoned docs")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    if not (args.doc_ids or args.doc_ids_path or args.purge):
        raise SystemExit("nothing to do: pass --doc-ids/--doc-ids-path or --purge")

    from apt_search_engine_spark.indexing.deletes import (
        delete_docs,
        purge_deleted,
    )
    from apt_search_engine_spark.session import get_spark

    spark = get_spark("aptse-delete")
    out: dict[str, int] = {}
    if args.doc_ids or args.doc_ids_path:
        ids = list(args.doc_ids or [])
        if args.doc_ids_path:
            req = spark.read.parquet(args.doc_ids_path).select("doc_id")
            if ids:
                req = req.unionByName(
                    spark.createDataFrame([(i,) for i in ids], "doc_id string")
                )
            out["deleted_total"] = delete_docs(spark, args.index_dir, req)
        else:
            out["deleted_total"] = delete_docs(spark, args.index_dir, ids)
    if args.purge:
        out["purged"] = purge_deleted(spark, args.index_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
