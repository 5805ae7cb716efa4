"""spark-submit entrypoint: resumable inverted-index build.

    spark-submit --py-files aptse.zip apt_search_engine_spark/jobs/build_index.py \
        --input /data/transcripts --index-dir /data/index \
        [--format parquet|json|csv] [--batches 64] \
        [--max-postings-per-row 32768] [--no-blocks] \
        [--table <iceberg table>]

Reads the transcripts table (parquet/JSONL/CSV path via the
schema-enforced reader in corpus.read_transcripts, or a catalog table
name per BASELINE.json input_hint), runs the 3-stage build (analyze -> range-sharded
sorted merge -> compressed blocks) and writes postings + blocks + doc_map +
lineage
metrics under --index-dir. Re-running after a crash skips analyze batches
already recorded in lineage (resume contract, SURVEY.md S6/S8).
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
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="path of the transcripts table")
    src.add_argument("--table", help="catalog (Iceberg) table name")
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "json", "jsonl", "csv"),
                   help="--input file format (schema-enforced reader)")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--batches", type=int, default=64,
                   help="resumable analyze batches (doc-partition granularity)")
    p.add_argument("--max-postings-per-row", type=int, default=None,
                   help="segment cap: postings per stored row (bounds task "
                        "memory on Zipfian head terms)")
    p.add_argument("--no-blocks", action="store_true",
                   help="skip the compressed block-max companion")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from apt_search_engine_spark.config import MAX_POSTINGS_PER_ROW
    from apt_search_engine_spark.indexing.build import IndexBuilder
    from apt_search_engine_spark.session import get_spark

    from apt_search_engine_spark.corpus import read_transcripts

    spark = get_spark("aptse-build-index")
    transcripts = (
        spark.read.table(args.table)
        if args.table
        else read_transcripts(spark, args.input, args.format)
    )
    t0 = time.time()
    builder = IndexBuilder(
        spark, args.index_dir, n_batches=args.batches,
        max_per_row=args.max_postings_per_row or MAX_POSTINGS_PER_ROW,
    )
    build_id = builder.build(transcripts, with_blocks=not args.no_blocks)
    wall = time.time() - t0
    n = transcripts.count()
    print(json.dumps({
        "build_id": build_id, "n_turns": n, "wall_sec": round(wall, 2),
        "turns_per_sec": round(n / wall, 1), "index_dir": args.index_dir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
