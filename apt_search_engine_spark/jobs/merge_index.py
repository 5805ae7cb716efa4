"""spark-submit entrypoint: merge independently built indexes.

    spark-submit --py-files aptse.zip \
        apt_search_engine_spark/jobs/merge_index.py \
        --src /data/idx_shard0 --src /data/idx_shard1 [...] \
        --out /data/idx_merged

The distributed-build pattern for 10^12-turn corpora: each shard's index
is built by its own spark-submit over its slice (no cross-shard shuffle)
and this job concatenates them Lucene-IndexMergeTool-style (docBase
ordinal offsets, segments re-chunked, lexicon recounted, blocks
re-derived). Prints one JSON line with the merged index meta.
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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--src", action="append", required=True,
        help="source index dir (repeat; >= 2)",
    )
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from apt_search_engine_spark.indexing.merge import merge_indexes
    from apt_search_engine_spark.session import get_spark

    spark = get_spark("aptse-merge")
    t0 = time.time()
    meta = merge_indexes(spark, args.src, args.out)
    print(
        json.dumps(
            {**meta, "out": args.out, "wall_sec": round(time.time() - t0, 2)}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
