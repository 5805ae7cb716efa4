"""spark-submit entrypoint: deterministic synthetic transcripts corpus.

    spark-submit --py-files aptse.zip apt_search_engine_spark/jobs/synth_corpus.py \
        --out /data/transcripts --convs 100000 [--seed 42] [--partitions 256]

Stands in for the reference's crawler as the corpus source (SURVEY.md S1):
output is identical for any partitioning (each task generates whole
conversations from (seed, conv_idx)).
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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--convs", type=int, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--partitions", type=int, default=None)
    args = p.parse_args(argv)

    from apt_search_engine_spark.corpus import gen_corpus_spark
    from apt_search_engine_spark.session import get_spark

    spark = get_spark("aptse-synth-corpus")
    df = gen_corpus_spark(spark, args.convs, seed=args.seed,
                          partitions=args.partitions)
    df.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"out": args.out, "convs": args.convs, "turns": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
