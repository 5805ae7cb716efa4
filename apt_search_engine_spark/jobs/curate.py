"""spark-submit entrypoint: end-to-end training-corpus curation.

    spark-submit --py-files aptse.zip apt_search_engine_spark/jobs/curate.py \
        --input /data/documents.parquet --out /data/curated \
        [--eval /data/benchmark.parquet] [--min-tokens 5] \
        [--max-digit-pct 50] [--verdicts /data/verdicts]

Reads a documents table (doc_id, text, ...), runs the composed curation
pipeline (extras/curate.py: exact dedup -> near-dup cluster pruning ->
benchmark decontamination -> quality gates -> deterministic
train/val/test split), writes the kept documents partitioned by split
under --out (and, optionally, the full per-doc verdict frame under
--verdicts for audit), and prints one JSON line of pipeline stats.
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
    p.add_argument("--input", required=True,
                   help="parquet path of the documents table (doc_id, text, ...)")
    p.add_argument("--out", required=True,
                   help="output dir: kept docs, partitioned by split")
    p.add_argument("--eval", default=None,
                   help="parquet path of the benchmark/eval documents to "
                        "decontaminate against (doc_id, text)")
    p.add_argument("--min-tokens", type=int, default=None)
    p.add_argument("--max-digit-pct", type=int, default=None)
    p.add_argument("--verdicts", default=None,
                   help="also write the full per-doc verdict frame here")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from apt_search_engine_spark.extras.curate import (
        MAX_DIGIT_PCT,
        MIN_TOKENS,
        curate,
        curate_stats,
    )
    from apt_search_engine_spark.session import get_spark

    spark = get_spark("aptse-curate")
    docs = spark.read.parquet(args.input)
    eval_docs = spark.read.parquet(args.eval) if args.eval else None

    t0 = time.time()
    verdicts = curate(
        docs,
        eval_docs=eval_docs,
        min_tokens=args.min_tokens if args.min_tokens is not None else MIN_TOKENS,
        max_digit_pct=(
            args.max_digit_pct if args.max_digit_pct is not None else MAX_DIGIT_PCT
        ),
    ).persist()  # two consumers below: the kept-doc join and the stats agg

    (
        docs.join(
            verdicts.filter("kept").select("doc_id", "split"), "doc_id"
        )
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(args.out)
    )
    if args.verdicts:
        verdicts.write.mode("overwrite").parquet(args.verdicts)

    stats = curate_stats(verdicts)
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
