"""A/B evidence for layout changes that target the merge shuffle's
data-movement share (BASELINE.md: m = 0.44 of build time is data movement
on this box): build an index over the seeded synthetic corpus and report

  - total shuffle WRITE bytes of the build (Spark REST API, summed over
    the app's stages — the exchange payload the ladder analysis condemns),
  - on-disk bytes of the analyzed checkpoint and the postings/blocks dirs,
  - build wall seconds.

Run once per code revision on the same corpus size and diff the JSON:

    python tools/ab_build_bytes.py --n-convs 2000 --json v9.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def shuffle_bytes(ui_url: str) -> dict:
    apps = json.load(
        urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=30)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        )
    )
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        "output_bytes": sum(s.get("outputBytes", 0) for s in stages),
        "n_stages": len(stages),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from apt_search_engine_spark.session import get_spark

    spark = get_spark(
        "ab-build-bytes",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from apt_search_engine_spark.corpus import gen_corpus_spark
    from apt_search_engine_spark.indexing.build import (
        INDEX_LAYOUT_VERSION,
        IndexBuilder,
    )

    work = tempfile.mkdtemp(prefix="aptse_ab_")
    try:
        tdir = os.path.join(work, "transcripts")
        gen_corpus_spark(spark, args.n_convs, partitions=args.cpus * 2).write.mode(
            "overwrite"
        ).parquet(tdir)
        transcripts = spark.read.parquet(tdir)
        n_turns = transcripts.count()
        # drop the corpus-gen stages from the tallies: snapshot before build
        ui = spark.sparkContext.uiWebUrl
        before = shuffle_bytes(ui)

        idx = os.path.join(work, "index")
        t0 = time.time()
        IndexBuilder(spark, idx, n_batches=1).build(transcripts)
        wall = time.time() - t0
        after = shuffle_bytes(ui)

        out = {
            "layout": INDEX_LAYOUT_VERSION,
            "n_convs": args.n_convs,
            "n_turns": int(n_turns),
            "cpus": args.cpus,
            "build_sec": round(wall, 2),
            "turns_per_sec": round(n_turns / wall, 1),
            "shuffle_write_bytes": after["shuffle_write_bytes"]
            - before["shuffle_write_bytes"],
            "shuffle_read_bytes": after["shuffle_read_bytes"]
            - before["shuffle_read_bytes"],
            "analyzed_bytes": dir_bytes(os.path.join(idx, "analyzed")),
            "postings_bytes": dir_bytes(os.path.join(idx, "postings")),
            "blocks_bytes": dir_bytes(os.path.join(idx, "blocks")),
            "index_bytes_total": dir_bytes(idx),
        }
        print(json.dumps(out))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
