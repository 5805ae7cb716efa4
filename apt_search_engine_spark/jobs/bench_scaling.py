"""Scaling-efficiency evidence: the same index build at two parallelism
levels (BASELINE.json: throughput scaling efficiency >=0.8 from N to 4N
executors; sandbox stand-in is local[N] vs local[4N] — BASELINE.md).

    python -m apt_search_engine_spark.jobs.bench_scaling \
        [--convs 40000] [--low 8] [--high 32] [--batches 1]

Methodology (each level runs in a FRESH JVM subprocess):
  - the process tree of the low level is PINNED to `low` physical cores
    with taskset. In local[N] the Arrow/pandas workers are separate OS
    processes NOT bounded by the N task slots, so an unpinned local[8] on
    a 32-core box silently borrows idle cores and understates scaling;
    pinning makes local[N] an honest N-core node.
  - each level first runs a small UNTIMED warmup build (JIT/codegen +
    Python worker spawn are one-time costs a long-lived cluster amortizes),
    then the timed build of the shared corpus.

Prints one JSON line:
    {"low": {...}, "high": {...}, "scaling_efficiency": E}
where E = (tput_high / tput_low) / (high / low). Query p50 at both levels
is reported alongside (informational; the target binds the build).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

_CHILD = """
import json, statistics, sys, time
work, cpus, batches = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from apt_search_engine_spark.session import get_spark
from apt_search_engine_spark.indexing.build import IndexBuilder
from apt_search_engine_spark.query.engine import SearchEngine

spark = get_spark("scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

# untimed warmup: JIT/codegen + python worker pools
warm = spark.read.parquet(work + "/warmup")
IndexBuilder(spark, work + "/warm_idx_%d" % cpus, n_batches=1).build(warm)

tr = spark.read.parquet(work + "/transcripts")
n = tr.count()
idx = work + "/index_%d" % cpus
t0 = time.time()
IndexBuilder(spark, idx, n_batches=batches).build(tr)
build = time.time() - t0
eng = SearchEngine(spark, index_dir=idx)
lat = []
for _ in range(5):
    t0 = time.time()
    eng.search_df_wand("travel guide europe", k=10).collect()
    lat.append(time.time() - t0)
print(json.dumps({"cpus": cpus, "n_turns": n, "build_sec": round(build, 2),
                  "turns_per_sec": round(n / build, 1),
                  "query_p50_sec": round(statistics.median(lat), 3)}))
"""


def _run_child(work: str, cpus: int, batches: int) -> dict:
    env = dict(os.environ)
    env.pop("APTSE_MASTER", None)
    cmd = [sys.executable, "-c", _CHILD, work, str(cpus), str(batches)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--convs", type=int, default=40000)
    p.add_argument("--low", type=int, default=8)
    p.add_argument("--high", type=int, default=32)
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args(argv)

    work = tempfile.mkdtemp(prefix="aptse_scaling_")
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import sys\n"
             "from apt_search_engine_spark.session import get_spark\n"
             "from apt_search_engine_spark.corpus import gen_corpus_spark\n"
             "s = get_spark('gen', master='local[%d]')\n"
             "gen_corpus_spark(s, %d, partitions=%d).write.mode('overwrite')"
             ".parquet(sys.argv[1] + '/transcripts')\n"
             "gen_corpus_spark(s, 600, seed=99, partitions=32).write"
             ".mode('overwrite').parquet(sys.argv[1] + '/warmup')\n"
             % (args.high, args.convs, args.high * 8),
             work],
            capture_output=True, text=True, check=True,
        )
        low = _run_child(work, args.low, args.batches)
        high = _run_child(work, args.high, args.batches)
        eff = (high["turns_per_sec"] / low["turns_per_sec"]) / (
            args.high / args.low
        )
        print(json.dumps({
            "low": low, "high": high,
            "scaling_efficiency": round(eff, 3),
            "convs": args.convs,
        }))
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
