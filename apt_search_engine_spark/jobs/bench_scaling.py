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
import os
import shutil
import subprocess
import sys
import tempfile

_CHILD = """
import json, shutil, statistics, sys, time
work, cpus, batches = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from apt_search_engine_spark.session import get_spark
from apt_search_engine_spark.indexing.build import IndexBuilder
from apt_search_engine_spark.query.engine import SearchEngine

spark = get_spark("scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

# fresh dirs: a leftover index from a previous repeat would RESUME (the
# build is resumable by design) and fake an instant rebuild
shutil.rmtree(work + "/warm_idx_%d" % cpus, ignore_errors=True)
shutil.rmtree(work + "/index_%d" % cpus, ignore_errors=True)

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
    p.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="interleave N low/high pairs and report medians — single-shot "
        "numbers on a shared VM swing 2-3x run to run (BASELINE.md), so "
        "any headline efficiency figure should come from repeats >= 3",
    )
    p.add_argument(
        "--work",
        default=None,
        help="reuse an existing work dir (transcripts/ + warmup/ parquet) "
        "instead of generating the corpus",
    )
    args = p.parse_args(argv)

    import statistics

    work = args.work or tempfile.mkdtemp(prefix="aptse_scaling_")
    try:
        if not (args.work and os.path.isdir(os.path.join(work, "transcripts"))):
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
        lows, highs = [], []
        for _ in range(args.repeats):
            lows.append(_run_child(work, args.low, args.batches))
            highs.append(_run_child(work, args.high, args.batches))
        med_low = statistics.median(r["turns_per_sec"] for r in lows)
        med_high = statistics.median(r["turns_per_sec"] for r in highs)
        eff = (med_high / med_low) / (args.high / args.low)
        print(json.dumps({
            "low": {"cpus": args.low, "n_turns": lows[0]["n_turns"],
                    "turns_per_sec_median": round(med_low, 1),
                    "turns_per_sec_runs": [r["turns_per_sec"] for r in lows],
                    "query_p50_sec": statistics.median(
                        r["query_p50_sec"] for r in lows)},
            "high": {"cpus": args.high, "n_turns": highs[0]["n_turns"],
                     "turns_per_sec_median": round(med_high, 1),
                     "turns_per_sec_runs": [r["turns_per_sec"] for r in highs],
                     "query_p50_sec": statistics.median(
                         r["query_p50_sec"] for r in highs)},
            "scaling_efficiency": round(eff, 3),
            "repeats": args.repeats,
            "convs": args.convs,
        }))
        return 0
    finally:
        if not args.keep and not args.work:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
