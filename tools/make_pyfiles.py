"""Package the engine for spark-submit --py-files shipping.

    python tools/make_pyfiles.py [--out aptse.zip]

Zips `apt_search_engine_spark/` (sources only — no tests, no caches)
into a single archive every executor can import from:

    spark-submit --py-files aptse.zip \
        apt_search_engine_spark/jobs/build_index.py --input ... --index-dir ...

The jobs also bootstrap sys.path for repo-checkout runs, so the zip is
only required when the driver/executors don't share the repo filesystem
(i.e., on a real cluster — the north-rule ship path).
"""

from __future__ import annotations

import argparse
import os
import zipfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = "apt_search_engine_spark"


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(_ROOT, _PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, _ROOT))
                n += 1
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(_ROOT, "aptse.zip"))
    args = ap.parse_args(argv)
    n = build(args.out)
    print(f"{args.out}: {n} modules")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
