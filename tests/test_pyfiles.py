"""The north-rule ship path: spark-submit --py-files aptse.zip must be a
complete deployment — the job script copied OUTSIDE the repo checkout
(so its repo-root sys.path bootstrap finds nothing) with only the zip
providing the package. Runs one real spark-submit subprocess."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_zip_contents(tmp_path):
    sys.path.insert(0, _ROOT)
    from tools.make_pyfiles import build

    out = str(tmp_path / "aptse.zip")
    n = build(out)
    assert n > 20  # every module of the package
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "apt_search_engine_spark/__init__.py" in names
    assert "apt_search_engine_spark/indexing/build.py" in names
    assert not any("test" in n.split("/")[0] for n in names)


def test_spark_submit_pyfiles_ships_the_engine(tmp_path):
    sys.path.insert(0, _ROOT)
    from tools.make_pyfiles import build

    zip_path = str(tmp_path / "aptse.zip")
    build(zip_path)
    # job script copied outside the repo: its _ROOT bootstrap resolves to
    # a directory with no package, so only --py-files can satisfy imports
    job = str(tmp_path / "job.py")
    shutil.copy(
        os.path.join(_ROOT, "apt_search_engine_spark/jobs/synth_corpus.py"), job
    )
    out = str(tmp_path / "corpus")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["APTSE_DRIVER_MEM"] = "2g"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--py-files", zip_path,
            job,
            "--out", out, "--convs", "3", "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["turns"] > 0
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == stats["turns"]


def test_run_op_cli_binds_the_catalog(spark, tmp_path, capsys):
    """jobs/run_op.py makes every cataloged operator spark-submit-able:
    a known op writes its result parquet and prints one JSON stats line;
    unknown ops and missing args fail with exit 2, --list prints the
    catalog."""
    import json as _json

    from apt_search_engine_spark.extras.docops import SPARK_QUERIES
    from apt_search_engine_spark.jobs.run_op import main

    out = str(tmp_path / "res")
    rc = main(
        ["--op", "dedup_exact", "--sf-dir", "/root/testdata/sf0.001",
         "--out", out]
    )
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_written"] == spark.read.parquet(out).count() > 0

    assert main(["--list"]) == 0
    listed = capsys.readouterr().out.split()
    assert set(listed) == set(SPARK_QUERIES)

    assert main(["--op", "nope", "--sf-dir", "x", "--out", out]) == 2
    assert main(["--op", "dedup_exact", "--sf-dir", "x"]) == 2
