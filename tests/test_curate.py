"""extras/curate.py: the composed curation pipeline on planted fixtures —
every verdict column exercised with a doc engineered to trigger it, plus
determinism and the jobs/curate.py CLI surface."""

from __future__ import annotations

import json
import os

import pytest

LONG_A = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows past the old stone bridge under a bright summer sky full of "
    "small white clouds drifting slowly toward the distant blue hills"
)
# near-dup of LONG_A: one word changed near the end -> shares almost all
# word 3-grams, so the 2-hash bands collide with near-certainty
LONG_B = LONG_A.replace("blue hills", "green hills")


def _docs_rows():
    return [
        ("d01", LONG_A),                       # near-dup cluster keeper (longest + min id)
        ("d02", LONG_B),                       # near-dup drop
        ("d03", "exact duplicate text body here with enough tokens"),
        ("d04", "exact duplicate text body here with enough tokens"),  # exact dup of d03
        ("d05", "tiny doc"),                   # low quality: < 5 tokens
        ("d06", "1 2 3 4 5 6 7 8 9 10 mostly digits here"),  # low quality: digit share
        ("d07", "a perfectly ordinary standalone document about gardening and soil"),
        ("d08", "this sentence contains the secret benchmark trigram somewhere inside"),
    ]


def _eval_rows():
    # shares the 3-gram "secret benchmark trigram" with d08
    return [("e01", "the secret benchmark trigram appears in this eval set")]


@pytest.fixture(scope="module")
def verdicts(spark):
    from apt_search_engine_spark.extras.curate import curate

    docs = spark.createDataFrame(_docs_rows(), ["doc_id", "text"])
    eval_docs = spark.createDataFrame(_eval_rows(), ["doc_id", "text"])
    rows = curate(docs, eval_docs=eval_docs).collect()
    return {r.doc_id: r for r in rows}


def test_every_doc_gets_a_verdict(verdicts):
    assert set(verdicts) == {f"d{i:02d}" for i in range(1, 9)}


def test_exact_dup(verdicts):
    assert not verdicts["d03"].exact_dup  # min doc_id keeps
    assert verdicts["d04"].exact_dup
    assert not verdicts["d04"].kept


def test_neardup_cluster(verdicts):
    assert not verdicts["d01"].neardup_drop  # equal-length tiebreak: min id
    assert verdicts["d02"].neardup_drop
    assert verdicts["d01"].kept
    assert not verdicts["d02"].kept


def test_contamination(verdicts):
    assert verdicts["d08"].contaminated
    assert not verdicts["d08"].kept
    assert not verdicts["d07"].contaminated


def test_quality_gates(verdicts):
    assert verdicts["d05"].low_quality      # 2 tokens < 5
    assert verdicts["d06"].low_quality      # 10/14 digits > 50%
    assert not verdicts["d07"].low_quality
    assert verdicts["d07"].kept


def test_split_is_deterministic_and_valid(spark, verdicts):
    from apt_search_engine_spark.extras.curate import curate

    assert all(r.split in ("train", "val", "test") for r in verdicts.values())
    docs = spark.createDataFrame(_docs_rows(), ["doc_id", "text"])
    again = {r.doc_id: r for r in curate(docs).collect()}
    for d, r in again.items():
        assert r.split == verdicts[d].split  # split ignores the eval set


def test_no_eval_set_means_no_contamination(spark):
    from apt_search_engine_spark.extras.curate import curate

    docs = spark.createDataFrame(_docs_rows(), ["doc_id", "text"])
    rows = curate(docs).collect()
    assert not any(r.contaminated for r in rows)
    # d08 only falls to contamination; without an eval set it survives
    kept = {r.doc_id for r in rows if r.kept}
    assert "d08" in kept


def test_curate_stats(spark):
    from apt_search_engine_spark.extras.curate import curate, curate_stats

    docs = spark.createDataFrame(_docs_rows(), ["doc_id", "text"])
    eval_docs = spark.createDataFrame(_eval_rows(), ["doc_id", "text"])
    s = curate_stats(curate(docs, eval_docs=eval_docs))
    assert s["docs_in"] == 8
    assert s["exact_dups"] == 1
    # d04 is also a near-dup drop: identical text => identical shingles
    # => same cluster as d03, and d03 wins the tiebreak in both gates
    assert s["neardup_drops"] == 2
    assert s["contaminated"] == 1
    assert s["low_quality"] == 2
    assert s["docs_kept"] == 3
    assert s["kept_train"] + s["kept_val"] + s["kept_test"] == s["docs_kept"]


def test_cli_job(spark, tmp_path, capsys):
    from apt_search_engine_spark.jobs.curate import main

    docs = spark.createDataFrame(_docs_rows(), ["doc_id", "text"])
    eval_docs = spark.createDataFrame(_eval_rows(), ["doc_id", "text"])
    din, dev = str(tmp_path / "docs"), str(tmp_path / "eval")
    docs.write.parquet(din)
    eval_docs.write.parquet(dev)
    out, ver = str(tmp_path / "curated"), str(tmp_path / "verdicts")
    assert main([
        "--input", din, "--out", out, "--eval", dev, "--verdicts", ver,
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_kept"] == 3
    kept = spark.read.parquet(out)
    assert kept.count() == 3
    assert set(kept.columns) == {"doc_id", "text", "split"}
    assert spark.read.parquet(ver).count() == 8
    assert os.path.isdir(out)
