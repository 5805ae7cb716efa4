"""Streaming ingestion: analyzing a corpus that arrives as a stream (two
file drops) must produce an index identical to the one-shot batch build,
and resuming the drained stream after a new drop must pick up only the new
conversations (incremental semantics of the reference's isIndexed flag)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apt_search_engine_spark.corpus import gen_corpus_pandas
from apt_search_engine_spark.schema import TRANSCRIPTS


@pytest.fixture(scope="module")
def stream_corpus(spark):
    pdf = gen_corpus_pandas(30)
    half = pdf["conv_id"] < "conv_000015"
    return (
        spark.createDataFrame(pdf[half], TRANSCRIPTS),
        spark.createDataFrame(pdf[~half], TRANSCRIPTS),
        spark.createDataFrame(pdf, TRANSCRIPTS),
    )


def _postings_map(spark, index_dir):
    rows = spark.read.parquet(os.path.join(index_dir, "postings")).collect()
    out = {}
    for r in rows:
        out.setdefault(r.term, []).extend(
            (p.doc_id, round(p.tf, 12), list(p.positions), list(p.tags))
            for p in r.postings
        )
    return {t: sorted(v) for t, v in out.items()}


def test_stream_equals_batch(spark, tmp_path, stream_corpus):
    from apt_search_engine_spark.indexing.build import IndexBuilder
    from apt_search_engine_spark.streaming.ingest import compact, stream_analyze

    first, second, full = stream_corpus
    inp = str(tmp_path / "incoming")
    sdir = str(tmp_path / "stream_index")
    bdir = str(tmp_path / "batch_index")

    # drop 1 -> drain -> drop 2 -> drain (new query, same checkpoint)
    first.write.mode("append").parquet(inp)
    stream_analyze(spark, inp, sdir)
    second.write.mode("append").parquet(inp)
    stream_analyze(spark, inp, sdir)
    compact(spark, sdir, with_blocks=False)

    IndexBuilder(spark, bdir, n_batches=1).build(full, with_blocks=False)

    got = _postings_map(spark, sdir)
    want = _postings_map(spark, bdir)
    assert got == want

    # lineage recorded one row per non-empty epoch, under stream ids
    lin = spark.read.parquet(os.path.join(sdir, "lineage"))
    eps = lin.filter(F.col("snapshot_id").startswith("stream-epoch-")).collect()
    assert len(eps) >= 2
    assert all(r.partition_id >= 1_000_000 for r in eps)


def test_drained_stream_is_idempotent(spark, tmp_path, stream_corpus):
    """Draining again with no new files must not change the analyzed set."""
    from apt_search_engine_spark.streaming.ingest import stream_analyze

    first, _, _ = stream_corpus
    inp = str(tmp_path / "incoming2")
    sdir = str(tmp_path / "stream_index2")
    first.write.mode("append").parquet(inp)
    stream_analyze(spark, inp, sdir)
    n1 = spark.read.parquet(os.path.join(sdir, "analyzed")).count()
    stream_analyze(spark, inp, sdir)  # nothing new
    n2 = spark.read.parquet(os.path.join(sdir, "analyzed")).count()
    assert n1 == n2
