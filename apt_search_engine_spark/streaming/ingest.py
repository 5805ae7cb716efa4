"""Structured Streaming ingestion of transcript turns (SURVEY.md 2.5
extension: the reference has no streaming; its closest analogue is the
crawler's polling frontier loop, Crawler/Crawler.java:91-104).

`stream_analyze` tails a growing transcripts directory (file source; swap
for Kafka/Iceberg streaming sources on a cluster) and runs the SAME
analyze stage as the batch build inside foreachBatch, appending flat
posting rows under analyzed/batch=<STREAM_BATCH_BASE + epoch>/ plus a
lineage row per epoch. Exactly-once comes from the streaming checkpoint
(epoch replays overwrite their own directory, so a crashed epoch never
double-appends). A periodic `IndexBuilder.merge_and_write` compaction then
refreshes postings/blocks from everything analyzed so far — the same
batch-mark-resume semantics as the reference's isIndexed flag, driven by a
stream instead of a polling loop."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession, functions as F

from apt_search_engine_spark.indexing.build import (
    IndexBuilder,
    analyze_transcripts,
)
from apt_search_engine_spark.schema import TRANSCRIPTS

# epoch directories live above any batch id the batch build uses
STREAM_BATCH_BASE = 1_000_000


def stream_analyze(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the streaming analyze.
    Returns the StreamingQuery."""
    builder = IndexBuilder(spark, index_dir)
    checkpoint = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")

    def process_epoch(df, epoch_id: int):
        t0 = time.time()
        flat = analyze_transcripts(df)
        out = os.path.join(
            builder.analyzed_dir, f"batch={STREAM_BATCH_BASE + epoch_id}"
        )
        flat.write.mode("overwrite").parquet(out)  # idempotent per epoch
        stats = (
            spark.read.parquet(out)
            .agg(
                F.count("*").alias("n"),
                F.min("doc_id").alias("dlo"),
                F.max("doc_id").alias("dhi"),
                F.min("term").alias("tlo"),
                F.max("term").alias("thi"),
            )
            .collect()[0]
        )
        builder._append_lineage(
            [
                {
                    "build_id": "stream",
                    "partition_id": STREAM_BATCH_BASE + epoch_id,
                    "term_lo": stats.tlo,
                    "term_hi": stats.thi,
                    "doc_lo": stats.dlo,
                    "doc_hi": stats.dhi,
                    "n_rows": stats.n or 0,
                    "n_postings": stats.n or 0,
                    "build_ms": int((time.time() - t0) * 1000),
                    "snapshot_id": f"stream-epoch-{epoch_id}",
                }
            ]
        )

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process_epoch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return q


def compact(spark: SparkSession, index_dir: str, with_blocks: bool = True) -> None:
    """Rebuild postings (+ blocks) from everything analyzed so far —
    the periodic merge compaction paired with stream_analyze. Also stamps
    meta.json (n_docs = distinct analyzed docs) so the compacted index
    opens in SearchEngine without a batch build."""
    import json

    builder = IndexBuilder(spark, index_dir)
    builder.merge_and_write("stream-compact", with_blocks=with_blocks)
    n_docs = (
        spark.read.parquet(builder.analyzed_dir)
        .select("doc_id")
        .distinct()
        .count()
    )
    with open(builder.meta_path, "w") as f:
        json.dump({"build_id": "stream-compact", "n_docs": n_docs}, f)
