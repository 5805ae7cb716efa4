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
        # true turn count of the increment (T7: empty turns produce no
        # posting rows but ARE documents — the reference marks them
        # indexed; the uniform prior's n_docs must count them, exactly
        # like the batch build's transcripts.count())
        n_turns_in = df.count()
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
                },
                {
                    "build_id": "stream",
                    "partition_id": STREAM_BATCH_BASE + epoch_id,
                    "term_lo": None,
                    "term_hi": None,
                    "doc_lo": None,
                    "doc_hi": None,
                    "n_rows": n_turns_in,
                    "n_postings": 0,
                    "build_ms": 0,
                    "snapshot_id": f"stream-turns-{epoch_id}",
                },
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


def _analyzed_batch_ids(analyzed_dir: str) -> set[int]:
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(analyzed_dir)
        if name.startswith("batch=")
    }


def compact(
    spark: SparkSession,
    index_dir: str,
    with_blocks: bool = True,
    incremental: bool = True,
) -> None:
    """Merge analyzed batches into the postings index — INCREMENTALLY by
    default: only batches not yet in merge_state.json are read, their
    segments / blocks / doc-map rows are APPENDED, and the (tiny) lexicon
    is re-merged from old lexicon + delta counts. The previous behavior
    (rebuild postings from ALL analyzed data on every compaction — a full
    index re-shuffle per increment at 100 TB) survives as
    incremental=False and as the bootstrap path when no postings exist.

    Why appending is sound: stream epochs are exactly-once (checkpointed,
    overwrite-per-epoch), so increments carry disjoint doc sets; new docs
    get doc ordinals above every old one, so per-term segment/block
    ordinal ranges stay disjoint (blocks.py invariant) and query plans /
    WAND are unchanged. A lineage row records exactly how many delta
    posting rows the compaction read (the only-the-delta evidence
    asserted in tests/test_streaming.py)."""
    import json as _json

    from apt_search_engine_spark.indexing.blocks import (
        write_blocks,
        write_doc_map,
    )
    from apt_search_engine_spark.indexing.build import (
        build_lexicon_from_flat,
        merge_postings,
    )

    builder = IndexBuilder(spark, index_dir)
    builder._check_layout()
    state_path = os.path.join(index_dir, "merge_state.json")
    analyzed = _analyzed_batch_ids(builder.analyzed_dir)
    merged: set[int] = set()
    if os.path.exists(state_path):
        with open(state_path) as f:
            merged = set(_json.load(f)["batches"])
    delta = sorted(analyzed - merged)
    if not delta:
        return

    bootstrap = (
        not incremental
        or not merged
        or not os.path.isdir(builder.postings_dir)
    )
    def _turn_counts(batch_ids: set[int]) -> int | None:
        """Sum of true input turn counts for the given batches from the
        stream-turns lineage rows; None when any batch lacks one (e.g. a
        batch-built analyze dir compacted by this function)."""
        rows = (
            spark.read.parquet(builder.lineage_dir)
            .filter(F.col("snapshot_id").startswith("stream-turns-"))
            .select("partition_id", "n_rows")
            .collect()
        )
        counts = {int(r.partition_id): int(r.n_rows) for r in rows}
        if not batch_ids <= set(counts):
            return None
        return sum(counts[b] for b in batch_ids)

    if bootstrap:
        builder.merge_and_write("stream-compact", with_blocks=with_blocks)
        # n_docs drives the uniform prior and the IDF numerator: count
        # every input turn (incl. empty ones, T7) exactly like the batch
        # build; fall back to distinct analyzed docs when turn counts
        # are unavailable
        n_docs = _turn_counts(analyzed)
        if n_docs is None:
            n_docs = (
                spark.read.parquet(builder.analyzed_dir)
                .select("doc_id")
                .distinct()
                .count()
            )
    else:
        t0 = time.time()
        with open(builder.meta_path) as f:
            old_n_docs = int(_json.load(f)["n_docs"])
        flat = spark.read.parquet(builder.analyzed_dir).filter(
            F.col("batch").isin(delta)
        )
        new_docs = flat.select("doc_id").distinct()
        n_new = _turn_counts(set(delta))
        if n_new is None:
            n_new = new_docs.count()
        write_doc_map(
            spark, new_docs, builder.doc_map_dir,
            start_ord=old_n_docs, mode="append",
        )
        doc_map = spark.read.parquet(builder.doc_map_dir)
        postings_delta = merge_postings(
            flat, builder.max_per_row, doc_map=doc_map
        ).persist()
        n_segments = postings_delta.count()  # materialize once
        postings_delta.write.mode("append").partitionBy("term_bucket").parquet(
            builder.postings_dir
        )
        if with_blocks:
            write_blocks(spark, postings_delta, builder.blocks_dir, mode="append")
        postings_delta.unpersist()
        # lexicon: old counts + delta counts (term column only from the
        # delta; the old side is the lexicon itself, not the index)
        delta_lex = build_lexicon_from_flat(flat)
        old_lex = spark.read.parquet(builder.lexicon_dir)
        merged_lex = (
            old_lex.unionByName(delta_lex)
            .groupBy("term_bucket", "term")
            .agg(F.sum("df").cast("int").alias("df"))
            .select("term", "df", "term_bucket")
        )
        tmp_lex = builder.lexicon_dir + "__tmp"
        merged_lex.write.mode("overwrite").partitionBy("term_bucket").parquet(
            tmp_lex
        )
        import shutil

        shutil.rmtree(builder.lexicon_dir)
        os.rename(tmp_lex, builder.lexicon_dir)
        n_docs = old_n_docs + n_new
        n_delta_rows = flat.count()
        builder._append_lineage(
            [
                {
                    "build_id": "stream-compact-incr",
                    "partition_id": b,
                    "term_lo": None,
                    "term_hi": None,
                    "doc_lo": None,
                    "doc_hi": None,
                    "n_rows": int(n_delta_rows),
                    "n_postings": int(n_segments),
                    "build_ms": int((time.time() - t0) * 1000),
                    "snapshot_id": f"compact-delta-{b}",
                }
                for b in delta
            ]
        )
    with open(builder.meta_path, "w") as f:
        _json.dump(
            {"build_id": "stream-compact", "n_docs": n_docs}, f
        )
    with open(state_path, "w") as f:
        _json.dump({"batches": sorted(merged | set(delta))}, f)
