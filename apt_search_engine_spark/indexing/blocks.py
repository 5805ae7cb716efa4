"""Compressed posting blocks for block-max WAND (FIXTURES.md section P).

Derives, from the canonical grouped postings table, a blocked companion:
one row per (term, block of <=POSTING_BLOCK_SIZE docs) with delta+varbyte
doc ordinals, raw-float tfs, per-doc weighted tfs (tf * sum(tag_weights) —
the reference's Ranker.java:55-66 score kernel minus the idf factor),
packed positions, the block's ordinal bounds [lo_ord, hi_ord] and the score
upper bound `block_max_wtf = max(wtf)` — multiplied by floor(6000/df) at
query time it bounds any document's score contribution from this term,
which is what lets WAND skip blocks (SURVEY.md 4.2 item 3).

Doc ordinals come from a corpus-wide doc_map (doc_id -> dense ordinal in
doc_id order), written alongside — the docID space assignment every real
inverted index does at ingest. Assignment is two-pass and Arrow-batched
(range-partition by doc_id, count per partition, then offset + arange per
batch): no per-row Python, no driver-side collect of doc ids.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from apt_search_engine_spark.analysis.analyzer import tag_weight
from apt_search_engine_spark.config import POSTING_BLOCK_SIZE
from apt_search_engine_spark.indexing import codec

BLOCKS_SCHEMA = (
    "term string, df int, block_id int, n_docs int, doc_ids_vb binary, "
    "tfs binary, wtfs binary, positions_vb binary, block_max_wtf double, "
    "lo_ord long, hi_ord long, term_bucket int"
)

DOC_MAP_SCHEMA = "doc_id string, doc_ord long"

# ordinal width of one regrouping segment (bounds any (term, seg) row to
# at most this many entries)
BLOCK_SEGMENT_ORDS = POSTING_BLOCK_SIZE * 256


def write_doc_map(spark: SparkSession, doc_ids: DataFrame, out_dir: str) -> None:
    """Dense ordinal per doc_id in global doc_id order, distributed:
    range-partition by doc_id, sort within partitions, then a two-pass
    (per-partition counts -> broadcast prefix offsets -> offset + arange)
    assignment in mapInPandas. The persist() pins one range partitioning
    across both passes (range boundaries come from sampling)."""
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        doc_ids.repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    ranged.persist()
    try:
        counts = {
            r.pid: r.n
            for r in ranged.groupBy("pid").agg(F.count("*").alias("n")).collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        bc = spark.sparkContext.broadcast(offsets)

        def assign(batches):
            nxt = None
            for pdf in batches:
                if not len(pdf):
                    continue
                if nxt is None:
                    nxt = bc.value.get(int(pdf["pid"].iloc[0]), 0)
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "doc_ord": np.arange(nxt, nxt + n, dtype=np.int64),
                    }
                )
                nxt += n

        ranged.mapInPandas(assign, DOC_MAP_SCHEMA).write.mode(
            "overwrite"
        ).parquet(out_dir)
    finally:
        ranged.unpersist()


def _blocks_from_groups(batches):
    for pdf in batches:
        rows = []
        for term, df_, bucket, entries in zip(
            pdf["term"], pdf["df"], pdf["term_bucket"], pdf["entries"]
        ):
            # entries: list of dicts sorted by doc_ord (one segment's worth)
            n = len(entries)
            for b0 in range(0, n, POSTING_BLOCK_SIZE):
                chunk = entries[b0 : b0 + POSTING_BLOCK_SIZE]
                ords = np.array([e["doc_ord"] for e in chunk], dtype=np.int64)
                tfs = np.array([e["tf"] for e in chunk], dtype=np.float64)
                # per-doc weighted tf: tf * sum(tag weights), empty tags
                # scoring one default 0.5 weight (Ranker.java:55-66 + the
                # engine's _WSUM expression — kept as a Python left fold so
                # float association matches the SQL aggregate fold)
                wtf = np.array(
                    [
                        e["tf"] * sum(tag_weight(t) for t in e["tags"])
                        if len(e["tags"])
                        else e["tf"] * 0.5
                        for e in chunk
                    ],
                    dtype=np.float64,
                )
                rows.append(
                    (
                        term,
                        int(df_),
                        int(ords[0]) // POSTING_BLOCK_SIZE,
                        len(chunk),
                        codec.encode_doc_ids(ords),
                        codec.encode_tfs(tfs),
                        codec.encode_tfs(wtf),
                        codec.encode_positions([list(e["positions"]) for e in chunk]),
                        float(wtf.max()),
                        int(ords[0]),
                        int(ords[-1]),
                        int(bucket),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "term", "df", "block_id", "n_docs", "doc_ids_vb", "tfs",
                "wtfs", "positions_vb", "block_max_wtf", "lo_ord", "hi_ord",
                "term_bucket",
            ],
        )


def write_blocks(spark: SparkSession, postings_dir: str, blocks_dir: str) -> None:
    postings = spark.read.parquet(postings_dir)
    doc_map_dir = os.path.join(os.path.dirname(blocks_dir), "doc_map")

    # corpus-wide docID assignment: dense ordinal in doc_id order
    doc_ids = (
        postings.select(F.explode("postings").alias("p"))
        .select(F.col("p.doc_id").alias("doc_id"))
        .distinct()
    )
    write_doc_map(spark, doc_ids, doc_map_dir)
    doc_map = spark.read.parquet(doc_map_dir)

    exploded = postings.select(
        "term", "df", "term_bucket", F.explode("postings").alias("p")
    ).select(
        "term",
        "df",
        "term_bucket",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
        F.col("p.positions").alias("positions"),
        F.col("p.tags").alias("tags"),
    )
    # group by (term, ordinal segment) — NOT bare term — so a head term's
    # entries never collect into one unbounded row; blocks never span a
    # segment, and block_id = lo_ord // POSTING_BLOCK_SIZE stays strictly
    # increasing in doc order across segments (ordinals are strictly
    # increasing, so consecutive 128-doc chunks differ by >= 128 ordinals)
    regrouped = (
        exploded.join(doc_map, "doc_id")
        .withColumn(
            "seg", (F.col("doc_ord") / F.lit(BLOCK_SEGMENT_ORDS)).cast("long")
        )
        .groupBy("term", "df", "term_bucket", "seg")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("doc_ord", "tf", "positions", "tags")
                )
            ).alias("entries")
        )
    )
    blocks = regrouped.mapInPandas(_blocks_from_groups, schema=BLOCKS_SCHEMA)
    blocks.write.mode("overwrite").partitionBy("term_bucket").parquet(blocks_dir)
