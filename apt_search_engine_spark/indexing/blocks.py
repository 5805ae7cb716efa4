"""Compressed posting blocks for block-max WAND (FIXTURES.md section P).

Derives, from the canonical grouped postings table, a blocked companion:
one row per (term, block of <=POSTING_BLOCK_SIZE docs) with delta+varbyte
doc ordinals, raw-float tfs, packed positions and the block's score upper
bound `block_max_wtf = max(tf * sum(tag_weights))` — multiplied by
floor(6000/df) at query time it bounds any document's score contribution
from this term, which is what lets WAND skip blocks (SURVEY.md 4.2 item 3).

Doc ordinals come from a corpus-wide doc_map (doc_id -> dense ordinal in
doc_id order), written alongside — the docID space assignment every real
inverted index does at ingest.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from apt_search_engine_spark.analysis.analyzer import tag_weight
from apt_search_engine_spark.config import N_TERM_BUCKETS, POSTING_BLOCK_SIZE
from apt_search_engine_spark.indexing import codec

BLOCKS_SCHEMA = (
    "term string, df int, block_id int, n_docs int, doc_ids_vb binary, "
    "tfs binary, positions_vb binary, block_max_wtf double, term_bucket int"
)

DOC_MAP_SCHEMA = "doc_id string, doc_ord long"


def _blocks_from_groups(batches):
    for pdf in batches:
        rows = []
        for term, df_, bucket, entries in zip(
            pdf["term"], pdf["df"], pdf["term_bucket"], pdf["entries"]
        ):
            # entries: list of dicts sorted by doc_ord
            n = len(entries)
            for b0 in range(0, n, POSTING_BLOCK_SIZE):
                chunk = entries[b0 : b0 + POSTING_BLOCK_SIZE]
                ords = np.array([e["doc_ord"] for e in chunk], dtype=np.int64)
                tfs = np.array([e["tf"] for e in chunk], dtype=np.float64)
                wtf = np.array(
                    [
                        e["tf"] * sum(tag_weight(t) for t in e["tags"])
                        if len(e["tags"])
                        else e["tf"] * 0.5
                        for e in chunk
                    ]
                )
                rows.append(
                    (
                        term,
                        int(df_),
                        b0 // POSTING_BLOCK_SIZE,
                        len(chunk),
                        codec.encode_doc_ids(ords),
                        codec.encode_tfs(tfs),
                        codec.encode_positions([list(e["positions"]) for e in chunk]),
                        float(wtf.max()),
                        int(bucket),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "term", "df", "block_id", "n_docs", "doc_ids_vb", "tfs",
                "positions_vb", "block_max_wtf", "term_bucket",
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
    doc_map = (
        doc_ids.rdd.map(lambda r: r.doc_id)
        .sortBy(lambda x: x)
        .zipWithIndex()
        .toDF(["doc_id", "doc_ord"])
    )
    doc_map.write.mode("overwrite").parquet(doc_map_dir)
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
    regrouped = (
        exploded.join(doc_map, "doc_id")
        .groupBy("term", "df", "term_bucket")
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
