"""Distributed inverted-index build (SURVEY.md section 3.2 Spark lifecycle).

Replaces the reference's thread-pool indexer loop
(server/src/main/java/Indexer/Indexer.java:102-204 — fetch batch, analyze
per doc, per-term Mongo upserts, mark isIndexed) with a 3-stage Spark job:

  stage 1  ANALYZE (narrow, resumable): transcripts -> flat posting rows
           (doc_id, term, tf, positions, tags) via the vectorized analyzer
           inside mapInPandas. Output lands partitioned by a deterministic
           doc-batch id; a lineage row marks each completed batch, so a
           restarted build skips analyzed batches — the Spark analogue of
           the reference's `isIndexed` flag + batch resume
           (DBManager.java:177-212, 319-325), with Parquet directories
           standing in for Iceberg snapshots (no Iceberg runtime jar in
           this environment; layout is Iceberg-compatible).

  stage 2  MERGE (one shuffle): salted two-level aggregation by term.
           Zipfian head terms make a naive groupBy(term) hot-spot, so
           stage A groups by (term, salt=pmod(xxhash64(doc_id), S)) with
           map-side partial aggregation, stage B merges the <=S partials
           per term — SURVEY.md section 4.2 item 1. Postings are sorted by
           doc_id; df = posting count (true document frequency, what the
           reference reads as postings-map size, Ranker.java:194).

  stage 3  WRITE: postings directory-partitioned by
           term_bucket = pmod(xxhash64(term), N) so query-time term lookup
           prunes to |terms| buckets; per-bucket lineage metrics appended.

The per-term Mongo upsert pattern (DBManager.java:214-302, one round trip
per (term, doc)) is the reference's main scalability bug and is deliberately
NOT reproduced: each build writes every posting exactly once.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from apt_search_engine_spark.analysis.analyzer import analyze_batch
from apt_search_engine_spark.config import (
    DEFAULT_SALT,
    N_TERM_BUCKETS,
    doc_id_expr,
)

ANALYZED_SCHEMA = (
    "doc_id string, term string, tf double, "
    "positions array<int>, tags array<string>"
)

# Q11: the reference's title channel processes the literal string "title"
# (Tokenizer.java:143), never the document's real title.
_REF_TITLE_TEXT = "title"


def _analyze_partition(batches):
    for pdf in batches:
        per_doc = analyze_batch(
            pdf["text"],
            title=pd.Series([_REF_TITLE_TEXT] * len(pdf)),
            h1=pdf["role"].reset_index(drop=True),
        )
        rows = []
        for doc_id, postings in zip(pdf["doc_id"], per_doc):
            for p in postings:
                rows.append(
                    (doc_id, p["term"], p["tf"], p["positions"], p["tags"])
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "term", "tf", "positions", "tags"]
        )


def analyze_transcripts(transcripts: DataFrame) -> DataFrame:
    """Stage 1 transform: transcripts -> flat posting rows. Narrow (no
    shuffle); all Python work is Arrow-batched."""
    docs = transcripts.select(
        doc_id_expr().alias("doc_id"), F.col("text"), F.col("role")
    )
    return docs.mapInPandas(_analyze_partition, schema=ANALYZED_SCHEMA)


def merge_postings(flat: DataFrame, salt: int = DEFAULT_SALT) -> DataFrame:
    """Stage 2: salted two-level agg -> one row per term with sorted
    postings and df."""
    entry = F.struct(
        F.col("doc_id"), F.col("tf"), F.col("positions"), F.col("tags")
    ).alias("entry")
    partial = (
        flat.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)))
        .select("term", "salt", entry)
        .groupBy("term", "salt")
        .agg(F.collect_list("entry").alias("partial"), F.count("*").alias("cnt"))
    )
    merged = (
        partial.groupBy("term")
        .agg(
            F.array_sort(F.flatten(F.collect_list("partial"))).alias("postings"),
            F.sum("cnt").cast("int").alias("df"),
        )
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
        )
        .select("term", "df", "postings", "term_bucket")
    )
    return merged


class IndexBuilder:
    """Builds (and resumes) an index at `index_dir` from a transcripts
    DataFrame source."""

    def __init__(self, spark: SparkSession, index_dir: str, n_batches: int = 4,
                 salt: int = DEFAULT_SALT):
        self.spark = spark
        self.index_dir = index_dir
        self.n_batches = n_batches
        self.salt = salt

    # -- paths ------------------------------------------------------------
    @property
    def analyzed_dir(self):
        return os.path.join(self.index_dir, "analyzed")

    @property
    def postings_dir(self):
        return os.path.join(self.index_dir, "postings")

    @property
    def blocks_dir(self):
        return os.path.join(self.index_dir, "blocks")

    @property
    def lineage_dir(self):
        return os.path.join(self.index_dir, "lineage")

    @property
    def meta_path(self):
        return os.path.join(self.index_dir, "meta.json")

    def _completed_batches(self) -> set[int]:
        try:
            lin = self.spark.read.parquet(self.lineage_dir)
        except Exception:
            return set()
        rows = (
            lin.filter(F.col("snapshot_id").startswith("analyzed-"))
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {r.partition_id for r in rows}

    def _append_lineage(self, rows: list[dict]):
        from apt_search_engine_spark.schema import LINEAGE

        self.spark.createDataFrame(rows, LINEAGE).coalesce(1).write.mode(
            "append"
        ).parquet(self.lineage_dir)

    # -- stage 1 ----------------------------------------------------------
    def analyze(self, transcripts: DataFrame, build_id: str,
                only_batches: list[int] | None = None) -> None:
        """Resumable analyze: doc-batches not yet in lineage are analyzed
        and appended under analyzed/batch=<id>/. `only_batches` restricts
        the run (operational partial runs / crash simulation in tests)."""
        done = self._completed_batches()
        with_batch = transcripts.withColumn(
            "batch", F.pmod(F.xxhash64("conv_id"), F.lit(self.n_batches)).cast("int")
        )
        for b in range(self.n_batches):
            if b in done or (only_batches is not None and b not in only_batches):
                continue
            t0 = time.time()
            part = with_batch.filter(F.col("batch") == b).drop("batch")
            flat = analyze_transcripts(part)
            out = os.path.join(self.analyzed_dir, f"batch={b}")
            flat.write.mode("overwrite").parquet(out)
            stats = self.spark.read.parquet(out).agg(
                F.count("*").alias("n"),
                F.min("doc_id").alias("dlo"),
                F.max("doc_id").alias("dhi"),
                F.min("term").alias("tlo"),
                F.max("term").alias("thi"),
            ).collect()[0]
            self._append_lineage(
                [
                    {
                        "build_id": build_id,
                        "partition_id": b,
                        "term_lo": stats.tlo,
                        "term_hi": stats.thi,
                        "doc_lo": stats.dlo,
                        "doc_hi": stats.dhi,
                        "n_rows": stats.n or 0,
                        "n_postings": stats.n or 0,
                        "build_ms": int((time.time() - t0) * 1000),
                        "snapshot_id": f"analyzed-{b}",
                    }
                ]
            )

    # -- stages 2+3 -------------------------------------------------------
    def merge_and_write(self, build_id: str) -> None:
        t0 = time.time()
        flat = self.spark.read.parquet(self.analyzed_dir)
        postings = merge_postings(flat, self.salt)
        postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
            self.postings_dir
        )
        # per-bucket lineage metrics from the written table
        written = self.spark.read.parquet(self.postings_dir)
        stats = (
            written.groupBy("term_bucket")
            .agg(
                F.min("term").alias("tlo"),
                F.max("term").alias("thi"),
                F.count("*").alias("n_terms"),
                F.sum("df").alias("n_postings"),
                F.min(F.expr("postings[0].doc_id")).alias("dlo"),
                F.max(F.expr("element_at(postings, -1).doc_id")).alias("dhi"),
            )
            .collect()
        )
        ms = int((time.time() - t0) * 1000)
        self._append_lineage(
            [
                {
                    "build_id": build_id,
                    "partition_id": int(r.term_bucket),
                    "term_lo": r.tlo,
                    "term_hi": r.thi,
                    "doc_lo": r.dlo,
                    "doc_hi": r.dhi,
                    "n_rows": int(r.n_terms),
                    "n_postings": int(r.n_postings),
                    "build_ms": ms,
                    "snapshot_id": f"postings-{build_id}",
                }
            for r in stats
            ]
        )

    def write_doc_meta(self, transcripts: DataFrame) -> None:
        """Forward store for result assembly (S9): doc_id, url, title
        (<- tool per the FIXTURES.md adapter), ps (sentence-split text —
        the reference's paragraph list analog for snippets)."""
        meta = transcripts.select(
            doc_id_expr().alias("doc_id"),
            doc_id_expr().alias("url"),
            F.col("tool").alias("title"),
            F.when(
                F.length(F.coalesce(F.col("text"), F.lit(""))) > 0,
                F.split(F.col("text"), r"(?<=[.!?])\s+"),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("ps"),
        )
        meta.write.mode("overwrite").parquet(
            os.path.join(self.index_dir, "doc_meta")
        )

    def build(self, transcripts: DataFrame, with_blocks: bool = True) -> str:
        """Full (resumable) build. Returns the build id."""
        build_id = uuid.uuid4().hex[:12]
        n_docs = transcripts.count()
        self.analyze(transcripts, build_id)
        self.merge_and_write(build_id)
        self.write_doc_meta(transcripts)
        if with_blocks:
            from apt_search_engine_spark.indexing.blocks import write_blocks

            write_blocks(self.spark, self.postings_dir, self.blocks_dir)
        with open(self.meta_path, "w") as f:
            json.dump({"build_id": build_id, "n_docs": n_docs}, f)
        return build_id
