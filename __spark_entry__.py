"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: adapt sf0.001 `documents` into the transcript
                shape, build an in-memory inverted index with the full
                engine pipeline (analyzer UDF -> salted term agg) and run a
                ranked top-k search.
queries()     — operator inventory: SQL-expressible ops are paired with
                DuckDB oracles in apt_search_engine_spark/extras/docops.py;
                the Porter-stemmed full-engine paths (not SQL-expressible)
                are exposed as rows-only checks and verified rank-identical
                against the pure-Python oracle in tests/ instead.
oracle_sql()  — the DuckDB SQL side of each paired operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _adapt_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> transcripts shape
    (conv_id, turn_idx, role, text, tool, ts): one conversation per source,
    turns ordered by doc_id — deterministic."""
    from pyspark.sql import Window

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    return d.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


_ENGINE_CACHE: dict[str, object] = {}


def _engine_over(spark: SparkSession, sf_dir: str):
    from apt_search_engine_spark.query.engine import SearchEngine

    if sf_dir not in _ENGINE_CACHE:
        _ENGINE_CACHE[sf_dir] = SearchEngine.over_transcripts(
            spark, _adapt_documents(spark, sf_dir)
        )
    return _ENGINE_CACHE[sf_dir]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    eng = _engine_over(spark, "/root/testdata/sf0.001")
    return eng.search_df("table scan query", k=10)


def _search_q(query: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine_over(spark, sf_dir).search_df(query, k=10)

    return run


def _simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apt_search_engine_spark.extras.dedup import simhash64

    return simhash64(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    from apt_search_engine_spark.extras.docops import SPARK_QUERIES

    q: dict[str, Callable] = dict(SPARK_QUERIES)
    # full-engine paths (Porter stemming not SQL-expressible -> rows-only
    # driver check; rank-identity is proven vs tests/oracle.py instead)
    q["search_normal_topk"] = _search_q("table scan query")
    q["search_phrase_topk"] = _search_q('"table hash"')
    q["search_boolean_topk"] = _search_q('"table hash" AND merge')
    q["simhash64"] = _simhash_q
    return q


def oracle_sql() -> dict[str, str]:
    from apt_search_engine_spark.extras.docops import ORACLE_SQL

    return dict(ORACLE_SQL)
