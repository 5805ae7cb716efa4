"""Pure-Python XXH64 parity with Spark's xxhash64 expression (seed 42):
the engine's query-time bucket pruning depends on bit-identity."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from apt_search_engine_spark.config import N_TERM_BUCKETS
from apt_search_engine_spark.functions.xxhash import spark_xxhash64, term_bucket


def test_xxhash64_matches_spark(spark):
    rng = random.Random(7)
    terms = ["", "a", "ab", "abcd", "abcdefg", "abcdefgh", "travel", "guid",
             "x" * 31, "y" * 32, "z" * 33, "w" * 100] + [
        "".join(
            rng.choices(string.ascii_lowercase + "éüßшф中文🙂0123456789", k=rng.randint(1, 80))
        )
        for _ in range(400)
    ]
    rows = (
        spark.createDataFrame([(t,) for t in terms], "t string")
        .select(
            "t",
            F.xxhash64("t").alias("h"),
            F.pmod(F.xxhash64("t"), F.lit(N_TERM_BUCKETS)).cast("int").alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert spark_xxhash64(r.t) == r.h, repr(r.t)
        assert term_bucket(r.t, N_TERM_BUCKETS) == r.b, repr(r.t)


def test_engine_bucket_prunes_to_right_partition(spark, engine, index_dir):
    """The pure-Python bucket must find every indexed term's partition."""
    terms = [
        r.term
        for r in spark.read.parquet(f"{index_dir}/postings")
        .select("term", "term_bucket")
        .limit(200)
        .collect()
    ]
    rows = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("term").isin(terms))
        .select("term", "term_bucket")
        .collect()
    )
    for r in rows:
        assert engine._bucket(r.term) == r.term_bucket, r.term
