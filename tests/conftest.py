"""Shared fixtures: one local SparkSession, one small deterministic corpus,
one built index, one oracle engine — session-scoped (builds are the slow
part)."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("APTSE_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from apt_search_engine_spark.session import get_spark

    s = get_spark("aptse-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


N_CONVS = 60  # ~1.5k turns


@pytest.fixture(scope="session")
def corpus_pdf():
    from apt_search_engine_spark.corpus import gen_corpus_pandas

    return gen_corpus_pandas(N_CONVS)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    from apt_search_engine_spark.schema import TRANSCRIPTS

    return spark.createDataFrame(corpus_pdf, TRANSCRIPTS)


@pytest.fixture(scope="session")
def index_dir(spark, corpus_df, tmp_path_factory):
    from apt_search_engine_spark.indexing.build import IndexBuilder

    d = str(tmp_path_factory.mktemp("index"))
    IndexBuilder(spark, d, n_batches=2).build(corpus_df, with_blocks=True)
    return d


@pytest.fixture(scope="session")
def engine(spark, index_dir):
    from apt_search_engine_spark.query.engine import SearchEngine

    return SearchEngine(spark, index_dir)


@pytest.fixture(scope="session")
def oracle(corpus_pdf):
    from tests.oracle import OracleEngine, adapt_rows

    return OracleEngine(adapt_rows(corpus_pdf.to_dict("records")))
