"""The flagship search_* DuckDB oracles (extras/search_oracle.py) agree
with the full Spark engine — rows, schema, values, and bit-exact
unrounded scores — on the sf0.001 driver corpus.

This is the repo-side guard for the driver's CORRECTNESS gate: the same
generated SQL (stem map embedded as VALUES) runs in DuckDB against the
raw documents table, while the Spark side goes through the whole engine
(analyzer UDF -> postings -> lexicon -> ranked top-k)."""

from __future__ import annotations

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="driver testdata not present",
)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracles():
    from apt_search_engine_spark.extras.search_oracle import build_search_oracles

    return build_search_oracles(SF)


@pytest.fixture(scope="module")
def driver_engine(spark):
    import __spark_entry__ as entry

    return entry._engine_over(spark, SF)


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "search_normal_topk",
        "search_phrase_topk",
        "search_boolean_topk",
        "search_wand_topk",
        "search_snippets_topk",
        "search_prior_topk",
        "search_deleted_topk",
        "search_deleted_wand_topk",
        "search_bm25_topk",
    ],
)
def test_search_entry_matches_duckdb_oracle(spark, oracles, oracle_con, name):
    import __spark_entry__ as entry

    sdf = _canon(entry.queries()[name](spark, SF).toPandas())
    odf = _canon(oracle_con.execute(oracles[name]).fetchdf())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    assert sdf.astype(str).equals(odf.astype(str)), (
        f"{name} values diverge:\nspark:\n{sdf}\noracle:\n{odf}"
    )


def test_unrounded_scores_bit_exact(driver_engine, oracles, oracle_con):
    """Top-k membership is decided on unrounded scores; both engines must
    produce bit-identical doubles (same IEEE op order), or a rounded hash
    match would be luck rather than parity."""
    from apt_search_engine_spark.extras.search_oracle import NORMAL_QUERY

    sql = oracles["search_normal_topk"]
    sql = sql[: sql.rindex("\nSELECT doc_id")] + "\nSELECT doc_id, score FROM topk"
    oracle = {r[0]: r[1] for r in oracle_con.execute(sql).fetchall()}
    rows = driver_engine.search_df(NORMAL_QUERY, k=10).collect()
    assert rows, "flagship query returned no rows"
    for r in rows:
        assert oracle.get(r.doc_id) == r.score, (
            r.doc_id,
            repr(r.score),
            repr(oracle.get(r.doc_id)),
        )


def test_tag_channels_are_discriminative(spark, driver_engine):
    """r4 VERDICT missing #1: tag/field scoring must be NON-VACUOUS in
    the gate. The md5-rule role channel assigns h1 tags that actually
    change wtf (some posting scores differ from the all-body fold), the
    fielded h1 query returns real rows, and the tool-fed title index
    ranks the flagship query differently from the shared index."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    # fielded h1 search: non-empty and a strict subset of the unfielded
    # match set
    fielded = entry._field_q(spark, SF).collect()
    assert fielded
    from apt_search_engine_spark.extras.search_oracle import FIELD_QUERY

    all_match = driver_engine.match_count_df(FIELD_QUERY).collect()[0].n_matches
    assert 0 < len(fielded) <= all_match
    field_full = driver_engine.search_field_df(
        "h1", FIELD_QUERY, k=10**6
    ).count()
    assert 0 < field_full < all_match, "h1 restriction must discriminate"

    # h1 tags exist on the shared index (role words overlap the vocab)
    ex = driver_engine._exploded(["tabl"], with_field="h1")
    assert ex.filter(F.col("n_field") > 0).count() > 0

    # title index reorders the flagship query vs the shared index
    from apt_search_engine_spark.extras.search_oracle import (
        TITLE_WEIGHT_QUERY,
    )

    shared = [
        r.doc_id
        for r in driver_engine.search_df(TITLE_WEIGHT_QUERY, k=10).collect()
    ]
    titled = [
        r.doc_id for r in entry._title_weight_q(spark, SF).collect()
    ]
    assert titled and titled != shared, "title weight must reorder"
