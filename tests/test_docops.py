"""Cross-check every docops operator: Spark result == DuckDB oracle SQL,
replicating the driver's row-count + column-name + order-insensitive value
comparison, at sf0.001 (fast) — the driver runs the same pairs at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from apt_search_engine_spark.extras.docops import ORACLE_SQL, SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            if isinstance(v, bool):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_docop_matches_duckdb(spark, duck, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLE_SQL[name])
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), name
    assert len(srows) == len(drows), f"{name}: spark={len(srows)} duck={len(drows)}"
    sn, dn = _norm(srows, scols), _norm(drows, dcols)
    mismatches = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mismatches, f"{name}: first mismatch {sn[mismatches[0]]} != {dn[mismatches[0]]}"


def test_winnowing_guarantee_shared_run_shares_a_fingerprint(spark, tmp_path):
    """The winnowing property (Schleimer et al. 2003): two documents
    sharing a run of >= k+w-1 admitted tokens must share at least one
    selected fingerprint. Planted-run fixture run through the actual
    Spark operator (k=3, w=4 -> any shared 6-token run is detected)."""
    from apt_search_engine_spark.extras.docops import (
        _WINNOW_K,
        _WINNOW_W,
        q_winnow_fingerprint,
    )

    shared = "zebra quantum fjord waltz nymph glyph"  # 6 admitted tokens
    assert len(shared.split()) == _WINNOW_K + _WINNOW_W - 1
    docs = [
        (1, f"alpha bravo charlie {shared} delta echo foxtrot"),
        (2, f"golf hotel india juliet kilo {shared} lima mike"),
        (3, "november oscar papa quebec romeo sierra tango uniform victor"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    fp = q_winnow_fingerprint(spark, sf)
    by_doc = {
        i: {r.fingerprint for r in fp.filter(F.col("doc_id") == i).collect()}
        for i, _ in docs
    }
    assert by_doc[1] & by_doc[2], "shared 6-token run produced no shared fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_stream_sessionize_batch_boundary_invariance(spark, tmp_path):
    """The interval-merge state is a commutative summary: draining the
    SAME events as one micro-batch and as many must finalize to
    identical session sets."""
    from apt_search_engine_spark.streaming.windows import (
        finalize_sessions,
        run_sessions_drain,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts"
    )
    finals = []
    for tag, nfiles, per_trigger in (("one", 1, None), ("many", 5, 1)):
        inp = str(tmp_path / f"in_{tag}")
        src.repartition(nfiles).write.parquet(inp)
        got = run_sessions_drain(
            spark,
            inp,
            str(tmp_path / f"ck_{tag}"),
            str(tmp_path / f"out_{tag}"),
            max_files_per_trigger=per_trigger,
        )
        finals.append(
            {
                (r.user_id, r.start_us, r.end_us, r.n_events)
                for r in finalize_sessions(got).collect()
            }
        )
    assert finals[0] == finals[1] and finals[0]


def test_range_join_bucket_equals_naive_inequality_join(spark):
    """range_join_by_bucket must equal the naive (nested-loop) BETWEEN
    join on a fixture whose intervals span zero, one, and MANY buckets —
    the interval-explosion path the driver entry's within-bucket promo
    windows never exercises."""
    from apt_search_engine_spark.extras.docops import range_join_by_bucket

    pts = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(200)], "pid long, t long"
    )
    iv = spark.createDataFrame(
        [
            (0, 5, 5),        # empty (no point inside unless t==5)
            (1, 10, 12),      # within one bucket
            (2, 95, 310),     # spans 3+ buckets (bucket=100)
            (3, 0, 999),      # spans everything
            (4, 700, 700),    # degenerate point interval
        ],
        "iid long, s long, e long",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_by_bucket(
            pts, "t", iv, "s", "e", bucket_us=100
        ).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in pts.crossJoin(iv)
        .filter("t >= s AND t <= e")
        .collect()
    }
    assert got == want and want


def test_kmv_estimate_is_close_to_exact(spark, tmp_path):
    """KMV sanity on a known-cardinality corpus: with k=64 the standard
    error is ~1/sqrt(k-2) = 13%, so the (deterministic, seeded-hash)
    estimate must land within 35% of the true distinct count when
    n >> k, and be EXACT when n < k (sketch holds the whole set)."""
    from apt_search_engine_spark.extras.docops import q_kmv_distinct

    docs = [
        # 'big': 600 distinct tokens spread over docs
        *[
            (i, " ".join(f"tok{j}" for j in range(i * 30, i * 30 + 30)), "en", "big", 0)
            for i in range(20)
        ],
        # 'small': 10 distinct tokens (< k -> exact fallback)
        (100, " ".join(f"w{j}" for j in range(10)), "en", "small", 0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    got = {r.source: r for r in q_kmv_distinct(spark, sf).collect()}
    assert got["big"].exact_distinct == 600
    assert abs(got["big"].kmv_estimate - 600) / 600 < 0.35
    assert got["small"].exact_distinct == 10
    assert got["small"].kmv_estimate == 10.0  # exact fallback branch


def test_bpe_token_counts_on_whitespace_heavy_text(spark, tmp_path, duck):
    """Pin the regex-literal escaping fix: newline/tab/multi-space runs
    must NOT count as BPE punctuation tokens (an F.expr SQL string
    literal had eaten the pattern's backslash, turning [^a-z0-9\\s] into
    [^a-z0-9s]). Spark must agree with the DuckDB oracle pattern on
    text the driver corpus never exercises (it is single-spaced)."""
    from apt_search_engine_spark.extras.docops import q_bpe_token_counts

    docs = [
        (1, "x   y", "en", "s", 0),
        (2, "tab\there\nnew line, punct!!", "en", "s", 0),
        (3, "", "en", "s", 0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: r.n_bpe_tokens for r in q_bpe_token_counts(spark, sf).collect()}
    want = {
        d: duck.sql(
            "SELECT len(regexp_extract_all(lower(?), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+'))",
            params=[t],
        ).fetchone()[0]
        for d, t, *_ in docs
    }
    assert got == want
    assert got[1] == 2  # the space run between x and y is not a token


def test_minhash_pairs_no_self_pairs_on_duplicate_doc_ids(spark):
    """An input frame holding the same doc_id twice (upstream union
    without dedup) must not emit (d, d) self-pairs — the old self-join's
    strict doc_a < doc_b guaranteed that, and the bucket-grouping
    rewrite must too."""
    from apt_search_engine_spark.extras.docops import minhash_pairs_df

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (1, text), (2, text)], "doc_id long, text string"
    )
    pairs = minhash_pairs_df(docs).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
