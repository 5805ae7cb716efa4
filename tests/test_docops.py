"""Cross-check every docops operator: Spark result == DuckDB oracle SQL,
replicating the driver's row-count + column-name + order-insensitive value
comparison, at sf0.001 (fast) — the driver runs the same pairs at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

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
