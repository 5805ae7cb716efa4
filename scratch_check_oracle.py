"""Scratch: driver-sim compare of search_* Spark queries vs DuckDB oracles."""
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    from apt_search_engine_spark.session import get_spark

    spark = get_spark("oracle-check")
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    qs = entry.queries()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "orders", "customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    names = sys.argv[1:] or list(oracles)
    for name in names:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        s, o = canon(sdf), canon(odf)
        ok_rows = len(s) == len(o)
        ok_schema = list(s.columns) == list(o.columns)
        ok_vals = ok_rows and ok_schema and s.astype(str).equals(o.astype(str))
        print(f"{name}: rows={ok_rows} ({len(s)}/{len(o)}) schema={ok_schema} vals={ok_vals}")
        if not ok_vals:
            print("SPARK:\n", s.head(12))
            print("ORACLE:\n", o.head(12))


if __name__ == "__main__":
    main()
