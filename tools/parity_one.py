"""Parity-check a subset of queries by name: python tools/parity_one.py name1 name2 [--sf DIR]"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

from tools.parity_sweep import TABLES, canon


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    from osmgraft.session import get_spark

    spark = get_spark("parity_one")
    import __spark_entry__ as entry

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    qs, osql = entry.queries(), entry.oracle_sql()
    fail = 0
    for name in names:
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in osql:
            print(f"{name}: rows-only rows={len(sdf)}")
            continue
        ddf = con.sql(osql[name]).df()
        s, d = canon(sdf), canon(ddf)
        ok = (
            s.shape == d.shape
            and list(s.columns) == list(d.columns)
            and pd.util.hash_pandas_object(s).sum() == pd.util.hash_pandas_object(d).sum()
        )
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={len(s)}")
        if not ok:
            fail += 1
            print("spark:\n", s.head(10))
            print("duck:\n", d.head(10))
    return fail


if __name__ == "__main__":
    raise SystemExit(main())
