"""Single-query cross-engine check: like parity_sweep but only the named
queries. Usage: python tools/check_queries.py name1 name2 ... [--sf DIR]"""
import sys

sys.path.insert(0, ".")
import duckdb
import pandas as pd

from tools.parity_sweep import TABLES, canon


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    from osmgraft.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("check_queries")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    qs, osql = entry.queries(), entry.oracle_sql()
    rc = 0
    for name in args:
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in osql:
            print(f"{name}: rows-only rows={len(sdf)}")
            continue
        ddf = con.sql(osql[name]).df()
        s, d = canon(sdf), canon(ddf)
        ok = (
            s.shape == d.shape
            and list(s.columns) == list(d.columns)
            and pd.util.hash_pandas_object(s).sum()
            == pd.util.hash_pandas_object(d).sum()
        )
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={len(s)}")
        if not ok:
            rc = 1
            print("spark:\n", s.head(12))
            print("duck:\n", d.head(12))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
