"""Single-query parity check: run one (or more) named queries() entries on
Spark AND DuckDB at a scale dir and compare with the driver-style
canonicalisation. Fast iteration companion to tools/parity_sweep.py.

Usage: python tools/parity_one.py name [name ...] [--sf SF_DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from tools.parity_sweep import TABLES, canon  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    from osmgraft.session import get_spark

    spark = get_spark("parity_one")
    import __spark_entry__ as entry

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    qs, osql = entry.queries(), entry.oracle_sql()
    rc = 0
    for name in args:
        t0 = time.perf_counter()
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in osql:
            print(f"{name}: rows-only rows={len(sdf)}")
            print(sdf.head(12).to_string())
            continue
        ddf = con.sql(osql[name]).df()
        s, d = canon(sdf), canon(ddf)
        ok = (
            s.shape == d.shape
            and list(s.columns) == list(d.columns)
            and pd.util.hash_pandas_object(s).sum()
            == pd.util.hash_pandas_object(d).sum()
        )
        print(
            f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={len(s)} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        if not ok:
            rc = 1
            print("spark:")
            print(s.head(20).to_string())
            print("duck:")
            print(d.head(20).to_string())
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
