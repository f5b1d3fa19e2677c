"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle is run on Spark AND DuckDB at sf0.01 and compared on
row count + column names + order-insensitive value hash."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_CORRECT

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) in ("Int64", "int32", "uint64"):
            df[c] = df[c].astype("float64")  # unify nullable/int widths
        elif str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _pairs():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    return [(name, qs[name], os_.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_match(spark, name, fn, sql):
    sdf = fn(spark, SF_CORRECT).toPandas()
    if sql is None:
        assert sdf is not None  # rows-only: runs and returns a frame
        return
    con = _duck(SF_CORRECT)
    ddf = con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} != {len(ddf)}"
    a, b = _canon(sdf), _canon(ddf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6,
                                  obj=name)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
