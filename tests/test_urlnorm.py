"""URL normalisation library surface (osmgraft/text/urlnorm.py):
idempotence + rule properties over an exhaustive component grid, plus
exact expectations on hand-picked cases."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from osmgraft.text.urlnorm import normalize_url_col

SCHEMES = ["https", "http"]
HOSTS = ["EXample-3.Co.UK", "example.com"]
PORTS = ["", ":443", ":80", ":8080"]
PATHS = ["", "/p/1", "/P/Upper"]
QUERIES = [
    "",
    "?id=3",
    "?utm_source=x",
    "?id=3&utm_campaign=x",
    "?utm_a=1&utm_b=2",
    "?utm_a=1&id=2",
]
FRAGS = ["", "#Sec2"]


def _grid():
    for s, h, po, pa, qs, fr in itertools.product(
        SCHEMES, HOSTS, PORTS, PATHS, QUERIES, FRAGS
    ):
        yield f"{s}://{h}{po}{pa}{qs}{fr}"


def test_normalize_is_idempotent_and_clean_on_full_grid(spark):
    urls = list(_grid())
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        normalize_url_col("url").alias("n1"),
        normalize_url_col(normalize_url_col("url")).alias("n2"),
    ).collect()
    assert len(out) == len(urls) > 500
    for r in out:
        # idempotence: the legal-pre-keying-step property
        assert r["n1"] == r["n2"], r["url"]
        # rule properties
        assert "#" not in r["n1"]
        assert "utm_" not in r["n1"]
        assert not r["n1"].endswith(("?", "&"))
        host = r["n1"].split("://")[1].split("/")[0].split("?")[0]
        assert host == host.lower()
        if r["url"].startswith("https"):
            assert ":443" not in r["n1"]
        else:
            assert not host.endswith(":80")
        # non-default ports and path case are preserved
        if ":8080" in r["url"]:
            assert ":8080" in r["n1"]
        if "/P/Upper" in r["url"]:
            assert "/P/Upper" in r["n1"]


def test_normalize_exact_cases(spark):
    cases = {
        "https://EXample.COM:443/p/1?utm_source=a&id=2#frag":
            "https://example.com/p/1?id=2",
        "http://Host.Net:80/x?utm_a=1&utm_b=2":
            "http://host.net/x",
        "https://a.b:8080/P?id=1":
            "https://a.b:8080/P?id=1",
        "https://a.b/": "https://a.b/",
        "http://A.B:443/x": "http://a.b:443/x",  # 443 NOT default for http
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["n"]
        for r in df.select("url", normalize_url_col("url").alias("n")).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, raw


def test_library_normalisation_agrees_with_query_keys(spark):
    """The url_host_rollup query embeds its own (oracle-mirrored)
    normalisation; the library function must produce the same host
    partitioning on the query's synthetic urls."""
    from osmgraft import contract_web as cw
    from tests.conftest import SF_SMOKE

    rows = cw.url_host_rollup(spark, SF_SMOKE).collect()
    hosts_query = {r["host"] for r in rows}
    # rebuild the query's raw urls and push them through the library fn
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    hostnum = (did % 7).cast("string")
    raw = d.select(
        F.concat(
            F.lit("https://"),
            F.when(did % 3 == 0, F.concat(F.lit("EXAMPLE-"), hostnum, F.lit(".CO.UK")))
            .when(did % 3 == 1, F.concat(F.lit("example-"), hostnum, F.lit(".co.uk")))
            .otherwise(F.concat(F.lit("Example-"), hostnum, F.lit(".Co.Uk"))),
            F.when(did % 4 == 0, F.lit(":443"))
            .when(did % 4 == 1, F.lit(":8080"))
            .otherwise(F.lit("")),
            F.lit("/p/"), (did % 50).cast("string"),
            F.when(did % 2 == 0, F.concat(F.lit("#sec"), (did % 4).cast("string")))
            .otherwise(F.lit("")),
        ).alias("url")
    )
    hosts_lib = {
        r["h"]
        for r in raw.select(
            F.regexp_extract(
                normalize_url_col("url"), r"^https://([^/:?#]+)", 1
            ).alias("h")
        )
        .distinct()
        .collect()
    }
    assert hosts_lib == hosts_query
