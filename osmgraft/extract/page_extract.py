"""Text → feature extraction over Common-Crawl-style pages.

The reference ingests pre-structured OSM tags; the rebuilt engine's input is
web pages (BASELINE.json input_hint), so the tag columns are *extracted* from
`text` with a vectorized pandas/Arrow stage (`mapInPandas`, no per-row
Python). The per-row invariant — `text` passes through byte-identical per
`url` — is asserted by tests (SURVEY.md §5).

The extractor is deliberately regex/split-based and deterministic; it parses
the `key=value | ...` microformat the synthetic generator embeds, standing in
for a production entity-extraction model.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, "
    "name string, operator string, addr_postcode string, "
    "x double, y double, landuse string, geom_kind string, "
    "tags map<string,string>"
)

_LOC_RE = r"loc=\(([-\d.]+),([-\d.]+)\)"


def _extract_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        if len(pdf) == 0:
            continue
        t = pdf["text"]
        # vectorized pandas .str ops (Arrow batch in, Arrow batch out)
        parts = t.str.split(" | ", regex=False)
        name = parts.str[0]
        operator = t.str.extract(r"operator=([^|]*?) \|", expand=False).str.strip()
        postcode = t.str.extract(r"postcode=([^|]*?) \|", expand=False).str.strip()
        loc = t.str.extract(_LOC_RE)
        landuse = t.str.extract(r"landuse=([^|]*?) \|", expand=False).str.strip()
        kind = t.str.extract(r"kind=(\w+)", expand=False)
        tail = parts.str[-1]

        def parse_tags(s) -> dict:
            # NULL text rows reach here as NaN through the .str chain —
            # a crawl row with no extracted text must not kill the task
            # (round-2 fix)
            if not isinstance(s, str):
                return {}
            out = {}
            for tok in s.split(" "):
                if "=" in tok:
                    k, _, v = tok.partition("=")
                    out[k] = v
            return out

        tags = tail.map(parse_tags)
        yield pd.DataFrame({
            "url": pdf["url"],
            "warc_ts": pdf["warc_ts"],
            "text": pdf["text"],  # byte-identical pass-through (invariant)
            "lang": pdf["lang"],
            "name": name.where(name != "Unknown Business", None),
            "operator": operator.replace("", np.nan),
            "addr_postcode": postcode.where(postcode != "N/A", None),
            "x": pd.to_numeric(loc[0], errors="coerce"),
            "y": pd.to_numeric(loc[1], errors="coerce"),
            "landuse": landuse.replace("", np.nan),
            "geom_kind": kind,
            "tags": tags,
        })


def extract_features(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → feature columns + original text."""
    return pages.mapInPandas(_extract_batch, schema=FEATURE_SCHEMA)
