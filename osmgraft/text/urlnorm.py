"""URL normalisation as a reusable Column transform.

The crawl-frontier hygiene rules every web pipeline applies before url
keying (dedup, recency election, host rollups):

- scheme + host case-folded to lower case
- default ports dropped (``:443`` for https, ``:80`` for http)
- fragment stripped (never sent to the server)
- ``utm_*`` tracking parameters removed; a fully-emptied query string
  drops its ``?``
- trailing ``&``/``?`` tidied after parameter removal

Pure ``pyspark.sql.functions`` regex ops — per-row JVM work, no UDF, no
shuffle; safe to apply in the scan projection of a 10^12-row crawl table.
The transform is idempotent (normalising a normalised url is the identity
— property-tested over an exhaustive component grid in
tests/test_urlnorm.py), which is what makes it a legal pre-keying step:
re-running a pipeline stage over already-normalised urls cannot re-key
rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST_RE = r"^(https?://[^/:?#]+)"
_PORT_RE = r"^(https?)(://[^/:?#]+):([0-9]+)"
_UTM_RE = r"utm_[A-Za-z0-9_]+=[^&#]*&?"


def normalize_url_col(url: Column | str) -> Column:
    """Normalised form of ``url`` (see module docstring for the rules)."""
    c = F.col(url) if isinstance(url, str) else url
    # 1. fragment off first — later regexes then never see '#'
    c = F.regexp_replace(c, r"#.*$", "")
    # 2. case-fold scheme+host only (path/query stay case-sensitive)
    c = F.concat(
        F.lower(F.regexp_extract(c, _SCHEME_HOST_RE, 1)),
        F.regexp_replace(c, _SCHEME_HOST_RE, ""),
    )
    # 3. default ports (scheme-aware)
    c = F.when(
        F.regexp_extract(c, _PORT_RE, 1) == "https",
        F.regexp_replace(c, r"^(https://[^/:?#]+):443(?=[/?#]|$)", "$1"),
    ).otherwise(
        F.regexp_replace(c, r"^(http://[^/:?#]+):80(?=[/?#]|$)", "$1")
    )
    # 4. tracking params + tidy the separators they leave behind
    c = F.regexp_replace(c, _UTM_RE, "")
    c = F.regexp_replace(c, r"[?&]$", "")
    return c
