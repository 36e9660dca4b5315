"""URL canonicalization for web-crawl dedup pipelines.

The standard pre-dedup normalization over Common-Crawl-style corpora:
two fetches of the same page routinely differ only in scheme/host
case, a default port, a fragment, tracking parameters, or query-param
order — canonicalizing first turns those into EXACT duplicates that
the one-shuffle hash dedup (`dedup.exact_dup_groups`) removes, so the
expensive near-dup passes (MinHash/SimHash) see a smaller corpus.

Everything here is JVM column expressions (regexp_extract /
higher-order filter / array_sort) — no Python in the plan, and every
regex is kept inside the Java-regex ∩ RE2 common syntax (no
lookaround, no backrefs) so DuckDB oracles mirror the patterns
verbatim, same policy as `functions/pii.py`.

Reference context: SeekStorm ingests pre-extracted documents and does
not normalize URLs (ingest.rs); this module is part of the
beyond-reference training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one param = "key" or "key=value"; tracking params carry no content
# identity and are dropped before sorting
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|ref_src)(=[^&]*)?$"

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL, as one JVM expression.

    Steps (each mirrored verbatim by the DuckDB oracle):

    1. trim; strip the fragment (``#…``).
    2. lowercase the scheme and the host (path/query case is
       significant and preserved).
    3. drop default ports (http:80, https:443); keep explicit others.
    4. split the query on ``&``, drop empty and tracking params
       (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``ref_src``),
       byte-sort the rest, re-join.
    5. empty path becomes ``/``.

    Strings without a ``scheme://`` prefix are returned trimmed and
    fragment-stripped but otherwise untouched (relative URLs carry no
    authority to normalize).
    """
    c = F.col(url) if isinstance(url, str) else url
    s = F.regexp_replace(F.trim(c), "#.*$", "")
    scheme = F.lower(F.regexp_extract(s, SCHEME_RE, 1))
    rest = F.regexp_replace(s, SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    portpart = (
        F.when(port == "", "")
        .when((scheme == F.lit("http")) & (port == "80"), "")
        .when((scheme == F.lit("https")) & (port == "443"), "")
        .otherwise(F.concat(F.lit(":"), port))
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qjoin = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        F.when(path == "", "/").otherwise(path),
        F.when(qjoin == "", "").otherwise(F.concat(F.lit("?"), qjoin)),
    )
    return F.when(scheme == "", s).otherwise(canon)


def url_host(url: Column | str) -> Column:
    """Lowercased host of an absolute URL ('' when scheme-less) —
    the partition/groupBy key for per-site statistics and crawl
    politeness buckets."""
    c = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(F.trim(c), SCHEME_RE, "")
    has_scheme = F.regexp_extract(F.trim(c), SCHEME_RE, 1) != ""
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    return F.when(
        has_scheme, F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    ).otherwise(F.lit(""))
