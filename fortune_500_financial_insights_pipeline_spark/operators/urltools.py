"""URL canonicalization for crawl-frontier and fetch dedup — the stage
BEFORE html.py's extraction in a web corpus pipeline: the same page is
typically reachable under many raw URLs (case-variant hosts, explicit
default ports, tracking parameters, shuffled query order, fragments),
and deduplicating fetches requires a canonical form.

Everything is pure JVM column expressions — regexp field extraction +
higher-order array ops, no UDF, whole-stage-codegen friendly — so the
canonicalization runs at scan speed and the oracle can replay it in
SQL. Rules (the conservative, always-safe subset of RFC 3986
normalization + the industry tracking-param strip):

* scheme and host lowercased;
* explicit default port stripped (``:80`` for http, ``:443`` for https);
* fragment dropped;
* empty path becomes ``/``;
* query parameters: tracking params removed (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``), the rest SORTED byte-wise and rejoined — query
  order never changes the resource for GET endpoints that matter for
  corpus crawling, and sorting makes equality checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonicalize_url(url) -> Column:
    """Canonical form of a URL string column (see module rules)."""
    c = url if isinstance(url, Column) else F.col(url)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    pathq = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.concat_ws("&", F.array_sort(params))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def url_host(url) -> Column:
    """Lowercased host without port — the domain-level grouping key for
    per-site caps and blocklists."""
    c = url if isinstance(url, Column) else F.col(url)
    hostport = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return F.regexp_replace(hostport, r":\d+$", "")
