"""URL canonicalization as one JVM expression chain (RFC 3986 §6.2
case/default-port/dot-segment normalization + the curation-standard
tracking-param strip and query-param sort).

Everything is built from ``pyspark.sql.functions`` regexp/array
expressions — a pure projection, whole-stage-codegen'd, shuffle-free,
no Python in the hot path — with patterns restricted to Java-regex /
RE2-identical constructs so the DuckDB driver oracle can mirror the
chain string-for-string (see __spark_entry__._ORACLE_SQL
["url_normalize"]).

Dot-segment resolution is BOUNDED: ``/./`` and ``segment/..`` each
resolve in two regexp passes, which covers chains up to depth 2
(``/a/b/../../c``).  tests/test_url_normalize.py pins the chain
against a genuine RFC 3986 §5.2.4 remove_dot_segments reference and
documents the bound; production inputs with deeper chains route to an
Arrow kernel (or add passes — each pass is one more codegen'd
projection, still shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters stripped during canonicalization
TRACKING_PREFIX = "utm_"

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"


def url_norm_cols(url: Column) -> dict:
    """Decompose + normalize a URL column; returns the Columns
    {scheme, host, path, query, url_norm}."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(url, _PATH, 1)
    path = F.when(path == "", "/").otherwise(path)
    path = F.regexp_replace(path, "/{2,}", "/")
    for _ in range(2):
        path = F.regexp_replace(path, r"/\.(/|$)", "/")
    for _ in range(2):
        path = F.regexp_replace(path, r"/[^/]+/\.\.(/|$)", "/")
    query = F.regexp_extract(url, _QUERY, 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (~x.startswith(TRACKING_PREFIX)) & (x != F.lit("")),
    )
    query_n = F.array_join(F.array_sort(kept), "&")
    url_norm = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query_n == "", "").otherwise(F.concat(F.lit("?"), query_n)),
    )
    return {
        "scheme": scheme, "host": host, "path": path,
        "query": query_n, "url_norm": url_norm,
    }


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 reference implementation (tests only): the
    ground truth the bounded regex chain is pinned against."""
    out: list = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1)
            seg, buf = (buf, "") if i < 0 else (buf[:i], buf[i:])
            out.append(seg)
    return "".join(out)
