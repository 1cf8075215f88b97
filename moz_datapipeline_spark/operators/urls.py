"""URL canonicalization for crawl-scale corpus dedup.

Crawl corpora arrive keyed by URL, and the same page surfaces under
dozens of spellings — scheme/host case, default ports, ``www.``,
trailing slashes, fragments, tracking parameters, query-parameter
order.  Canonicalizing BEFORE content dedup removes the bulk of the
exact-duplicate mass with a string projection instead of a
text-hash shuffle, and gives a stable join key for crawl-index
(CDX-style) lookups.

Everything here is pure JVM column expressions (regex + higher-order
array functions) — zero UDFs, so the canonical key participates in
whole-stage codegen and the follow-up dedup groupBy is the only
shuffle.  The rules are the standard crawl-normalization set
(RFC 3986 §6 syntax-based normalization plus the usual tracker-param
strip); each is replayable in ANSI-ish SQL, which is how the
``url_canonical`` query's DuckDB oracle verifies values.

Reference parity: extension operator (the reference pipeline is not
web-crawl-keyed); sibling of ``dedup.exact_dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_host", "dedup_by_url"]

# key= prefixes dropped from query strings: the common cross-site
# tracking parameters (never content-addressing)
_TRACKER_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_url(
    url: Column | str,
    drop_www: bool = True,
    drop_trackers: bool = True,
) -> Column:
    """Syntax-canonical form of an absolute URL.

    Rules (in order): strip fragment; lowercase scheme and host;
    drop the scheme's default port (``:80`` http, ``:443`` https);
    optionally drop a leading ``www.``; empty path → ``/``; strip one
    trailing slash from non-root paths; drop tracking parameters and
    sort the remaining query parameters (full ``k=v`` byte sort, the
    stable dedup-key convention); empty query → no ``?``.

    Inputs without a ``scheme://`` are returned trimmed but otherwise
    untouched — relative references carry no host to normalize, and
    guessing one would merge distinct keys.
    """
    u = F.regexp_replace(F.trim(_col(url)), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    if drop_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & (~p.rlike(_TRACKER_RE) if drop_trackers else F.lit(True)),
    )
    canon_q = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.when(scheme == "", F.trim(_col(url))).otherwise(
        F.concat(scheme, F.lit("://"), host, path, canon_q)
    )


def url_host(url: Column | str, drop_www: bool = True) -> Column:
    """Lowercased host (no port) of an absolute URL — the grouping key
    for per-domain caps (``corpus.cap_per_group``) and host-level
    stats.  Registrable-domain extraction needs the public-suffix
    list; at this layer the host itself is the honest key."""
    u = F.trim(_col(url))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?:]*)", 1))
    if drop_www:
        host = F.regexp_replace(host, r"^www\.", "")
    # no scheme → no authority component: '' is the honest answer,
    # not the first path segment
    return F.when(u.rlike(_SCHEME_RE), host).otherwise(F.lit(""))


def dedup_by_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One survivor per canonical URL: ``(canonical_url, keep_id,
    n_dups)`` — ``exact_dedup``'s shape with the canonical key instead
    of a content hash.  One map-side-combined hash aggregation; the
    canonicalization itself is a narrow projection."""
    return (
        df.select(
            canonicalize_url(url_col).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )
