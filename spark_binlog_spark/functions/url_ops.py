"""URL canonicalization + host statistics — the URL-level dedup/filter
stage web-corpus pipelines (CCNet, RefinedWeb, Gopher's ingestion)
run between WARC ingest and text dedup: the same page fetched as
``HTTP://WWW.Example.COM:80/a?utm_source=x&b=2&a=1#frag`` and
``http://www.example.com/a?a=1&b=2`` must collapse to ONE canonical
key before any content work happens.

Rules implemented (the conservative, semantics-preserving subset):
lowercase scheme and host; drop the fragment; drop default ports
(http:80, https:443) but keep explicit non-default ports; drop known
tracking parameters (utm_*, gclid, fbclid); byte-sort the surviving
query parameters.  Path case and non-tracking parameter values are
preserved (paths are case-sensitive by spec).

Scale shape: every rule is a Catalyst expression (regexp_extract /
split / filter / array_sort / concat) — zero Python, whole-stage
codegen end-to-end, and the canonical key is computed in the same
scan that read the URL column.  The extraction regexes are written to
evaluate identically under Java regex (Spark) and RE2 (DuckDB
oracle), which is what makes the canonicalization oracle-gradable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parts of a URL string (kept RE2-compatible: no backrefs/lookaround)
_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)"
_PORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:]*:([0-9]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([/][^?#]*)"
# query anchored to the PRE-fragment prefix (ADVICE r11): a '?' that
# first appears after '#' (SPA route URLs like http://h/#/r?k=1) is
# fragment content and must NOT leak into query_norm/canonical
_QUERY_RE = "^[^#?]*[?]([^#]*)"
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid)="
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_parts(url: Column) -> dict[str, Column]:
    """Decomposed URL columns; missing parts come back as '' (the
    regexp_extract no-match convention in both engines)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    port = F.regexp_extract(url, _PORT_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    return {"scheme": scheme, "host": host, "port": port, "path": path, "query": query}


def normalized_query(query: Column) -> Column:
    """Tracking params dropped, survivors byte-sorted, '&'-rejoined;
    '' stays ''."""
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.array_join(kept, "&")


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append scheme/host/port_norm/path_norm/query_norm/canonical
    columns.  ``canonical`` is the dedup key:
    scheme://host[:port][path][?query_norm] — fragment gone, default
    port gone, tracking params gone, params sorted, empty path kept
    empty (no spurious '/': '' and '/' are distinct fetch targets on
    some origins, so the conservative rule preserves the distinction)."""
    p = url_parts(F.col(url_col))
    port_norm = F.when(
        (p["port"] == "")
        | ((p["scheme"] == "http") & (p["port"] == _DEFAULT_PORTS["http"]))
        | ((p["scheme"] == "https") & (p["port"] == _DEFAULT_PORTS["https"])),
        F.lit(""),
    ).otherwise(p["port"])
    qn = normalized_query(p["query"])
    canonical = F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        F.when(port_norm == "", F.lit("")).otherwise(F.concat(F.lit(":"), port_norm)),
        p["path"],
        F.when(qn == "", F.lit("")).otherwise(F.concat(F.lit("?"), qn)),
    )
    return (
        df.withColumn("scheme", p["scheme"])
        .withColumn("host", p["host"])
        .withColumn("port_norm", port_norm)
        .withColumn("path_norm", p["path"])
        .withColumn("query_norm", qn)
        .withColumn("canonical", canonical)
    )


def url_host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host fetch statistics off the canonicalized relation: total
    rows, distinct canonical URLs, and url_dups (rows that collapse
    onto an already-seen canonical — the count a URL-dedup stage would
    drop).  One scan + one host-keyed partial agg; at corpus scale
    hosts are the natural skew axis, which AQE's skew-join handling
    and the partial agg absorb (no row ever carries more than the
    canonical string)."""
    c = canonicalize_urls(df, url_col)
    return c.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("canonical").alias("n_canonical"),
        (F.count("*") - F.countDistinct("canonical")).alias("url_dups"),
    )
