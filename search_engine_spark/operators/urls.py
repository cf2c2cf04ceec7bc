"""URL canonicalization + URL-level dedup for web corpora.

The first dedup pass every Common-Crawl-scale pipeline runs: collapse
re-crawls of the same page that differ only in URL noise (scheme/host
case, default port, ``www.``, fragments, tracking params, param order,
trailing slashes). Pure JVM column expressions — regexp + higher-order
array functions, whole-stage codegen, no Python in the hot path.

Rules applied by :func:`canonical_url_col` (in order):

1. drop the ``#fragment``;
2. lowercase the scheme and host;
3. strip a default port (``https:443`` / ``http:80``; other ports kept);
4. strip a leading ``www.`` host label;
5. strip trailing slashes from the path (empty path -> ``/``);
6. drop tracking query params (``utm_*``, ``ref``, ``fbclid``, ``gclid``)
   and sort the survivors bytewise (param ORDER is noise, values are not).

Fits the corpus shape of the north rule (url:string per page,
reference indexer input: indexer/index.c:268-273 reads per-doc url).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DROP_PARAM_PREFIXES = ("utm_",)
DROP_PARAMS = ("ref", "fbclid", "gclid")


def canonical_url_col(url: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring for rules)."""
    u = F.col(url) if isinstance(url, str) else url
    u0 = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u0, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u0, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    default_port = ((scheme == F.lit("https")) & (port == F.lit("443"))) | (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    )
    portpart = (
        F.when((port == F.lit("")) | default_port, F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path0 = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path1 = F.regexp_replace(path0, "/+$", "")
    path = F.when(path1 == F.lit(""), F.lit("/")).otherwise(path1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)

    def _keep(p: Column) -> Column:
        c = p != F.lit("")
        for pre in DROP_PARAM_PREFIXES:
            c = c & ~p.startswith(pre)
        for name in DROP_PARAMS:
            c = c & ~p.startswith(name + "=")
        return c

    qcanon = F.array_join(F.array_sort(F.filter(F.split(query, "&"), _keep)), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(qcanon == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by canonical URL; keeper = min id per group.

    (doc_id, canonical_url, group_size, keep_doc_id, is_dup). One
    combinable groupBy on the canonical string — skew-free, same scale
    shape as exact text dedup.
    """
    c = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        canonical_url_col(url_col).alias("canonical_url"),
    )
    g = c.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("doc_id").alias("keep_doc_id"),
    )
    return c.join(g, "canonical_url").select(
        "doc_id",
        "canonical_url",
        "group_size",
        "keep_doc_id",
        (F.col("doc_id") != F.col("keep_doc_id")).alias("is_dup"),
    )
