"""URL curation: canonicalization + per-domain quotas.

Web-scale corpus pipelines (CCNet, RefinedWeb, Gopher) curate by URL
BEFORE any text stage: the same page arrives under dozens of spellings
(tracking params, fragments, case-varied hosts, doubled slashes), and
a handful of boilerplate-heavy domains would otherwise dominate the
corpus. Canonicalization collapses the spellings so URL-level exact
dedup works; per-domain quotas cap any one registrable domain's share.

Everything here is pure JVM expressions (regexp/split/sort — zero
Python, zero shuffle for canonicalization; the quota pass is one
domain-keyed window), and every regex stays inside the Java-regex ∩
RE2 common subset (char classes, alternation, bounded quantifiers,
``(?i)`` — no backrefs/lookaround) so the DuckDB oracle computes the
identical canonical form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters stripped during canonicalization (the usual
#: suspects; extend freely — the list is part of the canonical form).
TRACKING_PARAM_RE = "^(utm_[a-z]+|ref|fbclid|gclid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - fragment dropped;
    - scheme and host lowercased (path/query case preserved — paths
      are case-sensitive on most origins);
    - doubled slashes in the PATH collapsed, trailing slash dropped;
    - tracking params (:data:`TRACKING_PARAM_RE`) removed, remaining
      query params SORTED and rejoined (param order never
      distinguishes resources in practice, and sorting makes the
      form canonical); an emptied query drops its ``?``.
    """
    u = F.regexp_replace(url, "#.*$", "")  # fragment
    base = F.regexp_extract(u, "^([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    scheme_host = F.lower(F.regexp_extract(base, "^((?i)[a-z][a-z0-9+.-]*://[^/]*)", 1))
    path = F.regexp_replace(base, "^(?i)[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme_host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_domain(canonical: Column) -> Column:
    """Host of a canonical URL (port stripped) — the per-domain quota
    key. Registrable-domain (PSL) reduction is a lookup-table join in
    production; host-level is the engine-shape-identical stand-in."""
    return F.regexp_extract(canonical, "://([^/:?]*)", 1)


def domain_quota_sample(
    df: DataFrame,
    quota: int,
    url_col: str = "canonical_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``quota`` rows per domain, selected by md5(id)
    order (deterministic across runs/engines/partitionings — the same
    stable-pseudo-random trick as every sampler here). One
    domain-keyed window; per-partition state is one counter, never
    the domain's row set."""
    from pyspark.sql.window import Window

    domain = url_domain(F.col(url_col))
    w = (
        Window.partitionBy(domain)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= quota)
        .drop("__rank")
    )


def domain_suffixes(domain: Column) -> Column:
    """All dot-suffix chains of a host with >= 2 labels:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com]``. Map-side array algebra — the trick that turns
    subdomain-aware blocklist matching into a plain equi join.

    Hosts with < 2 labels ('localhost', the '' that ``url_domain``
    yields for malformed URLs) produce an EMPTY array — the row
    matches no blocklist entry and is kept. Without the guard,
    ``F.sequence(0, n - 2)`` at n=1 is the DESCENDING [0, -1] and the
    i=-1 element drives ``F.slice`` with start 0, which throws
    INVALID_PARAMETER_VALUE.START and kills the whole job (ADVICE
    r7)."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "canonical_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop rows whose URL host matches a blocked domain EXACTLY or
    as a SUBDOMAIN (``cdn.bad.com`` is blocked by ``bad.com``).
    ``blocklist`` is a 1-column ``domain`` DataFrame.

    Scale shape: each host expands map-side into its <= #labels
    dot-suffixes, the suffixes semi-join the (broadcast) blocklist to
    name doomed ids, and a left-anti join keeps the rest — two hash
    joins on bounded keys, never a LIKE-suffix theta join (which
    plans as a nested loop and dies at corpus scale)."""
    doomed = (
        df.select(
            id_col,
            F.explode(domain_suffixes(url_domain(F.col(url_col)))).alias(
                "__sfx"
            ),
        )
        .join(
            F.broadcast(blocklist.select(F.col("domain").alias("__sfx"))),
            "__sfx",
        )
        .select(id_col)
        .distinct()
    )
    return df.join(doomed, id_col, "left_anti")
