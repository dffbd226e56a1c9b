"""Web-corpus URL operators: canonicalization and URL-level dedup.

Every large-scale web-text pipeline (Common-Crawl-style curation) keys
its first dedup pass on the CANONICAL URL — the raw strings differ in
scheme/host case, default ports, tracking parameters, parameter order,
fragments, and trailing slashes while naming the same resource. The
reference has no web surface (its sources stop at storage connectors,
feathr-rs/src/source.rs); a training-data engine needs one.

Canonicalization is a pure expression pipeline (zero shuffle, zero
Python) with an exactly mirrored DuckDB form
(:func:`canonicalize_url_sql` — the ``weights_case_sql`` pattern), so
the driver oracle pins every rule cross-engine:

1. trim; strip the fragment (first ``#`` onward);
2. lowercase the scheme and authority ONLY (path/query case is
   significant per RFC 3986 §6.2.2.1);
3. strip default ports (``:80`` for http, ``:443`` for https — other
   ports are significant);
4. drop tracking parameters (``utm_*``, fbclid, gclid, msclkid,
   mc_cid/mc_eid, igshid, ref_src — case-insensitive) and empty params;
5. sort surviving query parameters bytewise (RFC 3986 §6.2.2: order is
   almost never significant; sorting is the standard crawl convention);
6. drop a bare root-path trailing slash (``http://x.com/`` ≡
   ``http://x.com``).

Scheme-less strings pass through steps 1/4/5 untouched by the
authority rules. All regexes live in the Java∩RE2 portable subset
(no lookaround, no backreferences in patterns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped by step 4 (case-insensitive, anchored at the
# param name)
_TRACKING_RE = (r"(?i)^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid"
                r"|mc_eid|igshid|ref_src)=")
_SCHEME_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize_url(col: Column) -> Column:
    """Canonical form of a URL column (rules in the module docstring).
    A pure builtin-expression tree — row-local, whole-stage-codegen
    eligible, no UDF."""
    t1 = F.regexp_replace(F.trim(col), "#.*", "")
    head = F.regexp_extract(t1, _SCHEME_AUTH_RE, 0)
    t2 = F.when(head != "",
                F.concat(F.lower(head),
                         F.substring(t1, F.length(head) + 1,
                                     F.lit(2 ** 31 - 1)))).otherwise(t1)
    t3 = F.regexp_replace(t2, r"^(http://[^/?#:]+):80([/?#]|$)", "$1$2")
    t4 = F.regexp_replace(t3, r"^(https://[^/?#:]+):443([/?#]|$)",
                          "$1$2")
    base = F.regexp_replace(t4, r"\?.*", "")
    base = F.regexp_replace(
        base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$", "$1")
    q = F.regexp_extract(t4, r"^[^?]*\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE)))
    return F.when(F.size(params) > 0,
                  F.concat(base, F.lit("?"),
                           F.array_join(params, "&"))).otherwise(base)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` over the SQL
    expression ``expr`` — identical rule chain, RE2 regexes, bytewise
    list_sort. Keep in lockstep with the Column form (the driver
    oracle diffs them value-by-value)."""
    t1 = f"regexp_replace(trim({expr}), '#.*', '')"
    head = f"regexp_extract({t1}, '{_SCHEME_AUTH_RE}', 0)"
    t2 = (f"CASE WHEN {head} <> '' THEN lower({head}) "
          f"|| substr({t1}, length({head}) + 1) ELSE {t1} END")
    t3 = (f"regexp_replace({t2}, '^(http://[^/?#:]+):80([/?#]|$)', "
          r"'\1\2')")
    t4 = (f"regexp_replace({t3}, '^(https://[^/?#:]+):443([/?#]|$)', "
          r"'\1\2')")
    base = (f"regexp_replace(regexp_replace({t4}, '\\?.*', ''), "
            r"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$', '\1')")
    q = f"regexp_extract({t4}, '^[^?]*\\?(.*)$', 1)"
    params = (f"list_sort(list_filter(string_split({q}, '&'), "
              f"p -> p <> '' AND NOT regexp_matches(p, "
              f"'{_TRACKING_RE}')))")
    return (f"CASE WHEN len({params}) > 0 THEN {base} || '?' || "
            f"array_to_string({params}, '&') ELSE {base} END")


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup summary: one row per canonical URL with the
    duplicate count and the deterministic keeper (min id — the
    keep-one convention of ``dedup.resolve_duplicates``). One keyed
    aggregate over (canonical, id); payloads never shuffle — join the
    result back by ``id_col`` to materialize survivors.

    Output: (url_canon, n_docs, keep_id).
    """
    return (df.select(canonicalize_url(F.col(url_col))
                      .alias("url_canon"),
                      F.col(id_col).alias("__id"))
            .groupBy("url_canon")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.min("__id").alias("keep_id")))
