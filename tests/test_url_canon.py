"""URL canonicalization + URL-level dedup (web-corpus curation stage):
every rule pinned by hand cases, and the Spark Column form checked
against the DuckDB SQL mirror value-by-value.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from feathr_spark.operators.web import (canonicalize_url,
                                        canonicalize_url_sql, url_dedup)

CASES = [
    # scheme+host lowering, path case preserved
    ("HTTP://WWW.Example.COM/Path/File", "http://www.example.com/Path/File"),
    # default ports stripped per scheme
    ("http://x.com:80/a", "http://x.com/a"),
    ("https://x.com:443/a", "https://x.com/a"),
    ("https://x.com:443", "https://x.com"),
    # non-default / cross-scheme ports kept
    ("http://x.com:8080/a", "http://x.com:8080/a"),
    ("http://x.com:443/a", "http://x.com:443/a"),
    ("https://x.com:80/a", "https://x.com:80/a"),
    # fragment stripped
    ("http://x.com/a#sec-2", "http://x.com/a"),
    # tracking params dropped (case-insensitive), others kept sorted
    ("http://x.com/a?utm_source=tw&b=2&a=1&UTM_Campaign=x",
     "http://x.com/a?a=1&b=2"),
    ("http://x.com/a?fbclid=abc&gclid=d&z=9", "http://x.com/a?z=9"),
    # all params tracking -> no '?'
    ("http://x.com/a?utm_medium=email", "http://x.com/a"),
    # param sorting is bytewise; empty params dropped
    ("http://x.com/a?b=2&&a=10&a=2", "http://x.com/a?a=10&a=2&b=2"),
    # root trailing slash dropped, deeper trailing slash kept
    ("http://x.com/", "http://x.com"),
    ("http://x.com/a/", "http://x.com/a/"),
    ("https://X.com/?utm_source=a", "https://x.com"),
    # whitespace trim
    ("  http://x.com/a  ", "http://x.com/a"),
    # scheme-less strings: no authority rules, params still cleaned
    ("x.com/a?utm_source=1&b=2", "x.com/a?b=2"),
    # a '#' inside the query is a fragment start
    ("http://x.com/a?b=1#c=2", "http://x.com/a?b=1"),
]


def test_canonicalize_rules_spark(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c"))
           .collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_sql_mirror_matches_spark(spark):
    """The DuckDB mirror must produce the identical canonical string
    for every case — this is what makes the driver oracle sound."""
    con = duckdb.connect()
    expr = canonicalize_url_sql("url")
    for u, want in CASES:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [u]).fetchone()[0]
        assert got == want, f"{u!r}: duckdb {got!r} != {want!r}"


def test_url_dedup_keep_min_id(spark):
    df = spark.createDataFrame([
        (1, "HTTP://A.com/x?utm_source=t"),
        (2, "http://a.com/x"),
        (3, "http://a.com/x?b=1"),
        (7, "https://b.com:443/"),
        (5, "https://B.COM"),
    ], "doc_id bigint, url string")
    out = {r["url_canon"]: (r["n_docs"], r["keep_id"])
           for r in url_dedup(df).collect()}
    assert out["http://a.com/x"] == (2, 1)
    assert out["http://a.com/x?b=1"] == (1, 3)
    assert out["https://b.com"] == (2, 5)


def test_sql_mirror_randomized_cross_engine(spark):
    """300 seeded random URLs assembled from adversarial components
    (case-varied schemes/hosts, all port forms, tracking and empty and
    duplicate params in random order, fragments, missing pieces): the
    Spark Column chain and the DuckDB SQL mirror must emit the
    identical canonical string for every one."""
    import random
    rng = random.Random(20260816)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://", ""]
    hosts = ["x.com", "WWW.Ex.COM", "sub.domain.ORG", "a-b.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p/1/", "/Path%20X"]
    params = ["a=1", "B=2", "utm_source=t", "UTM_x=9", "fbclid=z",
              "", "z=Z", "a=2", "ref_src=tw"]
    frags = ["", "#sec", "#a=b"]
    urls = []
    for _ in range(300):
        q = "&".join(rng.sample(params, rng.randint(0, 5)))
        urls.append(rng.choice(schemes) + rng.choice(hosts)
                    + rng.choice(ports) + rng.choice(paths)
                    + (("?" + q) if q or rng.random() < 0.2 else "")
                    + rng.choice(frags))
    df = spark.createDataFrame(list(enumerate(urls)), "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c"))
           .collect()}
    con = duckdb.connect()
    expr = canonicalize_url_sql("url")
    for i, u in enumerate(urls):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [u]).fetchone()[0]
        assert got[i] == want, f"{u!r}: spark {got[i]!r} != duckdb {want!r}"


def test_nested_subsets_are_nested(spark):
    """Structural property: subset(f1) ⊆ subset(f2) for f1 < f2, sizes
    roughly proportional, NULL tail outside the largest fraction."""
    from feathr_spark.operators.sampling import nested_subsets
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    out = nested_subsets(df, [0.05, 0.2, 0.5], salt="t|").collect()
    by_frac = {}
    for r in out:
        by_frac.setdefault(r["min_subset"], set()).add(r["doc_id"])
    s05 = by_frac.get(0.05, set())
    s20 = s05 | by_frac.get(0.2, set())
    s50 = s20 | by_frac.get(0.5, set())
    assert s05 < s20 < s50
    assert len(s05) == pytest.approx(200, abs=60)
    assert len(s20) == pytest.approx(800, abs=120)
    assert len(s50) == pytest.approx(2000, abs=180)
    assert by_frac.get(None) and len(by_frac[None]) == 4000 - len(s50)
    # determinism + nestedness against a direct recompute with MORE
    # fractions: adding a rung never changes membership of existing ones
    out2 = nested_subsets(df, [0.05, 0.1, 0.2, 0.5], salt="t|").collect()
    s05b = {r["doc_id"] for r in out2 if r["min_subset"] == 0.05}
    assert s05b == s05
