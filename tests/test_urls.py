"""URL canonicalization: rule-by-rule pins and dedup-by-URL."""

from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.urls import (
    canonicalize_url,
    dedup_by_url,
    url_host,
)

CASES = [
    # (raw, canonical, host)
    ("HTTP://Example.COM:80/path?b=2&a=1#frag",
     "http://example.com/path?a=1&b=2", "example.com"),
    ("https://WWW.Example.com:443/path/",
     "https://example.com/path", "example.com"),
    ("http://example.com/p?utm_source=x&utm_campaign=c&z=1",
     "http://example.com/p?z=1", "example.com"),
    ("http://example.com/p?fbclid=abc&gclid=d&ref=home",
     "http://example.com/p", "example.com"),
    ("https://example.com", "https://example.com/", "example.com"),
    ("http://sub.example.org:8080/x/", "http://sub.example.org:8080/x",
     "sub.example.org"),
    # refresh=1 is NOT a tracker (prefix 'ref' must match the whole key)
    ("http://example.com/p?refresh=1",
     "http://example.com/p?refresh=1", "example.com"),
    # root slash survives; :80 on https is NOT default
    ("https://example.com:80/", "https://example.com:80/",
     "example.com"),
    # schemeless passthrough (trimmed only)
    ("  relative/path?a=1 ", "relative/path?a=1", ""),
]


def test_canonicalize_rules(spark):
    df = spark.createDataFrame(
        [(i, r) for i, (r, _, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: (r.canon, r.host)
        for r in df.select(
            "i",
            canonicalize_url("url").alias("canon"),
            url_host("url").alias("host"),
        ).collect()
    }
    for i, (_, want_canon, want_host) in enumerate(CASES):
        assert got[i][0] == want_canon, (i, got[i][0], want_canon)
        assert got[i][1] == want_host, (i, got[i][1], want_host)


def test_dedup_by_url_merges_variants(spark):
    variants = [
        (1, "HTTP://Example.COM:80/a?b=2&a=1"),
        (2, "http://example.com/a?a=1&b=2#x"),
        (3, "http://www.example.com/a/?a=1&b=2&utm_source=t"),
        (4, "http://example.com/other"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, url string")
    out = {r.canonical_url: r for r in dedup_by_url(df).collect()}
    assert out["http://example.com/a?a=1&b=2"].keep_id == 1
    assert out["http://example.com/a?a=1&b=2"].n_dups == 3
    assert out["http://example.com/other"].n_dups == 1


def test_canonicalize_is_udf_free(spark):
    df = spark.createDataFrame([(1, "http://a.b/c")], "i long, url string")
    plan = df.select(
        canonicalize_url("url")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
