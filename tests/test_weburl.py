from __future__ import annotations

import pytest


def _canon(spark, urls):
    from entity_resolution_pipeline_spark.operators.weburl import (
        url_canonicalize,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r.doc_id: r for r in url_canonicalize(df).collect()}


def test_url_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/A/b/Page?utm_source=x&z=1&a=2#frag",
            "https://news.site.co.uk:8443/x/",
            "https://cdn.example.net",
            "http://example.com/?fbclid=abc123",
            "https://Example.org/p?ref=hn&refx=1&b",
        ],
    )
    r = got[0]
    # scheme+host lowercased, www+default port stripped, fragment and
    # utm_* dropped, params sorted, path case preserved
    assert r.canon_url == "http://example.com/A/b/Page?a=2&z=1"
    assert r.host == "example.com" and r.registered_domain == "example.com"
    assert r.path_depth == 3
    r = got[1]  # non-default port kept; co.uk suffix heuristic
    assert r.canon_url == "https://news.site.co.uk:8443/x/"
    assert r.registered_domain == "site.co.uk"
    r = got[2]  # empty path -> "/", depth 0
    assert r.canon_url == "https://cdn.example.net/"
    assert r.path_depth == 0 and r.registered_domain == "example.net"
    # all-tracking query vanishes entirely (no trailing "?")
    assert got[3].canon_url == "http://example.com/"
    # "ref" dropped, "refx=1" and bare "b" kept, sorted
    assert got[4].canon_url == "https://example.org/p?b&refx=1"


def test_host_stats_dup_rate(spark):
    from entity_resolution_pipeline_spark.operators.weburl import host_stats

    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/1", "same text"),
            (2, "https://b.example.com/2", "same text"),
            (3, "https://www.example.com/3", "other"),
            (4, "https://solo.org/x", "unique"),
        ],
        "doc_id long, url string, text string",
    )
    got = {r.registered_domain: r for r in host_stats(df).collect()}
    ex = got["example.com"]
    # www. strips to the bare host: a., b., and bare example.com
    assert (ex.n_docs, ex.n_hosts, ex.n_unique_texts) == (3, 3, 2)
    assert ex.dup_rate == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert got["solo.org"].dup_rate == 0.0


def test_bloom_prefilter_no_false_negatives(spark):
    from entity_resolution_pipeline_spark.operators.bloom import (
        bloom_bitmap,
        bloom_prefilter,
    )

    members = spark.range(0, 200).selectExpr("md5(cast(id as string)) as h")
    probe = spark.range(0, 2000).selectExpr("md5(cast(id as string)) as h")
    bm = bloom_bitmap(members, "h", n_bits=1 << 14, k=4)
    kept = set(r.h for r in bloom_prefilter(probe, "h", bm, 1 << 14, 4).collect())
    want = set(r.h for r in members.collect())
    assert want <= kept  # every true member survives
    # and the filter actually filters (fp rate far below 50%)
    assert len(kept) < 1000
