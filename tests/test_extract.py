"""Extraction: Arrow-UDF and builtin-expression paths are byte-identical
(FIXTURES.md F2 golden contract); field extraction recovers the planted
title/byline; determinism across re-runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.extract import (
    extract_fields,
    extract_text_expr,
    extract_text_udf,
)

from .helpers import normalize_py

HTMLS = [
    "<html><head><title>A &amp; B</title><script>var x=1;</script></head>"
    "<body><h1>Hello, World!</h1><p>Body text.</p></body></html>",
    "<html><body><style>.c{}</style><p>Café &lt;tag&gt; &quot;q&quot;</p></body></html>",
    "<html><body></body></html>",
    "plain text no tags",
]


def test_udf_and_expr_byte_identical(spark):
    df = spark.createDataFrame([(h.encode(),) for h in HTMLS], ["html"])
    rows = df.select(
        extract_text_udf("html").alias("u"), extract_text_expr("html").alias("e")
    ).collect()
    for r in rows:
        assert r.u == r.e


def test_golden_bytes(spark):
    """Byte-identical per-url contract: stripped visible text through the
    reference normalization chain."""
    df = spark.createDataFrame([(HTMLS[0].encode(),) ], ["html"])
    got = df.select(extract_text_udf("html").alias("t")).collect()[0].t
    visible = "A & B   Hello, World! Body text."
    assert got == normalize_py(visible)
    assert "var x" not in got  # script stripped


def test_extract_fields_roundtrip(tiny_pages, tiny_extracted):
    rows = tiny_extracted.select("url", "title_norm", "authors_norm", "combined").collect()
    assert all(r.title_norm and r.authors_norm for r in rows)
    assert all(r.combined == f"{r.title_norm} {r.authors_norm}" for r in rows)


def test_extract_deterministic(spark, tiny_pages):
    a = extract_fields(tiny_pages).orderBy("url").collect()
    b = extract_fields(tiny_pages).orderBy("url").collect()
    assert a == b
