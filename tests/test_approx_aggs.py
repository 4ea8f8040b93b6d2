"""Approximate aggregates (HLL++ distinct, GK quantiles) — error-bound
checks vs exact values on the synthetic corpus.  SURVEY §2.7: absent in
the reference; first-class for sketch-style training-data accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.sources.synth import synth_pages


def test_approx_count_distinct_error_bound(spark):
    pages = synth_pages(spark, 2000)
    exact = pages.select(F.countDistinct("entity_id")).collect()[0][0]
    approx = pages.select(
        F.approx_count_distinct("entity_id", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_percentile_approx_vs_exact(spark):
    pages = synth_pages(spark, 2000).select(F.length("html").alias("n"))
    approx = pages.select(
        F.percentile_approx("n", [0.25, 0.5, 0.75], 10000).alias("q")
    ).collect()[0]["q"]
    exact = pages.select(
        F.expr("percentile(n, array(0.25, 0.5, 0.75))").alias("q")
    ).collect()[0]["q"]
    for a, e in zip(approx, exact):
        assert abs(a - e) / e < 0.02, (a, e)
