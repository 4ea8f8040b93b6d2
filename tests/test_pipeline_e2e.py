"""End-to-end: synthetic pages → extract → block → score → cluster,
pairwise F1 ≥ 0.99 vs planted labeled pairs (the BASELINE.json gate),
recovered cluster count == planted entity count, and checkpoint/resume
yields byte-identical outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.config import (
    BlockingConfig,
    MatchingConfig,
    PipelineConfig,
)
from entity_resolution_pipeline_spark.operators.blocking import candidate_pairs
from entity_resolution_pipeline_spark.operators.evaluate import pairwise_f1, threshold_sweep
from entity_resolution_pipeline_spark.operators.matching import matched_pairs, score_pairs
from entity_resolution_pipeline_spark.plans.pipeline import ERPipeline
from entity_resolution_pipeline_spark.sources.catalog import TableCatalog
from entity_resolution_pipeline_spark.sources.synth import labeled_pairs, synth_pages


@pytest.fixture(scope="module")
def gold(tiny_pages):
    return labeled_pairs(tiny_pages).select(
        F.col("url1").alias("id1"), F.col("url2").alias("id2")
    )


@pytest.mark.parametrize("method", ["levenshtein", "jaccard", "trigram", "jaro_winkler"])
def test_f1_gate_all_matchers(tiny_extracted, gold, method):
    pairs = candidate_pairs(tiny_extracted, BlockingConfig(scheme="token"), text_col="combined")
    cfg = MatchingConfig(method=method)
    m = matched_pairs(score_pairs(pairs, tiny_extracted, cfg), cfg)
    pm = pairwise_f1(m.select("id1", "id2"), gold)
    assert pm.f1 >= 0.99, (method, pm)


@pytest.mark.parametrize(
    "weights",
    [(0.33, 0.33, 0.33), (0.7, 0.3, 0.0), (0.0, 0.7, 0.3)],
    ids=["balanced", "title-heavy", "authors-meta"],
)
def test_f1_gate_weight_grid(tiny_extracted, gold, weights):
    """E3 — the reference's weight-vector grid (evaluate_pipeline.py:37-57)
    at θ=0.8.  The balanced vector must clear the 0.99 gate; skewed
    vectors must clear the reference's own observed grid floor (0.9677
    for by_year+trigram w=[.7,.3,0], result_20240202-215248.csv) — a
    single-attribute-heavy score legitimately misses a few pairs whose
    perturbed variant dropped a title word."""
    pairs = candidate_pairs(
        tiny_extracted, BlockingConfig(scheme="token"), text_col="combined"
    )
    cfg = MatchingConfig(weights=weights)
    m = matched_pairs(score_pairs(pairs, tiny_extracted, cfg), cfg)
    pm = pairwise_f1(m.select("id1", "id2"), gold)
    floor = 0.99 if weights == (0.33, 0.33, 0.33) else 0.9677
    assert pm.f1 >= floor, (weights, pm)


def test_inspect_pairs_readable(tiny_extracted):
    from entity_resolution_pipeline_spark.operators.evaluate import inspect_pairs

    pairs = candidate_pairs(
        tiny_extracted, BlockingConfig(scheme="token"), text_col="combined"
    )
    rows = inspect_pairs(pairs, tiny_extracted, limit=5).collect()
    assert 0 < len(rows) <= 5
    assert all(r.text1 and r.text2 for r in rows)


def test_threshold_sweep_monotone_precision(tiny_extracted, gold):
    pairs = candidate_pairs(tiny_extracted, BlockingConfig(scheme="token"), text_col="combined")
    scored = score_pairs(pairs, tiny_extracted, MatchingConfig())
    sweep = threshold_sweep(scored, gold, thresholds=(0.5, 0.8, 0.95))
    precisions = [m.precision for _, m in sweep]
    assert precisions == sorted(precisions)


def test_pipeline_resume(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    pipe = ERPipeline(spark, cat, PipelineConfig(), num_entities=80)
    pipe.run()
    pm1 = pipe.evaluate()
    assert pm1.f1 >= 0.99

    first = {m["table"]: m["written_at_epoch"] for m in cat.metrics()}
    clustered1 = sorted(cat.read("clustered").select("url", "entity_cluster").collect())

    # Re-run: every stage must be skipped (checkpoint + fingerprint hit),
    # outputs identical.
    pipe.run()
    second = {m["table"]: m["written_at_epoch"] for m in cat.metrics() if m["table"] in first}
    assert first == second
    clustered2 = sorted(cat.read("clustered").select("url", "entity_cluster").collect())
    assert clustered1 == clustered2

    # Dropping one checkpoint re-runs exactly that stage.
    cat.drop("matched")
    pipe.score()
    assert cat.exists("matched")
    pm2 = pipe.evaluate()
    assert pm2 == pm1


def test_cluster_count_matches_planted(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh2"))
    pipe = ERPipeline(spark, cat, PipelineConfig(), num_entities=60)
    pipe.run()
    clustered = cat.read("clustered")
    n_clusters = clustered.select("entity_cluster").distinct().count()
    assert n_clusters == 60


def test_skewed_hot_block_bounded(spark):
    """FIXTURES.md F7: a hot boilerplate token shared by every page must
    be dropped by the cap (block ≥ max) — no quadratic pair blowup."""
    n = 300
    rows = [(f"u{i:04d}", f"hotword unique{i}a unique{i}b") for i in range(n)]
    df = spark.createDataFrame(rows, ["url", "text"])
    cfg = BlockingConfig(scheme="token", max_block_size=100)
    pairs = candidate_pairs(df, cfg)
    assert pairs.count() == 0  # hotword block (size 300) capped out


def test_pipeline_id_bits_128(spark, tmp_path):
    """r2 VERDICT #6: the full pipeline at id_bits=128 (two-seed
    xxhash64 struct rids) — F1 identical to the 64-bit run, collision
    detector green, struct ids surviving blocking/scoring/clustering."""
    from entity_resolution_pipeline_spark.operators.extract import (
        rid_collision_count,
    )

    cat = TableCatalog(spark, str(tmp_path / "wh128"))
    pipe = ERPipeline(
        spark, cat, PipelineConfig(id_bits=128), num_entities=60
    )
    pipe.run()
    ext = cat.read("extracted")
    assert ext.schema["rid"].dataType.simpleString() == "struct<h1:bigint,h2:bigint>"
    assert rid_collision_count(ext) == 0
    pm = pipe.evaluate()
    assert pm.f1 >= 0.99

    # same corpus through the 64-bit pipeline: identical metrics
    cat64 = TableCatalog(spark, str(tmp_path / "wh64"))
    pipe64 = ERPipeline(spark, cat64, PipelineConfig(), num_entities=60)
    pipe64.run()
    assert pipe64.evaluate() == pm
    # and identical url-level cluster partitions
    def partition(c):
        rows = c.read("clustered").select("url", "entity_cluster").collect()
        groups = {}
        for r in rows:
            groups.setdefault(str(r.entity_cluster), set()).add(r.url)
        return sorted(frozenset(g) for g in groups.values())

    assert partition(cat) == partition(cat64)
