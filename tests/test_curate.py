"""Corpus curation pipeline: gate → exact dedup → near-dup removal →
stratified sample, checkpointed + resumable."""

from __future__ import annotations

import pytest

from entity_resolution_pipeline_spark.plans.curate import (
    CurationConfig,
    CurationPipeline,
)
from entity_resolution_pipeline_spark.sources.catalog import TableCatalog

GOOD = (
    "the quick brown fox jumps over the lazy dog and then rests in the "
    "warm afternoon sun for a while before it runs off again"
)


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cur") / "docs.parquet")
    rows = []
    # 30 good unique docs (distinct tails keep them un-near-dup'd)
    for i in range(30):
        tail = " ".join(f"unique{i}word{j} extra{(i*7+j)%13}" for j in range(12))
        rows.append((i, f"{GOOD} {tail}", "en" if i % 2 == 0 else "de"))
    # exact duplicates of doc 0 (survive gate, die in exact stage)
    rows += [(100 + j, rows[0][1], "en") for j in range(3)]
    # near duplicate of doc 1 (one word changed -> dies in neardup stage)
    rows.append((200, rows[1][1].replace("unique1word3", "changed"), "de"))
    # quality failures (die at the gate)
    rows.append((300, "too short", "en"))
    rows.append((301, " ".join(["zzzzzzzzzzzzzzzzzz"] * 15), "en"))
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(path)
    return path


def test_curation_funnel_and_resume(spark, tmp_path, corpus_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    cfg = CurationConfig(rates={"en": 1.0, "de": 1.0}, minhash_threshold=0.5)
    pipe = CurationPipeline(spark, cat, corpus_path, cfg)
    out = pipe.run()
    funnel = out["funnel"]
    assert funnel["input"] == 36
    assert funnel["gate"] == 34          # 2 quality failures dropped
    assert funnel["exact"] == 31         # 3 exact dups of doc 0 dropped
    assert funnel["neardup"] == 30       # near-dup 200 dropped
    assert funnel["sample"] == 30        # rates 1.0 keep everything
    # representatives kept are the min ids
    ids = {r.doc_id for r in cat.read("neardup").collect()}
    assert 0 in ids and 1 in ids
    assert ids.isdisjoint({100, 101, 102, 200, 300, 301})

    # resume: second run writes nothing new
    stamps1 = {m["table"]: m["written_at_epoch"] for m in cat.metrics()}
    out2 = pipe.run()
    stamps2 = {m["table"]: m["written_at_epoch"] for m in cat.metrics() if m["table"] in stamps1}
    assert stamps1 == stamps2 and out2 == out

    # a rate-only change re-runs EXACTLY the sample stage: upstream
    # fingerprints hash only their own knobs + chain, so gate/exact/
    # neardup are skipped (timestamps unchanged), sample is rebuilt
    pipe2 = CurationPipeline(
        spark, cat, corpus_path,
        CurationConfig(rates={"en": 0.5, "de": 0.0}, minhash_threshold=0.5),
    )
    sampled = pipe2.sample()
    langs = {r.lang for r in sampled.collect()}
    assert "de" not in langs
    stamps3 = {m["table"]: m["written_at_epoch"] for m in cat.metrics()}
    for s in ("gate", "exact", "neardup"):
        assert stamps3[s] == stamps1[s], s
    # the sample checkpoint now carries pipe2's fingerprint, not pipe's
    nd_fp = pipe._neardup()[1]
    assert not cat.exists("sample", pipe._fingerprint("sample", nd_fp))
    assert cat.exists("sample", pipe2._fingerprint("sample", nd_fp))

    # a different input path invalidates the whole chain
    pipe3 = CurationPipeline(spark, cat, corpus_path + ".elsewhere", cfg)
    assert pipe3._fingerprint("gate", None) != pipe._fingerprint("gate", None)


def test_curation_sample_rates(spark, tmp_path, corpus_path):
    cat = TableCatalog(spark, str(tmp_path / "wh2"))
    pipe = CurationPipeline(
        spark, cat, corpus_path,
        CurationConfig(rates={}, default_rate=0.0),
    )
    out = pipe.run()
    assert out["funnel"]["sample"] == 0
    assert out["kill_rate"]["sample"] == 1.0
