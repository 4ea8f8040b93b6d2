"""TF-IDF cosine (M6) vs a driver-side reimplementation of the
reference's sklearn formulas (TfidfVectorizer defaults: raw tf,
smooth idf ln((1+N)/(1+df))+1, L2 norm — data_loading.py:49-54)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from entity_resolution_pipeline_spark.operators.tfidf import (
    tfidf_cosine_pairs,
    tfidf_weights,
)

from .helpers import normalize_py

DOCS = [
    (0, "the quick brown fox"),
    (1, "the quick brown dog"),
    (2, "entity resolution at scale"),
    (3, "entity resolution pipeline for the web"),
    (4, "quick quick quick brown"),  # repeated term → tf matters
]


def _tfidf_py(rows):
    texts = {i: normalize_py(t).split() for i, t in rows}
    n = len(texts)
    dfreq = Counter()
    for toks in texts.values():
        for t in set(toks):
            dfreq[t] += 1
    weights = {}
    for i, toks in texts.items():
        tf = Counter(toks)
        w = {t: c * (math.log((1 + n) / (1 + dfreq[t])) + 1.0) for t, c in tf.items()}
        nrm = math.sqrt(sum(v * v for v in w.values()))
        weights[i] = (w, nrm)
    return weights


def _cos_py(weights, i, j):
    (w1, n1), (w2, n2) = weights[i], weights[j]
    if n1 == 0 or n2 == 0:
        return 0.0
    return sum(w1[t] * w2.get(t, 0.0) for t in w1) / (n1 * n2)


def test_weights_vs_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {(r.id, r.term): r.w for r in tfidf_weights(df).collect()}
    exp = _tfidf_py(DOCS)
    for (i, term), w in got.items():
        assert w == pytest.approx(exp[i][0][term], rel=1e-12), (i, term)
    assert len(got) == sum(len(w) for w, _ in exp.values())


def test_cosine_vs_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (2, 3), (0, 4), (1, 4)], ["id1", "id2"]
    )
    got = {(r.id1, r.id2): r.cosine for r in tfidf_cosine_pairs(df, pairs).collect()}
    exp_w = _tfidf_py(DOCS)
    for (i, j), c in got.items():
        assert c == pytest.approx(_cos_py(exp_w, i, j), rel=1e-12), (i, j)
    # disjoint-vocab pair scores 0 via the left join + coalesce
    assert got[(0, 2)] == 0.0
