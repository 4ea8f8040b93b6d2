"""ANN: brute-force exact top-k vs numpy oracle; LSH variant recall and
determinism; embedding near-dup precision."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from entity_resolution_pipeline_spark.operators.similarity_search import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_topk,
)

DIM = 16
N = 60


def _vectors():
    """Deterministic vectors: 3 tight clusters + noise (no RNG seed
    drama — pure arithmetic)."""
    vecs = []
    for i in range(N):
        base = np.zeros(DIM)
        c = i % 3
        base[c * 5 : c * 5 + 5] = 1.0
        jitter = np.array([((i * 31 + d * 17) % 97) / 970.0 for d in range(DIM)])
        vecs.append((i, (base + jitter).astype(np.float32)))
    return vecs


@pytest.fixture(scope="module")
def emb(spark):
    data = [(i, v.tolist()) for i, v in _vectors()]
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(data, schema).cache()


def _cos(a, b):
    a, b = a.astype(np.float64), b.astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_brute_force_matches_numpy(emb, spark):
    vecs = dict(_vectors())
    got = brute_force_topk(emb, emb.where(F.col("vec_id") < 2), k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for q in (0, 1):
        scores = sorted(
            ((_cos(vecs[q], v), -i) for i, v in vecs.items() if i != q), reverse=True
        )
        exp_ids = [-s[1] for s in scores[:5]]
        assert [r.neighbor_id for r in by_q[q]] == exp_ids
        for r, (s, _) in zip(by_q[q], scores[:5]):
            assert r.score == pytest.approx(round(s, 6), abs=2e-6)


def test_lsh_topk_recall(emb, spark):
    """LSH top-k should recover most of the true top-k (same-cluster
    vectors have cosine ≈ 1 → same-side of nearly every hyperplane)."""
    exact = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=5).collect()
    approx = lsh_topk(emb, emb.where(F.col("vec_id") < 3), k=5, num_tables=6).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_lsh_deterministic(emb, spark):
    a = sorted(map(tuple, lsh_topk(emb, emb.where(F.col("vec_id") < 2), k=3).collect()))
    b = sorted(map(tuple, lsh_topk(emb, emb.where(F.col("vec_id") < 2), k=3).collect()))
    assert a == b


def test_embedding_near_dups_precision(emb, spark):
    """Every reported pair must truly clear the cosine threshold
    (LSH may miss pairs — approximate recall — but never lie)."""
    vecs = dict(_vectors())
    got = embedding_near_duplicates(emb, threshold=0.95).collect()
    assert got, "expected some same-cluster near-dup pairs"
    for r in got:
        true = _cos(vecs[r.id1], vecs[r.id2])
        assert round(true, 6) >= 0.95 - 1e-9
        assert r.id1 < r.id2


def test_ivf_topk_recall_and_determinism(emb, spark):
    from entity_resolution_pipeline_spark.operators.similarity_search import (
        ivf_topk,
    )

    exact = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=5).collect()
    a = ivf_topk(emb, emb.where(F.col("vec_id") < 3), k=5, num_cells=6, nprobe=3).collect()
    b = ivf_topk(emb, emb.where(F.col("vec_id") < 3), k=5, num_cells=6, nprobe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in a}
    recall = len(exact_set & approx_set) / len(exact_set)
    # clustered vectors: probing half the cells should recover most
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_centroid_plan_size_stable_in_k(spark):
    """Centroids ride as a single-row broadcast carrier, so the query
    plan must not grow O(k·dim) with the cell count (r1 VERDICT: literal
    arrays inlined the whole model into the plan).  k=256 over a corpus
    big enough to populate cells."""
    from entity_resolution_pipeline_spark.operators.similarity_search import (
        ivf_topk,
    )

    n, dim = 400, 8
    data = [
        (i, [((i * 7 + d * 13) % 29) / 29.0 + (1.0 if d == i % dim else 0.0) for d in range(dim)])
        for i in range(n)
    ]
    emb400 = spark.createDataFrame(
        data, "vec_id long, embedding array<float>"
    ).cache()

    def plan_len(num_cells):
        df = ivf_topk(
            emb400,
            emb400.where(F.col("vec_id") < 2),
            k=3,
            num_cells=num_cells,
            nprobe=4,
            lloyd_rounds=1,
        )
        return len(df._jdf.queryExecution().analyzed().toString()), df

    small, _ = plan_len(8)
    large, df = plan_len(256)
    # O(1) plan in k: 32x the centroids must not inflate the plan
    assert large < 2 * small, f"plan grew with k: {small} -> {large}"
    rows = df.collect()
    assert rows and all(r.query_id in (0, 1) for r in rows)
    # deterministic across runs
    again = plan_len(256)[1].collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
