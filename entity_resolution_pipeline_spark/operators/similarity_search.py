"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus, dot products as ``F.zip_with`` +
``F.aggregate`` in double precision (pure Catalyst, no Python), ranked
with a window per query.

Scale path: LSH-bucketed ANN — deterministic hash-derived hyperplanes
(no RNG state: plane *p*'s component *d* is a pure function of
``md5(p:d)``), sign-bit bucket key, candidates share a bucket in ≥1 of
several hash tables.  Equi-join on (table, bucket) replaces the cross
join; recall is tunable by number of tables.  The reference has no
analog (SURVEY §2.7) — this is part of the training-data surface the
engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, left-to-right (portable order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns; 0 when either is a
    zero vector (guard against NaN)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, rank, score): exact cosine top-k.

    ``queries`` is broadcast (it is the small side by construction);
    the corpus is scanned once, embarrassingly parallel, no shuffle
    until the per-query top-k window — which AQE runs over
    ``count(queries)`` partitions.  Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random-hyperplane signatures, deterministic planes)
# ---------------------------------------------------------------------------


def _plane_component(table: int, plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    a pure function of (table, plane, dim) via xxhash64 — identical on
    every executor and every rerun (no RNG broadcast needed)."""
    h = F.xxhash64(F.lit(f"plane:{table}:{plane}"), dim)
    return (F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0) - 0.5


def hyperplane_bucket(vec: Column, table: int, num_planes: int = 8) -> Column:
    """Sign-bit bucket id of ``vec`` under ``num_planes`` deterministic
    hyperplanes of hash table ``table``.  Computed without exploding:
    per plane, Σ_d vec[d]·plane[d] via aggregate over the indices."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def projector(plane: int):
        # bind `plane` via closure factory: a default-arg lambda would
        # have arity 3 and break Spark's higher-order-function binding
        return lambda acc, d: acc + F.element_at(vec, d + 1).cast(
            "double"
        ) * _plane_component(table, plane, d)

    bits = []
    for p in range(num_planes):
        proj = F.aggregate(idx, F.lit(0.0), projector(p))
        bits.append((proj > 0).cast("int") * F.lit(2**p))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 4,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: score only candidates sharing an LSH
    bucket with the query in ≥1 of ``num_tables`` hash tables.

    Plan: both sides get ``num_tables`` (table, bucket) keys (explode),
    equi-join on the key, dedup, then exact cosine + window top-k on the
    surviving candidates.  At 10^12 vectors the bucket join touches
    ~corpus/2^planes per table per query instead of the full corpus.
    """

    def with_buckets(df: DataFrame, role: str) -> DataFrame:
        vec = F.col(vec_col)
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    hyperplane_bucket(vec, t, num_planes).alias("bucket"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            vec.alias(f"{role}_vec"),
            F.explode(buckets).alias("b"),
        ).select(f"{role}_id", f"{role}_vec", F.col("b.tbl").alias("tbl"), F.col("b.bucket").alias("bucket"))

    qb = with_buckets(queries, "query")
    cb = with_buckets(corpus, "neighbor")
    cands = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("query_vec"), F.col("neighbor_vec")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivf_assignments(
    corpus: DataFrame,
    num_cells: int = 16,
    lloyd_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """IVF coarse quantizer: deterministic k-means over the corpus.

    Seeds are hash-selected corpus vectors (no RNG state — resume-safe);
    each Lloyd round is assign (broadcast centroids, argmin cosine
    distance) + recompute means (groupBy cell).  Centroids are a small
    *model* (k rows), so collecting them to broadcast per round is the
    legitimate exception to no-driver-data.  Returns (assignments
    DataFrame ``(id, cell)``, centroid list).
    """
    from pyspark.sql.types import DoubleType

    n = corpus.count()
    stride = max(n // num_cells, 1)
    seeds = (
        corpus.where(F.pmod(F.xxhash64(F.col(id_col).cast("string")), stride) == 0)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(num_cells)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seeds]

    def assign(cents: list) -> DataFrame:
        cent_arr = F.array(
            *[
                F.array(*[F.lit(float(x)).cast(DoubleType()) for x in c])
                for c in cents
            ]
        )
        scored = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.array_max(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                    lambda i: F.struct(
                        cosine_sim(F.col(vec_col), F.element_at(cent_arr, i + 1)).alias("sim"),
                        i.alias("cell"),
                    ),
                )
            ).alias("best"),
        )
        return scored.select("id", "v", F.col("best.cell").alias("cell"))

    for _ in range(lloyd_rounds):
        assigned = assign(centroids)
        means = (
            assigned.select("cell", F.posexplode("v").alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("cell", F.col("dm.m").alias("centroid"))
            .collect()
        )
        new_cents = list(centroids)
        for r in means:
            new_cents[r["cell"]] = [float(x) for x in r["centroid"]]
        centroids = new_cents

    return assign(centroids).select("id", "cell"), centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the ``nprobe`` cells
    nearest each query (by centroid cosine).

    The scale path the brief names alongside LSH: the corpus is
    partitioned into ``num_cells`` inverted lists once; each query
    touches ~``nprobe/num_cells`` of the corpus via an equi-join on
    cell id.  Deterministic end-to-end.
    """
    from pyspark.sql.types import DoubleType

    assignments, centroids = ivf_assignments(
        corpus, num_cells=num_cells, id_col=id_col, vec_col=vec_col
    )
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)).cast(DoubleType()) for x in c]) for c in centroids]
    )
    # per query: nprobe best cells by centroid cosine
    probe = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                            lambda i: F.struct(
                                cosine_sim(F.col(vec_col), F.element_at(cent_arr, i + 1)).alias("sim"),
                                i.alias("cell"),
                            ),
                        )
                    )
                ),
                1,
                nprobe,
            )
        ).alias("p"),
    ).select("query_id", "qvec", F.col("p.cell").alias("cell"))

    members = assignments.join(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cvec")), "id"
    ).select(F.col("id").alias("neighbor_id"), "cell", "cvec")

    scored = (
        probe.join(members, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 6,
    num_planes: int = 10,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: → (id1, id2, score ≥ θ).

    Same LSH bucketing, self-join flavor with canonical id1 < id2.
    High-cosine pairs collide with probability (1 - θ̂/π)^planes per
    table; ``num_tables`` tables push recall toward 1 at θ=0.95.
    """
    vec = F.col(vec_col)
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_bucket(vec, t, num_planes).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )
    banded = df.select(
        F.col(id_col).alias("id"), vec.alias("v"), F.explode(buckets).alias("b")
    ).select("id", "v", F.col("b.tbl").alias("tbl"), F.col("b.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.v").alias("v1"),
            F.col("b.v").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
        .select(
            "id1",
            "id2",
            F.round(cosine_sim(F.col("v1"), F.col("v2")), 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
