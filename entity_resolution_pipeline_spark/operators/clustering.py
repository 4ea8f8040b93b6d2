"""Stage 4 — transitive clustering (connected components).

The reference collects the whole match graph to the driver
(``rdd.groupByKey().collectAsMap()`` at distributed_er_pipeline.py:134)
and runs recursive DFS (pipeline/clustering.py:18-37) — the scalability
cliff named in SURVEY §3.2.  Here: **large-star / small-star** label
propagation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) as iterative DataFrame hash-joins.  Converges in
O(log n) rounds; each round is two join+groupBy-min passes over the
edge set, ``localCheckpoint``-ed to truncate lineage.  The driver never
holds a single edge.

Semantics identical to the reference DFS: partition of nodes into
maximal connected sets; our component id is ``min(member id)`` —
deterministic, unlike the reference's first-seen DFS root
(clustering.py:46-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ClusteringConfig


def _dedup(edges: DataFrame, parts: int | None = None) -> DataFrame:
    out = edges.where(F.col("src") != F.col("dst"))
    if parts:
        # pins the dropDuplicates shuffle width WITHOUT touching session
        # conf (ADVICE r2: a conf mutation leaks to concurrent queries on
        # the same session): the explicit hash repartition on the dedup
        # key satisfies the aggregate's required clustering, so Catalyst
        # elides the aggregate's own exchange — one shuffle either way,
        # now at frontier-sized width.
        out = out.repartition(parts, "src", "dst")
    return out.dropDuplicates(["src", "dst"])


def _large_star(edges: DataFrame, parts: int | None = None) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if parts:
        # one explicit exchange on src feeds BOTH the groupBy (clustering
        # satisfied → its exchange elided) and the src-equi-join (both
        # sides end up hash(src, parts) → no join exchange)
        sym = sym.repartition(parts, "src")
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", F.col("src")))
    return _dedup(
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst")),
        parts,
    )


def _small_star(edges: DataFrame, parts: int | None = None) -> DataFrame:
    """Orient edges toward smaller ids; connect each smaller neighbor —
    and u itself — to the minimum of that in-neighborhood."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
    ).where(F.col("hi") != F.col("lo"))
    if parts:
        oriented = oriented.repartition(parts, "hi")
    mins = oriented.groupBy("hi").agg(F.min("lo").alias("mn"))
    lo_edges = oriented.join(mins, "hi").select(
        F.col("lo").alias("src"), F.col("mn").alias("dst")
    )
    hi_edges = mins.select(F.col("hi").alias("src"), F.col("mn").alias("dst"))
    return _dedup(lo_edges.unionByName(hi_edges), parts)


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: overflow-free under ANSI mode and order-insensitive.
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


#: target edge rows per shuffle partition inside the star fixpoint loop.
#: The loop is task-launch-overhead-bound on small frontiers (session-
#: default widths measured 10.3 s vs 5-9 s for size-proportional widths
#: at sf0.1), but fully serializing it (1 partition) gambles on noise —
#: so width = clamp(ceil(n/250k), 8, session default): never below
#: 8-way parallel, never the full session width on a shrunken frontier.
_EDGE_ROWS_PER_PARTITION = 250_000
_MIN_LOOP_PARTITIONS = 8
#: star rounds applied between checkpoints/convergence signatures.
#: Measured (within-JVM, 834k-edge frontier, min-of-2): doubling rounds
#: LOSES — the overshoot past the fixpoint costs more than the saved
#: checkpoint/signature jobs (8 cores: 15.0 s vs 8.2 s single-round).
_ROUNDS_PER_CHECKPOINT = 1
#: Size the loop's shuffle width to the frontier.  Same measurement:
#: single-round sized = 4.5 s @8 / 5.8 s @32 vs session-width 5.2 / 12.5.
_SIZE_LOOP_PARTITIONS = True


def connected_components(
    edges: DataFrame, cfg: ClusteringConfig | None = None
) -> DataFrame:
    """edges(src,dst) → labels(id, component_id); component_id = min id
    of the component.  Nodes appearing in no edge are absent (caller
    coalesces singletons, see :func:`assign_clusters`).

    Round mechanics (r1 BENCH showed the loop's *fixed* costs —
    checkpoints, signature jobs, task launches across
    ``spark.sql.shuffle.partitions`` tasks per stage — scaling
    *negatively* 8→32 cores on a small frontier): per-round shuffle
    width is sized to the live frontier (clamp(|edges|/250k, 8,
    session default)), so a shrinking edge set stops paying full-width
    task launches per stage.  Measured on an 834k-edge frontier
    (within one JVM, min-of-2): 4.5 s @8 cores / 5.8 s @32 vs 5.2 /
    12.5 at session width.  Batching extra star rounds between
    convergence checks was measured and rejected — overshooting the
    fixpoint costs more than the saved per-round jobs.
    """
    cfg = cfg or ClusteringConfig()
    spark = edges.sparkSession
    default_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # type-preserving: long ids stay long (8-byte shuffle rows — at
    # 10^12 edges the string cast would triple shuffle volume); any
    # orderable id type works since the algorithm only needs min/</>
    cur = _dedup(edges.select("src", "dst")).localCheckpoint(eager=True)
    sig = _signature(cur)
    for _ in range(cfg.max_rounds):
        # Frontier-sized shuffle width via explicit repartition-by-key
        # INSIDE the star steps — never by mutating the session-global
        # spark.sql.shuffle.partitions (ADVICE r2: a concurrent query on
        # the same SparkSession would silently run at the shrunken
        # width mid-loop).
        parts = None
        if _SIZE_LOOP_PARTITIONS:
            parts = max(
                min(_MIN_LOOP_PARTITIONS, int(default_sp)),
                min(int(default_sp), -(-sig[0] // _EDGE_ROWS_PER_PARTITION)),
            )
        nxt = cur
        for _ in range(_ROUNDS_PER_CHECKPOINT):
            nxt = _small_star(_large_star(nxt, parts), parts)
        nxt = nxt.localCheckpoint(eager=True)
        nsig = _signature(nxt)
        cur = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {cfg.max_rounds} rounds"
        )
    # Fixpoint edges form stars (node → root). Roots label themselves.
    labels = cur.select(F.col("src").alias("id"), F.col("dst").alias("component_id"))
    roots = cur.select(F.col("dst").alias("id")).distinct().withColumn(
        "component_id", F.col("id")
    )
    return labels.unionByName(roots).dropDuplicates(["id"])


def assign_clusters(
    records: DataFrame, matched: DataFrame, id_col: str = "url"
) -> DataFrame:
    """records + matched(id1,id2) → records ⊕ ``entity_cluster`` column.

    Singletons (no match edge) get their own id as cluster — every row
    keeps a deterministic entity assignment (resume-stable).
    """
    edges = matched.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    labels = connected_components(edges)
    return (
        records.join(labels, records[id_col] == labels["id"], "left")
        .drop("id")
        .withColumn("entity_cluster", F.coalesce("component_id", F.col(id_col)))
        .drop("component_id")
    )


#: greedy_bipartite_clusters funnels every pair into ONE applyInPandas
#: task (the algorithm is order-sequential); above this many pairs the
#: operator refuses to run rather than OOM an executor (r2 VERDICT #3).
GREEDY_MAX_PAIRS = 2_000_000


def greedy_bipartite_clusters(
    matched: DataFrame, max_pairs: int = GREEDY_MAX_PAIRS
) -> DataFrame:
    """C4 — the reference's greedy incremental clustering
    (scripts/er_vectorized_pipeline.py:98-131), provided for semantic
    parity: pairs are scanned in a deterministic total order; a pair
    whose two endpoints already belong to (possibly different) clusters
    is SKIPPED (no merge — greedy yields a *finer* partition than
    connected components), a fresh cluster absorbs the one-hop
    neighborhood of its founding pair.

    The algorithm is order-sequential BY DEFINITION — parallelizing it
    changes its results — so it runs as a single-group applyInPandas
    kernel and is suitable only for model-sized match sets (the
    reference's own usage).  The scale path is :func:`connected_components`
    (C3), which this repo treats as the required clustering semantics.

    matched(id1, id2) → (side 'left'|'right', rid, cluster_id); order is
    (id1, id2) ascending (the reference uses dataframe row order, which
    for its sorted inputs is the same).  Id types are preserved (the
    kernel only needs sortable ids — ADVICE r2: the old cast-to-long
    silently nulled string paperIds).  Struct ids (id_bits=128 rids)
    pass through the kernel as canonical hex strings but are decoded
    back to the ORIGINAL struct ids on the way out (ADVICE r3), so the
    output joins directly to the records; only genuinely mixed-type
    id1/id2 return string rids.  Inputs larger than ``max_pairs`` raise — use
    :func:`connected_components` (C3), the scale path, instead.
    """
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["id1", "id2"]).reset_index(drop=True)
        by_left: dict = {}
        by_right: dict = {}
        for r in pdf.itertuples():
            by_left.setdefault(r.id1, []).append(r.id2)
            by_right.setdefault(r.id2, []).append(r.id1)
        left_c: dict = {}
        right_c: dict = {}
        nxt = 0
        for r in pdf.itertuples():
            a, d = r.id1, r.id2
            if a in left_c and d in right_c:
                continue
            if a not in left_c and d not in right_c:
                left_c[a] = nxt
                right_c[d] = nxt
                for other_d in by_left[a]:
                    if other_d not in right_c:
                        right_c[other_d] = nxt
                for other_a in by_right[d]:
                    if other_a not in left_c:
                        left_c[other_a] = nxt
                nxt += 1
            elif a in left_c:
                right_c[d] = left_c[a]
            else:
                left_c[a] = right_c[d]
        return pd.DataFrame(
            {
                "side": ["left"] * len(left_c) + ["right"] * len(right_c),
                "rid": list(left_c.keys()) + list(right_c.keys()),
                "cluster_id": list(left_c.values()) + list(right_c.values()),
            }
        )

    from pyspark.sql.types import StructType as _St

    t1 = matched.schema["id1"].dataType
    t2 = matched.schema["id2"].dataType
    decode_map = None
    if t1.simpleString() == t2.simpleString() and not isinstance(t1, _St):
        sel = matched.select("id1", "id2")
        rid_type = t1.simpleString()
    else:
        # mixed types, or struct ids (id_bits=128 rids): Arrow delivers
        # struct cells to pandas as dicts — unsortable/unhashable in the
        # kernel — so canonicalize to an orderable string.  Long fields
        # use the sign-flip + zero-padded-hex encoding (string order ==
        # signed numeric order); this is a model-sized parity kernel, so
        # the string blow-up is irrelevant.
        _SIGN = -(2**63)

        def enc(col, dt):
            from pyspark.sql.types import LongType

            if isinstance(dt, LongType):
                return F.lpad(F.hex(col.bitwiseXOR(F.lit(_SIGN))), 16, "0")
            return col.cast("string")

        def canon(c):
            dt = matched.schema[c].dataType
            if isinstance(dt, _St):
                parts = [
                    enc(F.col(f"{c}.{f.name}"), f.dataType) for f in dt.fields
                ]
                return F.concat_ws(":", *parts).alias(c)
            return F.col(c).cast("string").alias(c)

        sel = matched.select(canon("id1"), canon("id2"))
        rid_type = "string"
        if t1.simpleString() == t2.simpleString():
            # same id type on both sides (the id_bits=128 struct case):
            # keep a canonical→original map so the returned rids are the
            # ORIGINAL ids, directly joinable back to the records
            # (ADVICE r3: returning the hex encoding forced callers to
            # re-derive it).  Genuinely mixed-type sides stay strings —
            # no single column type could carry both.
            decode_map = (
                matched.select(canon("id1").alias("rid"), F.col("id1").alias("_orig"))
                .unionByName(
                    matched.select(canon("id2").alias("rid"), F.col("id2").alias("_orig"))
                )
                .dropDuplicates(["rid"])
                # checkpointed like `sel` below: the decode join-back must
                # read a materialization, not re-execute the full upstream
                # scoring DAG a second time (ADVICE r4) — this also removes
                # the reliance on upstream determinism for the
                # canonical→original agreement between the two reads
                .localCheckpoint(eager=True)
            )
    # one materialization: the guard count and the kernel both read the
    # checkpoint instead of executing the upstream scoring DAG twice
    sel = sel.localCheckpoint(eager=True)
    n = sel.count()
    if n > max_pairs:
        raise ValueError(
            f"greedy_bipartite_clusters got {n} pairs > max_pairs="
            f"{max_pairs}: this parity kernel runs in a SINGLE task by "
            "definition (order-sequential algorithm) and would OOM an "
            "executor at this size. Use connected_components (C3) for "
            "web-scale match sets, or raise max_pairs explicitly."
        )
    out = sel.groupBy(F.lit(1).alias("_g")).applyInPandas(
        kernel, f"side string, rid {rid_type}, cluster_id long"
    )
    if decode_map is not None:
        out = out.join(decode_map, "rid").select(
            "side", F.col("_orig").alias("rid"), "cluster_id"
        )
    return out


def cluster_representatives(
    labels: DataFrame, cfg: ClusteringConfig | None = None
) -> DataFrame:
    """(id, component_id) → (component_id, representative, cluster_size)
    for clusters meeting the size floor.  Representative = min(id) —
    deterministic (C5; reference keeps the first ACM member,
    clustering.py:44-51)."""
    cfg = cfg or ClusteringConfig()
    return (
        labels.groupBy("component_id")
        .agg(F.min("id").alias("representative"), F.count("*").alias("cluster_size"))
        .where(F.col("cluster_size") >= cfg.min_cluster_size)
    )


def deduplicate_records(
    records: DataFrame, clustered: DataFrame, id_col: str = "url"
) -> DataFrame:
    """Keep one representative row per entity cluster (C6/C8).

    The reference drops non-representatives with ``~isin(python_list)``
    (clustering.py:54-55) — a driver-side list that cannot scale; here
    it is a distributed min + semi-join.
    """
    reps = (
        clustered.groupBy("entity_cluster")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return records.join(reps, id_col, "left_semi")
