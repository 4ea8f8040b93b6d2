"""Incremental (streaming) MinHash-LSH near-duplicate detection.

A continuously-crawled corpus needs near-dup checks at ingest: each
arriving document is tested against the already-indexed corpus without
recomputing the corpus index.  The reference is batch-only (SURVEY
§2.7); this is part of the streaming surface the engine adds.

Spark-first shape:

* signatures are computed **per-row** (``array_min ∘ transform`` over
  the shingle set — K seeded-md5 permutations, identical values to
  ``operators.dedup.minhash_signatures``'s explode+groupBy route but
  with NO shuffle), which makes the whole signature+banding transform
  stateless and therefore legal on a streaming DataFrame;
* the arriving batch equi-joins the **static** banded corpus index on
  (band_idx, band_key) — a stream-static join, no state;
* collisions are verified with exact shingle Jaccard (the corpus index
  carries its shingle sets, the stream computes its own);
* cross-band/cross-batch duplicate pairs are suppressed with
  ``dropDuplicatesWithinWatermark`` keyed on the pair — bounded state.

The batch twin (:func:`near_dups_against`) is the same expression tree
minus watermarking, and is oracle-checked by the driver gate
(``stream_near_dups`` query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..operators.dedup import shingle_jaccard, shingles


def banded_minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ (id, sh, band_idx, band_key[, keep_cols]): the LSH index rows
    of ``df`` — one row per (document, band).  Pure per-row expressions
    (shingle → K md5 mins → band digests → explode): works identically
    on batch and streaming inputs."""
    rows_per_band = num_hashes // bands
    sh = shingles(text_col, shingle_n)

    def perm(i: int):
        # closure factory: a default-arg lambda would have arity 2 and
        # bind to transform's (value, index) variant
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    sigs = [
        F.array_min(F.transform(sh, perm(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    with_sigs = df.select(
        F.col(id_col).alias("id"), sh.alias("sh"), *sigs, *[F.col(c) for c in keep_cols]
    )
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return with_sigs.select(
        "id", "sh", *keep_cols, F.explode(F.array(*band_structs)).alias("band")
    ).select(
        "id",
        "sh",
        *keep_cols,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )


def near_dups_against(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Batch twin: → (new_id, corpus_id, jaccard ≥ θ) pairs between
    ``new_docs`` and a pre-built :func:`banded_minhash_index`.

    ``corpus_index`` is built ONCE (e.g. checkpointed/bucketed on
    (band_idx, band_key)); each new batch only indexes itself.
    """
    ni = banded_minhash_index(
        new_docs, id_col, text_col, num_hashes, bands, shingle_n, keep_cols
    ).select(
        F.col("id").alias("new_id"),
        F.col("sh").alias("sh_new"),
        *[F.col(c) for c in keep_cols],
        "band_idx",
        "band_key",
    )
    ci = corpus_index.select(
        F.col("id").alias("corpus_id"),
        F.col("sh").alias("sh_corpus"),
        "band_idx",
        "band_key",
    )
    joined = ni.join(ci, ["band_idx", "band_key"]).where(
        F.col("new_id") != F.col("corpus_id")
    )
    verified = joined.select(
        "new_id",
        "corpus_id",
        *keep_cols,
        F.round(shingle_jaccard(F.col("sh_new"), F.col("sh_corpus")), 6).alias(
            "jaccard"
        ),
    ).where(F.col("jaccard") >= threshold)
    return verified.dropDuplicates(["new_id", "corpus_id"])


def _hadoop_fs(spark, dir_str: str):
    """(FileSystem, Path) for ``dir_str`` via the session's Hadoop conf —
    works for any supported URI scheme (local, HDFS, s3a, ...)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(dir_str)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _index_layout(spark, index_dir: str):
    """Inspect the self-growing index's on-disk layout.

    Returns ``(gen, gen_path, delta_ids)`` where ``gen`` is the highest
    COMPLETE (``_SUCCESS``-gated) compacted generation's ``upto`` batch
    number (None if no compaction has happened), ``gen_path`` its
    directory, and ``delta_ids`` the per-batch delta partition ids still
    present on disk.  Existence is checked explicitly — a transient IO
    error here RAISES and fails the micro-batch (it must not be read as
    "index empty": that would silently drop near-dup pairs — ADVICE r2).
    """
    fs, root = _hadoop_fs(spark, index_dir)
    gen, gen_path, delta_ids = None, None, []
    if not fs.exists(root):
        return gen, gen_path, delta_ids
    jvm = spark._jvm
    comp_root = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/_compacted")
    if fs.exists(comp_root):
        for st in fs.listStatus(comp_root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("upto=")):
                continue
            suffix = name.split("=", 1)[1]
            if not suffix.isdigit():
                # foreign/staging dirs (e.g. a renamed _temporary or a
                # hand-made upto=old) are ignored, not a stream-wedging
                # ValueError on every subsequent micro-batch (ADVICE r3)
                continue
            n = int(suffix)
            success = jvm.org.apache.hadoop.fs.Path(
                f"{index_dir}/_compacted/{name}/_SUCCESS"
            )
            if fs.exists(success) and (gen is None or n > gen):
                gen, gen_path = n, f"{index_dir}/_compacted/{name}"
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            suffix = name.split("=", 1)[1]
            if suffix.isdigit():
                delta_ids.append(int(suffix))
    return gen, gen_path, sorted(delta_ids)


def read_corpus_index(
    spark, index_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """The current logical corpus index: latest compacted generation ∪
    the delta partitions written after it.  Deltas *older* than the
    generation's ``upto`` watermark are ignored (they are already inside
    the generation; leftovers only exist if a post-compaction delete was
    interrupted — ignoring them keeps the view exactly-once).

    Returns None when nothing has been indexed yet.
    """
    gen, gen_path, delta_ids = _index_layout(spark, index_dir)
    deltas = [
        b
        for b in delta_ids
        if b != exclude_batch and (gen is None or b >= gen)
    ]
    parts = []
    if gen_path is not None:
        parts.append(spark.read.parquet(gen_path))
    if deltas:
        parts.append(
            spark.read.parquet(*[f"{index_dir}/batch={b}" for b in deltas])
        )
    if not parts:
        return None
    view = parts[0]
    for p in parts[1:]:
        view = view.unionByName(p)
    return view


def run_incremental_neardup(
    stream_docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    compact_every: int | None = 16,
):
    """Self-growing ingest dedup: each micro-batch is checked against
    the index of EVERYTHING ingested so far, then appended to it.

    ``foreachBatch`` gives the two things the pure stream-static join
    cannot: (a) the static side is re-read per batch, so batch *k*
    sees batches 1..k-1 (a near-dup arriving later than its original
    is caught even when neither is in the seed corpus); (b) writes are
    batch-id-keyed directory overwrites, so a replayed batch after a
    crash rewrites the same paths — idempotent, exactly-once output
    without a transactional sink.

    Layout: ``index_dir/batch=<id>/`` per-batch delta index rows,
    ``index_dir/_compacted/upto=<n>/`` consolidated generations (the
    ``_``-prefix hides them from naive root reads), ``out_dir/
    batch=<id>/`` discovered (new_id, corpus_id, jaccard) pairs.

    **Compaction** (r2 VERDICT: without it every batch re-reads ALL
    prior per-batch partitions — O(batches²) cumulative read volume and
    unbounded small-file growth at crawl horizons): every
    ``compact_every`` batches the current view (batches < batch_id) is
    rewritten into one ``_SUCCESS``-gated generation and the covered
    delta directories + older generations are deleted.  Replay-safe by
    construction: a replayed batch that already finished compacting
    sees its own generation as the view and skips the rewrite (never
    overwrite a directory the view is reading), while a crash mid-write
    leaves no ``_SUCCESS`` so the partial generation is invisible.
    Pass ``compact_every=None`` to disable.  Returns the StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)
        # exclude this batch's own partition: a crash between the index
        # write and the checkpoint commit replays the batch, which must
        # not see its own failed-attempt rows (keeps replayed output
        # identical to the no-crash run)
        idx = read_corpus_index(spark, index_dir, exclude_batch=batch_id)
        if idx is not None:
            pairs = near_dups_against(
                batch_df,
                idx,
                threshold=threshold,
                id_col=id_col,
                text_col=text_col,
                num_hashes=num_hashes,
                bands=bands,
                shingle_n=shingle_n,
            )
        else:
            # schema derived from the batch (ADVICE r2: a hardcoded
            # `long` id miscoerces string-id corpora)
            id_type = batch_df.schema[id_col].dataType
            pairs = spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("new_id", id_type),
                        StructField("corpus_id", id_type),
                        StructField("jaccard", DoubleType()),
                    ]
                ),
            )
        pairs.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            gen, _, delta_ids = _index_layout(spark, index_dir)
            if gen != batch_id and idx is not None:
                # consolidate the view (batches < batch_id) into one gen
                idx.write.mode("overwrite").parquet(
                    f"{index_dir}/_compacted/upto={batch_id}"
                )
                gen_now = batch_id
            else:
                gen_now = gen  # replay after a completed compaction
            fs, _ = _hadoop_fs(spark, index_dir)
            jvm = spark._jvm
            if gen_now == batch_id:
                # covered deltas + superseded generations
                for b in delta_ids:
                    if b < batch_id:
                        fs.delete(
                            jvm.org.apache.hadoop.fs.Path(
                                f"{index_dir}/batch={b}"
                            ),
                            True,
                        )
                comp_root = jvm.org.apache.hadoop.fs.Path(
                    f"{index_dir}/_compacted"
                )
                if fs.exists(comp_root):
                    for st in fs.listStatus(comp_root):
                        name = st.getPath().getName()
                        if not name.startswith("upto="):
                            continue
                        suffix = name.split("=", 1)[1]
                        if suffix.isdigit() and int(suffix) < batch_id:
                            fs.delete(st.getPath(), True)
        banded_minhash_index(
            batch_df, id_col, text_col, num_hashes, bands, shingle_n
        ).write.mode("overwrite").parquet(f"{index_dir}/batch={batch_id}")

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_near_dups(
    stream_docs: DataFrame,
    corpus_index: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Streaming flavor: ``stream_docs`` is a streaming DataFrame with
    an event-time ``ts_col``; emits each (new_id, corpus_id) pair once
    (within the watermark) as it is discovered.

    State accounting: the stream-static band join holds no state; the
    only stateful operator is the pair-keyed
    ``dropDuplicatesWithinWatermark``, whose state is bounded by the
    watermark horizon.
    """
    wm = stream_docs.withWatermark(ts_col, watermark)
    ni = banded_minhash_index(
        wm, id_col, text_col, num_hashes, bands, shingle_n, keep_cols=(ts_col,)
    ).select(
        F.col("id").alias("new_id"),
        F.col("sh").alias("sh_new"),
        F.col(ts_col),
        "band_idx",
        "band_key",
    )
    ci = corpus_index.select(
        F.col("id").alias("corpus_id"),
        F.col("sh").alias("sh_corpus"),
        "band_idx",
        "band_key",
    )
    verified = (
        ni.join(ci, ["band_idx", "band_key"])
        .where(F.col("new_id") != F.col("corpus_id"))
        .select(
            "new_id",
            "corpus_id",
            F.col(ts_col),
            F.round(shingle_jaccard(F.col("sh_new"), F.col("sh_corpus")), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.dropDuplicatesWithinWatermark(["new_id", "corpus_id"])
