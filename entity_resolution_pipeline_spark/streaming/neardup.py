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

    Layout: ``index_dir/batch=<id>/`` banded index rows,
    ``out_dir/batch=<id>/`` discovered (new_id, corpus_id, jaccard)
    pairs.  Returns the StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)
        try:
            # exclude this batch's own partition: a crash between the
            # index write and the checkpoint commit replays the batch,
            # which must not see its own failed-attempt rows (keeps
            # replayed output identical to the no-crash run)
            idx = (
                spark.read.option("basePath", index_dir)
                .parquet(index_dir)
                .where(F.col("batch") != batch_id)
                .drop("batch")
            )
            have_index = True
        except Exception:
            have_index = False
        if have_index:
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
            pairs = spark.createDataFrame(
                [], "new_id long, corpus_id long, jaccard double"
            )
        pairs.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
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
