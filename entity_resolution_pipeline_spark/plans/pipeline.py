"""The end-to-end ER pipeline: synth → extract → block → score → cluster
→ evaluate, each stage checkpointed and resumable.

Replaces the reference's eager single-process lifecycle
(run_pipeline.py:22-40, SURVEY §3.1) with stage functions over a
:class:`TableCatalog`: a stage re-runs only when its checkpoint is
absent or its config fingerprint changed (SURVEY §3.4 target
lifecycle).  ``spark-submit --py-files er.zip -m …pipeline --stage all``
runs the same code on a real cluster.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.blocking import (
    block_stats,
    capped_postings,
    pairs_from_postings,
)
from ..operators.clustering import assign_clusters, cluster_representatives, connected_components
from ..operators.evaluate import PairMetrics, pairwise_f1
from ..operators.extract import extract_fields, rid_collision_count, rid_expr
from ..operators.matching import matched_pairs, score_pairs
from ..sources.catalog import TableCatalog
from ..sources.synth import labeled_pairs, synth_pages

STAGES = ("synth", "extract", "block", "score", "cluster")


def _fingerprint(cfg: PipelineConfig, stage: str, extra: dict | None = None) -> str:
    blob = json.dumps({"cfg": asdict(cfg), "stage": stage, **(extra or {})}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class ERPipeline:
    def __init__(
        self,
        spark: SparkSession,
        catalog: TableCatalog,
        cfg: PipelineConfig | None = None,
        num_entities: int = 1000,
    ):
        self.spark = spark
        self.catalog = catalog
        self.cfg = cfg or PipelineConfig()
        self.num_entities = num_entities

    # each stage: skip when checkpoint exists with matching fingerprint
    def _run_stage(self, name: str, build, force: bool = False, **fp_extra) -> DataFrame:
        fp = _fingerprint(self.cfg, name, {"n": self.num_entities, **fp_extra})
        if not force and self.catalog.exists(name, fp):
            return self.catalog.read(name)
        return self.catalog.write(name, build(), fingerprint=fp)

    def synth(self, force: bool = False) -> DataFrame:
        return self._run_stage(
            "pages", lambda: synth_pages(self.spark, self.num_entities), force
        )

    def extract(self, force: bool = False) -> DataFrame:
        def build():
            return extract_fields(
                self.catalog.read("pages"), id_bits=self.cfg.id_bits
            )

        out = self._run_stage("extracted", build, force)
        # rid is a digest of url; a collision would silently merge two
        # records downstream, so fail loudly here (one cheap agg over
        # the checkpoint — see extract.rid_collision_count).
        collisions = rid_collision_count(out)
        if collisions:
            raise RuntimeError(
                f"{collisions} rid collision(s) in extract output — "
                "rerun with PipelineConfig(id_bits=128) for this corpus"
            )
        return out

    def block(self, force: bool = False) -> DataFrame:
        # two checkpoints: capped postings first (the pair self-join
        # evaluates its input once per side — materializing postings
        # stops the explode+normalize subtree running 4×), then pairs
        # keyed on the compact rid (8-byte shuffle rows)
        def postings():
            ext = self.catalog.read("extracted")
            return capped_postings(
                ext, self.cfg.blocking, id_col="rid", text_col="combined"
            )

        self._run_stage("postings", postings, force)

        def build():
            return pairs_from_postings(
                self.catalog.read("postings"), self.cfg.blocking
            )

        pairs = self._run_stage("pairs", build, force)

        # skew metrics alongside the checkpoint (north-rule observability)
        def stats():
            return block_stats(self.catalog.read("postings"))

        self._run_stage("block_stats", stats, force)
        return pairs

    def score(self, force: bool = False) -> DataFrame:
        def build():
            ext = self.catalog.read("extracted")
            pairs = self.catalog.read("pairs")
            return matched_pairs(
                score_pairs(pairs, ext, self.cfg.matching, id_col="rid"),
                self.cfg.matching,
            )

        return self._run_stage("matched", build, force)

    def cluster(self, force: bool = False) -> DataFrame:
        def build():
            ext = self.catalog.read("extracted")
            matched = self.catalog.read("matched")
            return assign_clusters(ext, matched, id_col="rid")

        clustered = self._run_stage("clustered", build, force)

        def reps():
            # url-keyed labels: representative stays the human-readable
            # min(url) even though clustering ran on compact rids
            labels = clustered.select(
                F.col("url").alias("id"), F.col("entity_cluster").alias("component_id")
            )
            return cluster_representatives(labels, self.cfg.clustering)

        self._run_stage("representatives", reps, force)
        return clustered

    def evaluate(self) -> PairMetrics:
        # gold pairs mapped into rid space by the same deterministic
        # hash (respecting cfg.id_bits) — no join needed
        gold = labeled_pairs(self.catalog.read("pages")).select(
            rid_expr("url1", self.cfg.id_bits).alias("id1"),
            rid_expr("url2", self.cfg.id_bits).alias("id2"),
        )
        pred = self.catalog.read("matched").select("id1", "id2")
        return pairwise_f1(pred, gold)

    def run(self, stages=STAGES, force: bool = False) -> None:
        for s in stages:
            getattr(self, s)(force=force)


def main() -> None:  # pragma: no cover — spark-submit entry
    import argparse

    from ..session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=("all", *STAGES, "evaluate"))
    ap.add_argument("--warehouse", default="/tmp/er_warehouse")
    ap.add_argument("--entities", type=int, default=1000)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    spark = get_spark("er-pipeline")
    pipe = ERPipeline(spark, TableCatalog(spark, args.warehouse), num_entities=args.entities)
    if args.stage == "all":
        pipe.run(force=args.force)
        print(json.dumps(asdict(pipe.evaluate())))
    elif args.stage == "evaluate":
        print(json.dumps(asdict(pipe.evaluate())))
    else:
        getattr(pipe, args.stage)(force=args.force)


if __name__ == "__main__":
    main()
