"""Resumable corpus-curation pipeline: quality gate → exact dedup →
near-dup removal → stratified sample.

Composes the training-data operators (`operators/corpus.py`,
`operators/dedup.py`, `operators/clustering.py`) into the staged,
checkpointed shape of the ER pipeline (`plans/pipeline.py`): every
stage materializes to the :class:`TableCatalog` with a config
fingerprint, so a crashed or re-run invocation skips completed stages
and any knob change reruns exactly the affected suffix.

Stage semantics (each one shuffle-bounded, no driver data):

1. ``gate``     — C4-style per-rule gate, keep==true rows survive
                  (per-rule kill counts land in the metrics table);
2. ``exact``    — content-hash exact dedup (min-id representative);
3. ``neardup``  — MinHash-LSH near-dup pairs → connected components →
                  min-id representative per cluster survives;
4. ``sample``   — deterministic per-language stratified sample.

Fingerprints chain: each stage hashes (input path, its OWN knobs, its
upstream stage's fingerprint), so changing only the sample rates
reruns just ``sample``, while a threshold change reruns ``neardup`` +
``sample`` and a different ``--input`` invalidates everything.  Every
stage method ensures its upstream first, so a stale mixed-config read
is impossible.

CLI::

    python -m entity_resolution_pipeline_spark.plans.curate \
        --input /root/testdata/sf0.01/documents.parquet \
        --warehouse /tmp/curated --rates en=0.5,de=0.2 --default-rate 0.1

prints one JSON line with per-stage row counts and kill rates.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import connected_components
from ..operators.corpus import c4_quality_gate, stratified_sample
from ..operators.dedup import dedup_exact, minhash_near_duplicates
from ..sources.catalog import TableCatalog

STAGES = ("gate", "exact", "neardup", "sample")


@dataclass(frozen=True)
class CurationConfig:
    rates: dict = field(default_factory=dict)  # lang -> keep probability
    default_rate: float = 1.0
    minhash_threshold: float = 0.5
    id_col: str = "doc_id"
    text_col: str = "text"
    stratum_col: str = "lang"


def _digest(payload: dict) -> str:
    blob = json.dumps(payload, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class CurationPipeline:
    def __init__(
        self,
        spark: SparkSession,
        catalog: TableCatalog,
        input_path: str,
        cfg: CurationConfig | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.input_path = input_path
        self.cfg = cfg or CurationConfig()

    # per-stage knobs — ONLY what that stage's output depends on, so a
    # knob change invalidates exactly its suffix of the chain
    def _stage_knobs(self, name: str) -> dict:
        cfg = self.cfg
        common = {"id_col": cfg.id_col, "text_col": cfg.text_col}
        return {
            "gate": common,
            "exact": common,
            "neardup": {**common, "threshold": cfg.minhash_threshold},
            "sample": {
                "id_col": cfg.id_col,
                "stratum_col": cfg.stratum_col,
                "rates": cfg.rates,
                "default_rate": cfg.default_rate,
            },
        }[name]

    def _fingerprint(self, name: str, upstream_fp: str | None) -> str:
        return _digest(
            {
                "stage": name,
                "knobs": self._stage_knobs(name),
                "upstream": upstream_fp,
                "input": self.input_path,
            }
        )

    def _run_stage(
        self, name: str, upstream_fp: str | None, build, force: bool
    ) -> tuple[DataFrame, str]:
        fp = self._fingerprint(name, upstream_fp)
        if not force and self.catalog.exists(name, fp):
            return self.catalog.read(name), fp
        return self.catalog.write(name, build(), fingerprint=fp), fp

    def _input(self) -> DataFrame:
        return self.spark.read.parquet(self.input_path)

    def gate(self, force: bool = False) -> DataFrame:
        return self._gate(force)[0]

    def _gate(self, force: bool = False) -> tuple[DataFrame, str]:
        cfg = self.cfg

        def build():
            docs = self._input()
            keep = c4_quality_gate(docs, cfg.id_col, cfg.text_col).where(
                F.col("keep")
            ).select(cfg.id_col)
            return docs.join(keep, cfg.id_col, "left_semi")

        return self._run_stage("gate", None, build, force)

    def exact(self, force: bool = False) -> DataFrame:
        return self._exact(force)[0]

    def _exact(self, force: bool = False) -> tuple[DataFrame, str]:
        cfg = self.cfg
        gated, gate_fp = self._gate()  # ensure upstream is current

        def build():
            return dedup_exact(gated, cfg.text_col, cfg.id_col)

        return self._run_stage("exact", gate_fp, build, force)

    def neardup(self, force: bool = False) -> DataFrame:
        return self._neardup(force)[0]

    def _neardup(self, force: bool = False) -> tuple[DataFrame, str]:
        cfg = self.cfg
        docs, exact_fp = self._exact()

        def build():
            pairs = minhash_near_duplicates(
                docs,
                id_col=cfg.id_col,
                text_col=cfg.text_col,
                threshold=cfg.minhash_threshold,
            )
            edges = pairs.select(
                F.col("id1").alias("src"), F.col("id2").alias("dst")
            )
            labels = connected_components(edges)
            # drop every clustered doc that is not its component's min-id
            drop = labels.where(F.col("id") != F.col("component_id")).select(
                F.col("id").alias(cfg.id_col)
            )
            return docs.join(drop, cfg.id_col, "left_anti")

        return self._run_stage("neardup", exact_fp, build, force)

    def sample(self, force: bool = False) -> DataFrame:
        return self._sample(force)[0]

    def _sample(self, force: bool = False) -> tuple[DataFrame, str]:
        cfg = self.cfg
        deduped, nd_fp = self._neardup()

        def build():
            return stratified_sample(
                deduped,
                cfg.rates,
                stratum_col=cfg.stratum_col,
                key_col=cfg.id_col,
                default_rate=cfg.default_rate,
            )

        return self._run_stage("sample", nd_fp, build, force)

    def run(self, force: bool = False) -> dict:
        for s in STAGES:
            getattr(self, s)(force=force)
        rows = {m["table"]: m["rows"] for m in self.catalog.metrics()}
        n_in = self._input().count()
        funnel = {"input": n_in, **{s: rows.get(s) for s in STAGES}}
        prev = n_in
        kill = {}
        for s in STAGES:
            cur = rows.get(s) or 0
            kill[s] = round(1.0 - cur / prev, 4) if prev else 0.0
            prev = cur
        return {"funnel": funnel, "kill_rate": kill}


def main() -> None:  # pragma: no cover — spark-submit entry
    import argparse

    from ..session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", default="/tmp/curation_warehouse")
    ap.add_argument("--rates", default="", help="lang=rate,lang=rate")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    rates = {}
    for part in filter(None, args.rates.split(",")):
        k, v = part.split("=", 1)
        rates[k] = float(v)
    spark = get_spark("corpus-curate")
    spark.sparkContext.setLogLevel("ERROR")
    pipe = CurationPipeline(
        spark,
        TableCatalog(spark, args.warehouse),
        args.input,
        CurationConfig(
            rates=rates,
            default_rate=args.default_rate,
            minhash_threshold=args.threshold,
        ),
    )
    print(json.dumps(pipe.run(force=args.force)))


if __name__ == "__main__":
    main()
