"""Reference-scale benchmark: time the engine's block+match stage on
the reference's own ACM/DBLP data (the workload evaluate_pipeline.py
times at :65-70, 'Time needed for blocking and matching'), at ×1 and
×R replication.

The reference's best config runs 0.159-0.298 s single-core on this
data (output/result_20240202-215248.csv); Spark's ~2 s fixed JVM/job
overhead dominates a sub-second workload, so the honest comparison is
the MARGINAL per-workload time at ×R: (T(R) − T(1)) / (R − 1) — fixed
overhead cancels, leaving pure per-workload throughput.  Replicas are
blocking-scoped (scope_col) so each replica reproduces exactly the
reference workload: pair count scales linearly, matched pairs = 1690·R.

Usage: python scripts/ref_bench.py [R=10]   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def replicate(df, r: int):
    return df.crossJoin(
        df.sparkSession.range(r).select(F.col("id").alias("replica"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from entity_resolution_pipeline_spark.operators.linkage import (
        bipartite_candidate_pairs,
        load_publications,
        score_publication_pairs,
    )
    from entity_resolution_pipeline_spark.session import ensure_parallelism, get_spark

    spark = get_spark("ref-bench", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    acm = ensure_parallelism(
        load_publications(spark, "/root/reference/data/ACM_1995_2004.csv")
    ).localCheckpoint(eager=True)
    dblp = ensure_parallelism(
        load_publications(spark, "/root/reference/data/DBLP_1995_2004.csv")
    ).localCheckpoint(eager=True)

    def run(r: int) -> tuple[float, int]:
        if r == 1:
            l, rgt, scope = acm, dblp, None
        else:
            l = replicate(acm, r).withColumn(
                "rid", F.concat("replica", F.lit("|"), "paperId")
            ).localCheckpoint(eager=True)
            rgt = replicate(dblp, r).withColumn(
                "rid", F.concat("replica", F.lit("|"), "paperId")
            ).localCheckpoint(eager=True)
            scope = "replica"
        id_col = "paperId" if r == 1 else "rid"
        t0 = time.time()
        pairs = bipartite_candidate_pairs(l, rgt, id_col=id_col, scope_col=scope)
        matched = score_publication_pairs(pairs, l, rgt, id_col=id_col).where(
            F.col("similarity") > 0.8
        )
        n = matched.count()
        return time.time() - t0, n

    # min-of-2 within a warm JVM: the marginal-time subtraction removes
    # the per-job fixed costs that remain
    t1 = min(run(1)[0], run(1)[0])
    tr, n_r = run(reps)
    tr = min(tr, run(reps)[0])
    marginal = (tr - t1) / (reps - 1)
    print(
        json.dumps(
            {
                "metric": "ref_linkage_marginal_sec",
                "value": round(marginal, 3),
                "unit": "sec/workload",
                "queries": {
                    "ref_x1": round(t1, 3),
                    f"ref_x{reps}": round(tr, 3),
                },
                "extras": {
                    "replicas": reps,
                    "matched_at_xR": n_r,
                    "reference_best_sec": 0.159,
                    "reference_range_sec": [0.159, 0.298],
                    "marginal_vs_reference_best": round(marginal / 0.159, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
