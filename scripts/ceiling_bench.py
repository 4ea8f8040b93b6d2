"""Same-day hardware-ceiling calibration for scaling measurements:

1. raw CPU across OS processes (Python spin loop) — what the VM's
   cores can actually deliver at 8 vs 32 ways;
2. Spark single-JVM allocation-heavy compute (md5 scan-agg, 100M rows);
3. Spark single-JVM pure shuffle (groupBy 100M rows -> 10M keys).

(2) vs (1) isolates the shared-young-gen wall of local[N] mode; (3) is
the shuffle ceiling.  Run this next to any scaling table so the
numbers carry their own context — cross-day ceilings on this VM move
by 2x+.  Prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from multiprocessing import Pool

SPARK_CODE = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from entity_resolution_pipeline_spark.session import get_spark
cpus = {cpus}
spark = get_spark("ceiling", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(100_000_000)
t0 = time.time()
df.select(F.md5(F.col("id").cast("string")).alias("h")).agg(F.count(F.col("h"))).collect()
t_cpu = time.time() - t0
t0 = time.time()
df.groupBy(F.pmod(F.col("id"), 10_000_000).alias("k")).agg(F.count("*")).agg(F.count("*")).collect()
t_shuf = time.time() - t0
print("RESULT", t_cpu, t_shuf)
"""


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def _spark(cpus: int) -> tuple[float, float]:
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    out = subprocess.run(
        [sys.executable, "-c", SPARK_CODE.format(repo=repo, cpus=cpus)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, a, b = line.split()
            return float(a), float(b)
    raise RuntimeError(out.stderr[-500:])


def main() -> None:
    raw = {}
    for n in (8, 32):
        with Pool(n) as p:
            raw[n] = sum(p.map(_burn, range(n))) / 2.0  # iters/sec aggregate
    spark = {}
    for n in (8, 32):
        a, b = _spark(n), _spark(n)
        spark[n] = (min(a[0], b[0]), min(a[1], b[1]))  # elementwise min-of-2
    print(
        json.dumps(
            {
                "metric": "hardware_ceilings_8_to_32",
                "raw_cpu_scaling": round(raw[32] / raw[8], 2),
                "spark_jvm_cpu_scaling": round(spark[8][0] / spark[32][0], 2),
                "spark_shuffle_scaling": round(spark[8][1] / spark[32][1], 2),
                "detail": {
                    "raw_iters_per_sec": raw,
                    "spark_md5_sec": {n: spark[n][0] for n in spark},
                    "spark_shuffle_sec": {n: spark[n][1] for n in spark},
                },
            }
        )
    )


if __name__ == "__main__":
    main()
