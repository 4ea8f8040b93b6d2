"""Executor-count scaling evidence: 1 vs 4 separate JVM executors
(local[8] each), same per-executor 500k-entity end-to-end ER job, run
concurrently — weak scaling across executor processes.

`local[32]` is one JVM; its shared allocation path is a measured
ceiling (scripts/ceiling_bench.py) that a real multi-executor cluster
does not have.  Separate processes with separate heaps are the closest
faithful model of "N -> 4N executors" this sandbox allows (north rule).

Usage: python scripts/executor_scaling.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "sb", Path(__file__).resolve().parent / "scaling_bench.py"
)
sb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sb)


def one(_):
    t0 = time.time()
    r = sb._run_once(8, 500000, 64, "join")
    return time.time() - t0, r["total"], r["pages"]


def main() -> None:
    w1, t1, pages = one(0)
    t0 = time.time()
    with ThreadPoolExecutor(4) as ex:
        rs = list(ex.map(one, range(4)))
    t4 = max(r[1] for r in rs)
    print(
        json.dumps(
            {
                "metric": "executor_weak_scaling_1_to_4",
                "value": round(t1 / t4, 3),
                "unit": "fraction",
                "t1_timed_sec": round(t1, 1),
                "t4_timed_max_sec": round(t4, 1),
                "per_executor_timed": [round(r[1], 1) for r in rs],
                "aggregate_throughput_x": round(4 * t1 / t4, 2),
                "pages_per_executor": pages,
            }
        )
    )


if __name__ == "__main__":
    main()
