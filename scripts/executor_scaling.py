"""Executor-count scaling evidence: 1 → 2 → 4 separate JVM executors
(local[8] each), same per-executor end-to-end ER job per executor, run
concurrently — a weak-scaling CURVE across executor processes (r2
VERDICT #7 asked for the middle point).

`local[32]` is one JVM; its shared allocation path is a measured
ceiling (scripts/ceiling_bench.py) that a real multi-executor cluster
does not have.  Separate processes with separate heaps are the closest
faithful model of "N -> 4N executors" this sandbox allows (north rule).

Usage: python scripts/executor_scaling.py [--entities 500000]
(prints one JSON line)
"""

from __future__ import annotations

import argparse
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


def one(entities: int):
    # retry once: concurrent same-box JVMs occasionally lose a task
    # result to block-manager contention (TaskResultLost) — transient
    for attempt in (1, 2):
        try:
            t0 = time.time()
            r = sb._run_once(8, entities, 64, "join")
            return time.time() - t0, r["total"], r["pages"]
        except RuntimeError:
            if attempt == 2:
                raise


def level(k: int, entities: int):
    """k concurrent executor JVMs, same per-executor job: returns
    (slowest timed job, per-executor timed list, pages per executor)."""
    with ThreadPoolExecutor(k) as ex:
        rs = list(ex.map(lambda _: one(entities), range(k)))
    return max(r[1] for r in rs), [round(r[1], 1) for r in rs], rs[0][2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=500000)
    args = ap.parse_args()

    points = {}
    for k in (1, 2, 4):
        tk, per, pages = level(k, args.entities)
        points[k] = {
            "t_max_sec": round(tk, 1),
            "per_executor_timed": per,
            "weak_efficiency_vs_1": None,
            "aggregate_pages_per_sec": round(k * pages / tk, 1),
        }
    t1 = points[1]["t_max_sec"]
    for k in (2, 4):
        points[k]["weak_efficiency_vs_1"] = round(t1 / points[k]["t_max_sec"], 3)
    print(
        json.dumps(
            {
                "metric": "executor_weak_scaling_curve",
                "value": points[4]["weak_efficiency_vs_1"],
                "unit": "fraction",
                "entities_per_executor": args.entities,
                "points": points,
            }
        )
    )


if __name__ == "__main__":
    main()
