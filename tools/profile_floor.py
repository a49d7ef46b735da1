"""Decompose the per-query fixed floor (round-10 verdict ask #4).

For each named query, split the warm steady-state wall into:

- ``build``   — ``spec.fn(spark, sf_dir)`` (python plan construction +
  py4j round trips; includes any eager work an operator does at
  construction time);
- ``analyze`` — first ``df.schema`` touch (Catalyst analysis);
- ``exec``    — ``df.toArrow()`` (optimization + physical planning +
  job scheduling + compute + Arrow collect);

and count the Spark jobs the run launched (statusTracker delta) — the
job floor is ~20-50 ms scheduling overhead each at gate scale, so
``n_jobs`` tells how much of ``exec`` is irreducible scheduling.

Usage: python tools/profile_floor.py [--sf DIR] [--reps N] [query ...]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.runtime import release_caches
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or list(CORPUS)

    spark = get_spark("profile_floor")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    next(iter(CORPUS.values())).fn(spark, args.sf).limit(1).collect()

    def run(name: str):
        spec = CORPUS[name]
        jobs0 = len(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        df = spec.fn(spark, args.sf)
        t1 = time.time()
        df.schema  # force analysis
        t2 = time.time()
        try:
            df.toArrow()
        except Exception:
            df.collect()
        t3 = time.time()
        jobs1 = len(tracker.getJobIdsForGroup() or [])
        release_caches()
        return t1 - t0, t2 - t1, t3 - t2, jobs1 - jobs0

    for name in names:  # warm pass
        run(name)
    print(f"{'query':28s} {'build':>7s} {'analyze':>8s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    for name in names:
        rs = [run(name) for _ in range(args.reps)]
        b = min(r[0] for r in rs)
        a = min(r[1] for r in rs)
        e = min(r[2] for r in rs)
        t = min(sum(r[:3]) for r in rs)
        j = int(statistics.median(r[3] for r in rs))
        print(
            f"{name:28s} {b:7.3f} {a:8.3f} {e:7.3f} {t:7.3f} {j:5d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
