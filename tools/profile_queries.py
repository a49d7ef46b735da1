"""Steady-state per-query profiler for optimization A/Bs.

Runs the named queries (default: all) `--reps` times each in ONE warm
session after a warm-up pass, printing the min/median wall per query.
Unlike bench.py (fresh-plan best-of-2, cold JVM) this measures the
steady-state plan cost — the right denominator for same-session
before/after comparisons of a single operator.

Usage: python tools/profile_queries.py [--sf DIR] [--reps N] [query ...]
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
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or list(CORPUS)

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    next(iter(CORPUS.values())).fn(spark, args.sf).limit(1).collect()

    def run(name: str) -> float:
        spec = CORPUS[name]
        t0 = time.time()
        df = spec.fn(spark, args.sf)
        try:
            df.toArrow()
        except Exception:
            df.collect()
        dt = time.time() - t0
        release_caches()
        return dt

    if not args.no_warm:
        for name in names:  # warm pass: JIT + shuffle-service spin-up
            run(name)
    total = 0.0
    for name in names:
        ts = [run(name) for _ in range(args.reps)]
        total += min(ts)
        print(
            f"{name:28s} min={min(ts):7.3f} med={statistics.median(ts):7.3f}"
            f"  runs={[round(t, 2) for t in ts]}",
            flush=True,
        )
    print(f"TOTAL(min) {total:8.3f}")


if __name__ == "__main__":
    main()
