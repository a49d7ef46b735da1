"""BENCH harness — runs the corpus queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark


def _load_state() -> dict:
    """1/5/15-min loadavg snapshot. The build host is shared and its
    background load swings 2-18 with no local processes; numbers recorded
    under load overstate wall times 2-7x (VERDICT r5 ask #1), so every
    bench artifact self-documents the host state it was measured under.
    """
    try:
        one, five, fifteen = os.getloadavg()
        return {"1m": round(one, 2), "5m": round(five, 2), "15m": round(fifteen, 2)}
    except OSError:
        return {}


def _speed_canary() -> float:
    """Fixed single-thread DuckDB workload (hash of 20M ints, ~0.36 s
    on the round-8 reference host): a machine-speed unit stamped into
    every artifact. The build host's EFFECTIVE CPU speed drifts ~2x
    between sessions even at loadavg 0 (observed round 8: identical
    DuckDB oracle queries 2x slower on an idle host hours apart), so
    wall totals from different runs are only comparable after
    normalizing by their canaries; same-run ratios (bench_ratio.py)
    need no correction."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 1")
    t0 = time.time()
    con.execute(
        "SELECT sum(h) FROM (SELECT hash(range) AS h FROM range(20000000))"
    ).fetchone()
    con.close()
    return round(time.time() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    load_start = _load_state()
    canary_start = _speed_canary()

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not session startup.
    next(iter(CORPUS.values())).fn(spark, sf_dir).limit(1).collect()

    from assignment3_qachatapplication_vectorembeddings_spark.runtime import release_caches

    def _run_once(spec) -> float:
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        try:
            # Arrow materialization (same transfer format the oracle
            # runner uses); row-pickle collect() on the handful of
            # million-row results measured the Python driver, not the
            # query
            df.toArrow()
        except Exception:
            df.collect()  # non-Arrow-convertible result types
        return time.time() - t0

    # Warm best-of-2 with a fresh plan per run — the SAME methodology
    # BASELINE.md's DuckDB ratio table uses (tools/bench_ratio.py), so
    # the driver's BENCH_r{N} and the baseline are comparable. The cold
    # first-run total is reported alongside: it bundles Catalyst
    # analysis + codegen + Python-UDF ship-out, real one-time costs but
    # not plan cost.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, spec in CORPUS.items():
        first = _run_once(spec)
        # release BETWEEN the two runs too: run 1's registered
        # checkpoint blocks would otherwise stay pinned while run 2 (the
        # warm number usually selected) executes under doubled memory
        release_caches()
        second = _run_once(spec)
        cold[name] = round(first, 4)
        timings[name] = round(min(first, second), 4)
        # unpersist between queries (outside the timed section): cached
        # intermediates otherwise pin CacheManager blocks for the whole
        # run and later queries measure memory pressure
        release_caches()

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "corpus_total_wall",
        "value": total,
        "unit": "sec",
        "timing": "warm_best_of_2_fresh_plans",
        "cold_total": round(sum(cold.values()), 4),
        "queries": timings,
        "queries_cold": cold,
        "sf": sf,
        "host_load": {"start": load_start, "end": _load_state()},
        "speed_canary_s": {"start": canary_start, "end": _speed_canary()},
    }
    full_line = json.dumps(full, separators=(",", ":"))
    # Full per-query JSON: first line of output + persisted next to the
    # repo so the complete breakdown always survives.
    print(full_line, flush=True)
    Path(_REPO, "BENCH_full.json").write_text(full_line + "\n")

    # The driver's tail capture keeps only the last ~2000 chars; the full
    # 104-query line is longer than that, so its head (and the JSON
    # opening brace) gets truncated and fails to parse. Emit a compact
    # summary as the LAST line, sized to fit the tail window: headline
    # total plus as many of the slowest queries as fit.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    summary = {
        "metric": "corpus_total_wall",
        "value": total,
        "unit": "sec",
        "timing": "warm_best_of_2",
        "cold_total": round(sum(cold.values()), 4),
        "n_queries": len(timings),
        "queries": {},
        "queries_truncated": True,
        "queries_full": "BENCH_full.json",
        "sf": sf,
        "host_load": {"start": load_start, "end": _load_state()},
        "speed_canary_s": full["speed_canary_s"],
    }
    for name, sec in slowest:
        summary["queries"][name] = sec
        if len(json.dumps(summary, separators=(",", ":"))) > 1700:
            del summary["queries"][name]
            break
    else:
        summary["queries_truncated"] = False
    print(json.dumps(summary, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
