"""Per-query Spark vs DuckDB wall-clock ratios at a given scale dir.

VERDICT r01 #7: at sf0.01-0.1 Spark's ~0.2-0.5 s job floor dominates,
so per-query ratios only measure plans at sf >= 1. Run this against
the scaled dataset from tools/make_scaled_testdata.py:

    python tools/make_scaled_testdata.py /root/repo/.testdata_sf1 10
    python tools/bench_ratio.py /root/repo/.testdata_sf1

Each engine runs every oracled corpus query WARM (best of ``--runs``,
after one discarded warmup for JIT/cache effects); output is a
markdown table for BASELINE.md plus a JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.schemas import TESTDATA_TABLES
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark


def best_of(fn, runs: int, spark=None) -> float:
    if spark is not None:
        # belt-and-braces: drop ANY CacheManager entry a prior query
        # registered (release_caches covers known persist sites; this
        # covers future ones) so 90 sequential queries don't degrade
        spark.catalog.clearCache()
    # drop DataFrame refs between runs so ContextCleaner releases each
    # run's localCheckpoint blocks — otherwise 90 sequential queries
    # (x2 runs) accumulate pinned RDDs and later timings measure memory
    # pressure, not plans. persist()ed frames are pinned in CacheManager
    # regardless of gc and need the explicit unpersist in
    # release_caches(); releasing between the two runs also keeps run 2
    # (the usually-selected warm number) from executing under run 1's
    # still-pinned blocks.
    import gc

    from assignment3_qachatapplication_vectorembeddings_spark.runtime import release_caches

    fn()  # warmup, discarded
    release_caches()
    gc.collect()
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
        release_caches()
        gc.collect()
    return min(times)


def main() -> int:
    argv = sys.argv[1:]
    # queries whose result set is itself data-scale (pair listings on
    # duplicate-heavy corpora reach 10⁸ rows at sf1): materializing
    # through Arrow into ONE python process measures driver memory, not
    # the engine. For these, both engines stream to their native
    # parquet sink instead — full compute + columnar write, no
    # single-process result transfer. Same-fairness as the Arrow path.
    parquet_sink: set[str] = set()
    if "--parquet-sink" in argv:
        i = argv.index("--parquet-sink")
        parquet_sink = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/repo/.testdata_sf1"
    rest = argv[1:]
    runs = 2
    if rest and rest[0].isdigit():  # runs count is optional
        runs, rest = int(rest[0]), rest[1:]
    # golden-parquet oracles (round 7) are value pins dispatched on the
    # driver sf fingerprints — at other scales they match no arm and the
    # "oracle" side would read an empty constant, making the ratio
    # meaningless. The Spark side of those queries is still benched by
    # bench.py; here we compare only real dual-engine workloads.
    names = rest or [n for n, s in CORPUS.items() if s.oracle and not s.golden]

    import os as _os0

    load_start = round(_os0.getloadavg()[0], 2)
    spark = get_spark("bench-ratio")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():  # Spark-written tables are directories
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    rows = []
    for name in names:
        spec = CORPUS[name]
        try:
            # identical materialization format on both sides: Arrow
            # tables (DuckDB's native result transfer; Spark 4's
            # DataFrame.toArrow). The old collect()-vs-fetchall pairing
            # charged Spark row-pickle serialization on big outputs
            # while DuckDB paid the (cheaper) tuple path — on 1.5M-row
            # results that measured the Python driver, not the engine.
            if name in parquet_sink:
                import shutil
                import tempfile

                sink_dir = tempfile.mkdtemp(prefix=f"ratio-{name}-")

                def _spark_sink():
                    spec.fn(spark, sf_dir).write.mode("overwrite").parquet(
                        f"{sink_dir}/spark"
                    )

                def _duck_sink():
                    con.execute(
                        f"COPY ({spec.oracle}) TO '{sink_dir}/duck.parquet' (FORMAT PARQUET)"
                    )

                try:
                    s_sec = best_of(_spark_sink, runs, spark)
                    d_sec = best_of(_duck_sink, runs)
                finally:
                    shutil.rmtree(sink_dir, ignore_errors=True)
            else:
                s_sec = best_of(lambda: spec.fn(spark, sf_dir).toArrow(), runs, spark)
                d_sec = best_of(lambda: con.execute(spec.oracle).arrow(), runs)
        except Exception as exc:
            print(f"| {name} | ERROR {type(exc).__name__} | | |")
            continue
        ratio = s_sec / d_sec if d_sec > 0 else float("inf")
        rows.append((name, s_sec, d_sec, ratio))
        print(f"| {name} | {s_sec:.3f} | {d_sec:.3f} | {ratio:.1f}x |")

    within2 = sum(1 for _, s, d, r in rows if r <= 2.0)
    import os as _os

    summary = {
        "sf_dir": sf_dir,
        "host_load": {"start": load_start, "end": round(_os.getloadavg()[0], 2)},
        "queries": {n: {"spark_s": round(s, 4), "duck_s": round(d, 4), "ratio": round(r, 2)} for n, s, d, r in rows},
        "n": len(rows),
        "within_2x": within2,
        "spark_total_s": round(sum(s for _, s, _, _ in rows), 2),
        "duck_total_s": round(sum(d for _, _, d, _ in rows), 2),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
