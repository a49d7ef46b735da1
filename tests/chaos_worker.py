"""Child-process worker for the multiprocess maintenance chaos test
(tests/test_chaos.py). Each worker owns its own SparkSession (real
process isolation — the lease/vacuum/compact/refresh interleavings the
single-process pytest pins can't produce) and hammers ONE shared index
tree for a wall-clock window:

- ``writer``   — upserts new rows into the primary in a loop;
- ``maintainer`` — refresh → (periodic) compact → vacuum, derived and
  primary, with tight-but-nonzero retention;
- ``reader``   — resolves and scans the synced ANN index; every result
  is checked for WRONG ANSWERS (title patterns are orthogonal and
  immutable, so a hit whose id belongs to another title is a protocol
  violation regardless of which snapshot was served).

Loud staleness (:class:`StaleIndexError`) is the protocol working as
documented (serve-from-vacuumed-snapshot refused) and is counted, not
failed. Everything else — torn scans, missing parquet, wrong titles,
empty results — lands in ``errors`` and fails the parent test.

Usage: python chaos_worker.py <role> <base_dir> <run_seconds> <seed>
Writes ``{base}/result_<role>_<seed>.json`` when done.
"""

from __future__ import annotations

import json
import random
import sys
import time
import traceback
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

DIM = 16
TITLES = [f"form{i}" for i in range(4)]
SCHEMA = "id string, vector array<float>, title string, text string"


def pattern(i: int) -> list[float]:
    return [1.0 if j // (DIM // len(TITLES)) == i else 0.0 for j in range(DIM)]


def posix_conditional_put(path: str, content: bytes) -> bool:
    """Conditional write primitive for the mocks3na:// chaos leg (S3
    PutObject + ``If-None-Match: *`` semantics): atomic
    create-if-absent implemented OUTSIDE the deliberately-broken Hadoop
    create path, like a real S3 client would. Module-level so every
    chaos child process resolves the SAME primitive against the shared
    local store."""
    import os

    local = path.split("://", 1)[1]
    os.makedirs(os.path.dirname(local) or "/", exist_ok=True)
    try:
        fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "wb") as f:
        f.write(content)
    return True


def main() -> int:
    role, base, run_sec, seed = (
        sys.argv[1],
        sys.argv[2],
        float(sys.argv[3]),
        int(sys.argv[4]),
    )
    # optional 5th arg: an object-store scheme prefix ("mocks3://") —
    # the same chaos over the Hadoop-FS code paths instead of file://
    scheme = sys.argv[5] if len(sys.argv) > 5 else ""
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
        VectorIndex,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (
        StaleIndexError,
        SyncedIvfpqIndex,
        SyncedTextIndex,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark

    extra = {"spark.driver.memory": "2g"}
    if scheme:
        sys.path.insert(0, str(_REPO / "tests"))
        from conftest import ensure_mockfs_classes

        cls_dir = ensure_mockfs_classes()
        if cls_dir is None:
            raise RuntimeError("mockfs classes unavailable in chaos child")
        extra["spark.driver.extraClassPath"] = cls_dir
        extra["spark.hadoop.fs.mocks3.impl"] = "sparkgraft.MockS3FileSystem"
        extra["spark.hadoop.fs.mocks3na.impl"] = "sparkgraft.MockS3LaxFileSystem"
    spark = get_spark(
        f"chaos-{role}-{seed}",
        master="local[3]",
        shuffle_partitions=2,
        extra_conf=extra,
    )
    # the non-atomic scheme refuses to lock without a conditional-put
    # primitive — supply the S3-shaped one, same as production would
    cput = posix_conditional_put if scheme.startswith("mocks3na") else None
    vi = VectorIndex(spark, f"{scheme}{base}/primary", conditional_put=cput)
    ann = SyncedIvfpqIndex(vi, f"{scheme}{base}/ann", nlist=4, m=4, nbits=4)
    tix = SyncedTextIndex(vi, f"{scheme}{base}/tix", buckets=8)
    rng = random.Random(seed)
    stats = {"role": role, "ops": 0, "stale_refusals": 0, "errors": []}
    deadline = time.time() + run_sec  # clock starts AFTER session spin-up
    # progress floors matching test_chaos.py's min-ops assertions: on a
    # slow/loaded host the wall window alone may not fit them, so a role
    # that hasn't made its floor keeps going past the soft deadline —
    # bounded by the hard cap, so a genuinely wedged role still FAILS
    # the assertion instead of hanging
    floor = {"writer": 3, "maintainer": 2, "reader": 5}.get(role, 0)
    hard_deadline = time.time() + 4 * run_sec

    def _behind_floor() -> bool:
        if stats["ops"] < floor:
            return True
        # the maintainer's ops floor guarantees the retrain branch RUNS,
        # but a single attempt can hit StaleIndexError (caught, counter
        # not bumped) — keep going until one retrain actually LANDS,
        # matching test_chaos.py's retrains >= 1 assertion
        if role == "maintainer" and stats.get("retrains", 0) < 1:
            return True
        return False

    while (
        (time.time() < deadline or _behind_floor())
        and time.time() < hard_deadline
        and len(stats["errors"]) < 5
    ):
        try:
            if role == "writer":
                rnd = stats["ops"]
                rows = [
                    (f"{t}_r{rnd}_s{seed}", pattern(i), t, f"{t} text r{rnd}")
                    for i, t in enumerate(TITLES)
                ]
                vi.upsert(spark.createDataFrame(rows, SCHEMA))
            elif role == "maintainer":
                ann.refresh()
                tix.refresh()
                if stats["ops"] % 3 == 2:
                    try:
                        ann.compact()
                        tix.compact()
                    except StaleIndexError:
                        stats["stale_refusals"] += 1  # raced a commit: fine
                if stats["ops"] % 4 == 1:
                    # quantizer RETRAIN mid-storm: versioned sidecar
                    # dirs must keep concurrent leased readers coherent.
                    # Alternate the FULL rebuild and the round-8 PARTIAL
                    # path (one title re-encoded under a new quantizer,
                    # mixed-generation serving) so readers hammer both
                    try:
                        if stats.get("retrains", 0) % 2 == 1:
                            ann.retrain(titles=[TITLES[0]])
                        else:
                            ann.retrain()
                        stats["retrains"] = stats.get("retrains", 0) + 1
                    except StaleIndexError:
                        # partial retrain raced a writer commit past the
                        # refresh — the documented refuse-and-retry
                        stats["stale_refusals"] += 1
                # min-age scales with the storm window (itself canary-
                # scaled for host speed): the unleased readers' resolve-
                # to-scan gap grows on a slow/loaded host exactly like
                # every other op, so a FIXED 10 s erodes the documented
                # bargain precisely when the host is least able to
                # afford it
                min_age = max(10.0, 10.0 * run_sec / 25.0)
                ann.vacuum(keep_versions=1, min_age_sec=min_age)
                tix.vacuum(keep_versions=1, min_age_sec=min_age)
                vi.vacuum(keep_versions=2, min_age_sec=min_age)
            elif role == "reader":
                i = rng.randrange(len(TITLES))
                want = TITLES[i] + "_"
                try:
                    if stats["ops"] % 4 == 3:
                        # lexical path: every title-t doc's text carries
                        # the literal title token, so a bm25 hit for
                        # term t from another title is a wrong answer
                        with tix.reader_lease():
                            bm_hits = tix.bm25(
                                [TITLES[i]], on_stale="serve"
                            ).collect()
                        hits = None
                        if not bm_hits:
                            stats["errors"].append(
                                f"empty bm25 result for {TITLES[i]}"
                            )
                        for r in bm_hits:
                            if not r["id"].startswith(want):
                                stats["errors"].append(
                                    f"WRONG ANSWER bm25 {r['id']!r} for "
                                    f"{TITLES[i]}"
                                )
                    elif stats["ops"] % 3 == 2:
                        # multi-action span: leased, with exact re-rank
                        # against the pinned primary snapshot
                        with ann.reader_lease(), vi.reader_lease():
                            hits = ann.search(
                                pattern(i), 2, nprobe=4, rerank=True,
                                on_stale="serve",
                            ).collect()
                    else:
                        try:
                            hits = ann.search(
                                pattern(i), 2, nprobe=4, on_stale="serve"
                            ).collect()
                        except Exception as exc:
                            # the UNLEASED serve-stale leg is the one
                            # path the protocol documents as allowed to
                            # fail loudly: resolve-to-scan is unpinned,
                            # so past vacuum's min-age the segment may
                            # be gone (the bounded check-to-read
                            # bargain; remedy = lease or refresh). A
                            # missing-file failure HERE is the contract
                            # working — anywhere else it stays an error
                            msg = f"{type(exc)} {exc}"
                            if (
                                "FileNotFoundException" in msg
                                or "does not exist" in msg
                            ):
                                stats["stale_refusals"] += 1
                                hits = None
                            else:
                                raise
                except StaleIndexError:
                    stats["stale_refusals"] += 1  # loud refusal ≠ wrong
                    hits = None
                if hits is not None:
                    if not hits:
                        stats["errors"].append(
                            f"empty result for {TITLES[i]} (partial scan?)"
                        )
                    for r in hits:
                        if not r["id"].startswith(want):
                            stats["errors"].append(
                                f"WRONG ANSWER {r['id']!r} for query {TITLES[i]}"
                            )
            stats["ops"] += 1
        except Exception:
            tb = traceback.format_exc()
            # keep the HEAD, the TAIL, and every root-cause line from
            # the middle — a head+tail slice of a Py4J traceback loses
            # the "Caused by: <java exception>" lines that say what
            # actually went wrong (they sit mid-string, after the
            # Python frames and before the deepest Java frames)
            if len(tb) > 2000:
                causes = "\n".join(
                    ln.strip()
                    for ln in tb.splitlines()
                    if "Caused by" in ln
                    or "Exception:" in ln
                    or "Error:" in ln
                )[:800]
                tb = (
                    tb[:600]
                    + "\n--- cause lines ---\n"
                    + causes
                    + "\n...\n"
                    + tb[-600:]
                )
            stats["errors"].append(tb)
    Path(f"{base}/result_{role}_{seed}.json").write_text(json.dumps(stats))  # local path even under a scheme
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
