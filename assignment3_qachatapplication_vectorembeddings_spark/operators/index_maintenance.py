"""Vector index table + maintenance operators (reference pipeline2).

The reference maintains a Pinecone index (create/upsert/fetch/delete/
stats, ``airflow-pipeline/dags/pipeline2.py:104-225``) plus a MySQL
``vectordatabasestats`` catalog kept in sync by insert-if-absent and
delete-cascade passes (``:315-367``). Here the index is a **parquet
table partitioned by title**:

- the reference's metadata filter ``{"title": {"$in": ...}}`` becomes
  partition pruning — Catalyst never touches other forms' files;
- upsert = per-partition merge (replace-by-id) using dynamic partition
  overwrite, so only the touched titles rewrite — the 100 TB analogue
  of Delta MERGE without requiring Delta;
- delete-by-form = dropping partition directories (metadata-only, no
  data rewrite);
- the reference's ``sleep(60)`` eventual-consistency dance
  (pipeline2.py:178) disappears: table and catalog update in the same
  job, reads after writes see truth immediately.

Id semantics: the reference *recomputes* ``vector_id = title + "_" +
combined-frame index`` at load time (pipeline2.py:130-132), silently
discarding pipeline1's ChunkId. ``vector_ids_like_reference`` provides
that recomputation; at scale the combined-frame index is a global
row_number over a deterministic ordering.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import FORM_CATALOG_SCHEMA, INDEX_SCHEMA

__all__ = ["VectorIndex", "WriterLockTimeout", "vector_ids_like_reference"]


class WriterLockTimeout(TimeoutError):
    """Raised when the index writer lock cannot be acquired in time."""


def vector_ids_like_reference(chunks: DataFrame, *, order_cols: Sequence[str] = ("title", "chunk_pos")) -> DataFrame:
    """Recompute ``vector_id = title + '_' + global_index`` exactly like
    pipeline2.py:130-132 (index over the combined frame, 0-based). The
    combined-CSV row order is made explicit via ``order_cols``."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    # single-window global row_number: acceptable because id assignment
    # is a one-time load-format step; steady-state loads use natural ids
    return chunks.withColumn(
        "id", F.concat_ws("_", F.col("title"), (F.row_number().over(w) - 1).cast("string"))
    )


class VectorIndex:
    """Parquet-backed vector index with Pinecone-parity maintenance ops.

    Layout: ``{path}/title=<form>/part-*.parquet`` with columns
    (id, vector, text). The catalog (``vectordatabasestats`` analogue)
    lives at ``{path}__catalog`` as (form_name, recent_activity).
    """

    #: seconds to keep retrying for the writer lock before giving up
    LOCK_TIMEOUT_SEC = 120.0
    #: a lock file older than this is presumed abandoned (holder died
    #: between acquire and release) and is broken by the next writer.
    #: MUST exceed the longest expected merge: there is no heartbeat —
    #: a healthy writer whose commit outlives the TTL would have its
    #: lock broken mid-write. Tune up for very large indexes.
    LOCK_STALE_TTL_SEC = 3600.0

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.catalog_path = path + "__catalog"
        self.lock_path = path + "__lock"
        # re-entrancy marker is per-thread: two threads sharing one
        # VectorIndex must still contend for the file lock
        self._lock_tls = threading.local()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- writer lock -------------------------------------------------------
    #
    # The merge in upsert()/delete_*() is read-merge-overwrite; two
    # concurrent writers that interleave (both read the same snapshot,
    # both overwrite) silently lose the first committer's rows. Writers
    # therefore serialize on an exclusive lock taken via ATOMIC
    # create-if-absent: O_CREAT|O_EXCL on POSIX paths, and
    # FileSystem.create(path, overwrite=false) elsewhere — atomic on
    # HDFS (namespace op) and mapping to a conditional PUT
    # (`If-None-Match: *`) on object stores that support it. This is the
    # "enforced single-writer" commit story: mutations are linearized,
    # so no update is ever lost; readers are unaffected (they never take
    # the lock). A crashed holder's lock is broken after
    # LOCK_STALE_TTL_SEC based on the lock file's modification time.

    def _local_lock_file(self) -> str | None:
        """POSIX path of the lock file if it lives on a local filesystem,
        else None (use the Hadoop FileSystem API).

        Scheme-less paths are NOT assumed local: on a cluster
        ``fs.defaultFS`` typically points at HDFS/an object store, and
        the lock must live on the SAME filesystem as the data — a
        driver-local lock for remote data would let every driver "hold"
        its own lock. Resolve through Hadoop and take the POSIX branch
        only when the resolved scheme is ``file``."""
        p = self.lock_path
        if p.startswith("file:"):
            return p[len("file:"):] or "/"
        if "://" in p:
            return None
        try:
            fs, _jvm = self._fs()
            if fs.getUri().getScheme() == "file":
                return p
        except Exception:
            return p  # no JVM filesystem reachable → plain local path
        return None

    def _try_lock(self) -> bool:
        local = self._local_lock_file()
        stamp = f"pid={os.getpid()} ts={time.time():.3f}\n"
        if local is not None:
            try:
                fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "w") as f:
                f.write(stamp)
            return True
        fs, jvm = self._fs()
        hp = jvm.org.apache.hadoop.fs.Path(self.lock_path)
        try:
            out = fs.create(hp, False)  # overwrite=false → atomic claim
        except Exception:
            return False  # exists (or FS down — surfaces as timeout)
        try:
            out.write(bytearray(stamp.encode()))
            out.close()
            return True
        except Exception:
            # created but couldn't stamp: remove the claim rather than
            # leave an orphan lock no writer owns (it would block
            # everyone until the stale TTL)
            with contextlib.suppress(Exception):
                fs.delete(hp, False)
            return False

    def _read_lock_stamp(self) -> str | None:
        """Current lock-file content (the holder's pid/ts stamp), or
        None if unreadable/vanished. Every acquirer writes a unique
        stamp, so content equality identifies a SPECIFIC holder."""
        local = self._local_lock_file()
        try:
            if local is not None:
                with open(local, "r") as f:
                    return f.read()
            fs, jvm = self._fs()
            hp = jvm.org.apache.hadoop.fs.Path(self.lock_path)
            stream = fs.open(hp)
            try:
                data = bytearray()
                while True:
                    b = stream.read()
                    if b < 0:
                        break
                    data.append(b)
                return data.decode(errors="replace")
            finally:
                stream.close()
        except Exception:
            return None

    def _lock_age_sec(self) -> float | None:
        local = self._local_lock_file()
        try:
            if local is not None:
                return time.time() - os.path.getmtime(local)
            fs, jvm = self._fs()
            hp = jvm.org.apache.hadoop.fs.Path(self.lock_path)
            return time.time() - fs.getFileStatus(hp).getModificationTime() / 1000.0
        except Exception:
            return None  # lock vanished between observation and stat

    def _unlock(self) -> None:
        local = self._local_lock_file()
        if local is not None:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(local)
            return
        fs, jvm = self._fs()
        fs.delete(jvm.org.apache.hadoop.fs.Path(self.lock_path), False)

    @contextlib.contextmanager
    def write_lock(self, timeout_sec: float | None = None):
        """Serialize mutating operations (upsert / delete / catalog).

        Public so multi-operation transactions (e.g. upsert + verify +
        catalog fix-up) can hold the lock across calls; single mutations
        acquire it implicitly. Re-entrant within this VectorIndex object
        so nested public methods don't self-deadlock."""
        if getattr(self._lock_tls, "held", False):
            yield
            return
        deadline = time.monotonic() + (
            self.LOCK_TIMEOUT_SEC if timeout_sec is None else timeout_sec
        )
        delay = 0.05
        while not self._try_lock():
            age = self._lock_age_sec()
            if age is not None and age > self.LOCK_STALE_TTL_SEC:
                # Holder presumed dead. The break is CONTENT-conditional:
                # record the stale holder's unique stamp, re-verify age,
                # and delete only if the stamp is UNCHANGED immediately
                # before the unlink — so a breaker that got descheduled
                # after its staleness check can never delete a DIFFERENT
                # (fresh) writer's lock: that lock carries a new stamp
                # and the equality fails. The residual window is one
                # read→delete syscall pair and requires two breakers
                # overlapping inside it (a conditional delete — If-Match
                # on object stores — would close it entirely). After the
                # break, fall through to the deadline check and sleep:
                # breakers re-contend via the atomic create, and a
                # failing delete must not turn into a busy spin.
                with contextlib.suppress(Exception):
                    stale_stamp = self._read_lock_stamp()
                    age2 = self._lock_age_sec()
                    if (
                        stale_stamp is not None
                        and age2 is not None
                        and age2 > self.LOCK_STALE_TTL_SEC
                        and self._read_lock_stamp() == stale_stamp
                    ):
                        self._unlock()
            if time.monotonic() > deadline:
                raise WriterLockTimeout(
                    f"writer lock busy for >{timeout_sec or self.LOCK_TIMEOUT_SEC}s: "
                    f"{self.lock_path}"
                )
            time.sleep(delay)
            delay = min(delay * 2, 1.0)
        self._lock_tls.held = True
        try:
            yield
        finally:
            self._lock_tls.held = False
            self._unlock()

    # -- helpers ----------------------------------------------------------

    def _fs(self):
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self.path)
        return path.getFileSystem(hconf), jvm

    def exists(self) -> bool:
        fs, jvm = self._fs()
        return fs.exists(jvm.org.apache.hadoop.fs.Path(self.path))

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], INDEX_SCHEMA)
        try:
            df = self.spark.read.parquet(self.path)
        except Exception:
            # root dir survives after the last partition is dropped —
            # an index with zero partitions is an empty index
            return self.spark.createDataFrame([], INDEX_SCHEMA)
        # partition column comes back typed; normalize to the schema order
        return df.select("id", "vector", F.col("title").cast("string"), "text")

    def read_catalog(self) -> DataFrame:
        fs, jvm = self._fs()
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(self.catalog_path)):
            return self.spark.createDataFrame([], FORM_CATALOG_SCHEMA)
        return self.spark.read.parquet(self.catalog_path)

    def dimension(self) -> int | None:
        """S11: dimension inferred from data (pipeline2.py:134)."""
        row = self.read().select(F.size("vector").alias("d")).head()
        return None if row is None else row["d"]

    # -- S11/S12: create + bulk upsert (replace-by-id) ---------------------

    def upsert(self, updates: DataFrame) -> None:
        """MERGE-by-id limited to the touched title partitions.

        updates: DataFrame(id, vector, title, text). Only partitions
        whose title appears in ``updates`` are rewritten: survivors =
        old rows of those titles anti-joined on id, union the updates.

        Writers serialize on :meth:`write_lock`, so concurrent upserts
        commit one after another and none is lost.
        """
        with self.write_lock():
            self._upsert_locked(updates)

    def _upsert_locked(self, updates: DataFrame) -> None:
        updates = updates.select("id", "vector", "title", "text")
        if self.exists():
            dim = self.dimension()
            if dim is not None:
                # S11 dimension check: reject mismatched vectors upfront
                bad = updates.filter(F.size("vector") != dim).limit(1).count()
                if bad:
                    raise ValueError(f"vector dimension mismatch (index dim={dim})")
            titles = [r["title"] for r in updates.select("title").distinct().collect()]
            old = self.read().filter(F.col("title").isin(titles))
            survivors = old.join(
                updates.select("id"), "id", "left_anti"
            ).select("id", "vector", "title", "text")
            merged = survivors.unionByName(updates)
            # cut lineage before overwriting the path being read
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = updates
        (
            merged.repartition("title")
            .write.mode("overwrite")
            .partitionBy("title")
            .parquet(self.path)
        )
        self._catalog_add([r["title"] for r in updates.select("title").distinct().collect()])

    # -- S13: point fetch ---------------------------------------------------

    def fetch_by_ids(self, vector_ids: Sequence[str]) -> DataFrame:
        return self.read().filter(F.col("id").isin(list(vector_ids)))

    def forms_of_ids(self, vector_ids: Sequence[str]) -> list[str]:
        """get_forms_by_id (pipeline2.py:152-157): titles of the ids, in
        input order (duplicates preserved)."""
        rows = {
            r["id"]: r["title"]
            for r in self.fetch_by_ids(vector_ids).select("id", "title").collect()
        }
        return [rows[v] for v in vector_ids if v in rows]

    # -- P9: existence check ------------------------------------------------

    def form_check(self, form_name: str) -> bool:
        return (
            self.read().filter(F.col("title") == form_name).limit(1).count() > 0
        )

    # -- S14: deletes ---------------------------------------------------------

    def delete_by_ids(self, vector_ids: Sequence[str]) -> None:
        """Delete ids, then cascade: forms left with no vectors are
        removed from the catalog (pipeline2.py:171-193 without the
        sleep — the rewrite is transactional per partition)."""
        with self.write_lock():
            self._delete_by_ids_locked(vector_ids)

    def _delete_by_ids_locked(self, vector_ids: Sequence[str]) -> None:
        affected_forms = sorted(set(self.forms_of_ids(vector_ids)))
        if not affected_forms:
            return
        remaining = (
            self.read()
            .filter(F.col("title").isin(affected_forms))
            .filter(~F.col("id").isin(list(vector_ids)))
            .select("id", "vector", "title", "text")
            .localCheckpoint(eager=True)
        )
        surviving_titles = {
            r["title"] for r in remaining.select("title").distinct().collect()
        }
        if surviving_titles:
            (
                remaining.repartition("title")
                .write.mode("overwrite")
                .partitionBy("title")
                .parquet(self.path)
            )
        # dynamic overwrite only rewrites partitions present in the new
        # data; emptied partitions must be dropped explicitly
        emptied = [t for t in affected_forms if t not in surviving_titles]
        self._drop_partitions(emptied)
        self._catalog_remove(emptied)

    def delete_by_form(self, form_titles: Sequence[str]) -> None:
        """delete_by_form (pipeline2.py:195-197): metadata-only partition
        drop — no full-index enumeration with a dummy query vector
        (pipeline2.py:214-225) and no data rewrite."""
        with self.write_lock():
            present = [t for t in form_titles if self.form_check(t)]
            self._drop_partitions(present)
            self._catalog_remove(list(form_titles))

    def delete_all(self) -> None:
        """delete_all (pipeline2.py:199-202) + catalog truncate (:333-338)."""
        with self.write_lock():
            fs, jvm = self._fs()
            for p in (self.path, self.catalog_path):
                hp = jvm.org.apache.hadoop.fs.Path(p)
                if fs.exists(hp):
                    fs.delete(hp, True)

    def _drop_partitions(self, titles: Sequence[str]) -> None:
        if not titles:
            return
        fs, jvm = self._fs()
        for t in titles:
            hp = jvm.org.apache.hadoop.fs.Path(f"{self.path}/title={t}")
            if fs.exists(hp):
                fs.delete(hp, True)

    # -- S15: stats -----------------------------------------------------------

    def stats(self) -> dict:
        agg = self.read().agg(
            F.count(F.lit(1)).alias("total_vector_count"),
            F.min(F.size("vector")).alias("dimension"),
        ).head()
        per_form = {
            r["title"]: r["n"]
            for r in self.read().groupBy("title").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        return {
            "total_vector_count": agg["total_vector_count"],
            "dimension": agg["dimension"],
            "namespaces": per_form,
        }

    # -- maintenance: small-file compaction -----------------------------------

    def _partition_file_counts(self) -> dict[str, int]:
        """Data-file count per title partition (skips _SUCCESS etc.)."""
        fs, jvm = self._fs()
        root = jvm.org.apache.hadoop.fs.Path(self.path)
        out: dict[str, int] = {}
        if not fs.exists(root):
            return out
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("title=")):
                continue
            n = sum(
                1
                for f in fs.listStatus(st.getPath())
                if f.isFile() and not f.getPath().getName().startswith("_")
            )
            out[name[len("title="):]] = n
        return out

    def compact(self, *, max_files_per_partition: int = 1) -> dict[str, int]:
        """Rewrite fragmented title partitions down to one file each.

        Long-running ingest accumulates small files (append-mode loads,
        per-micro-batch streaming upserts of OTHER tools, externally
        produced layouts); small files poison scan parallelism math and
        object-store listing at scale, so periodic compaction is part
        of index health. Only partitions with more than
        ``max_files_per_partition`` data files rewrite (dynamic
        partition overwrite — untouched titles keep their files and
        their mtimes); the catalog, which grows by append on every
        upsert, is folded to a single file as well. Runs under the
        writer lock like every mutation. Returns the pre-compaction
        file count per rewritten title.
        """
        with self.write_lock():
            counts = self._partition_file_counts()
            victims = {
                t: n for t, n in counts.items() if n > max_files_per_partition
            }
            if victims:
                rows = (
                    self.read()
                    .filter(F.col("title").isin(list(victims)))
                    .select("id", "vector", "title", "text")
                    # cut lineage before overwriting the files being read
                    .localCheckpoint(eager=True)
                )
                (
                    rows.repartition("title")  # one reduce partition per title
                    .write.mode("overwrite")
                    .partitionBy("title")
                    .parquet(self.path)
                )
            fs, jvm = self._fs()
            cat = jvm.org.apache.hadoop.fs.Path(self.catalog_path)
            if fs.exists(cat):
                n_cat = sum(
                    1
                    for f in fs.listStatus(cat)
                    if f.isFile() and not f.getPath().getName().startswith("_")
                )
                if n_cat > max_files_per_partition:
                    kept = self.read_catalog().coalesce(1).localCheckpoint(
                        eager=True
                    )
                    kept.write.mode("overwrite").parquet(self.catalog_path)
            return victims

    # -- J3/J4: catalog sync ---------------------------------------------------

    def _catalog_add(self, form_names: Sequence[str]) -> None:
        """Insert-if-absent (pipeline2.py:315-331): left-anti then append."""
        if not form_names:
            return
        new = self.spark.createDataFrame(
            [(n,) for n in form_names], "form_name string"
        ).withColumn("recent_activity", F.current_timestamp())
        existing = self.read_catalog()
        to_add = new.join(existing.select("form_name"), "form_name", "left_anti")
        to_add.write.mode("append").parquet(self.catalog_path)

    def _catalog_remove(self, form_names: Sequence[str]) -> None:
        if not form_names:
            return
        kept = (
            self.read_catalog()
            .filter(~F.col("form_name").isin(list(form_names)))
            .localCheckpoint(eager=True)
        )
        kept.write.mode("overwrite").parquet(self.catalog_path)

    def sync_catalog_orphans(self) -> list[str]:
        """J4: forms in the catalog with no surviving vectors → removed.
        One anti-join replaces the reference's poll-sleep-recheck loop."""
        with self.write_lock():
            orphans = [
                r["form_name"]
                for r in self.read_catalog()
                .join(
                    self.read().select(F.col("title").alias("form_name")).distinct(),
                    "form_name",
                    "left_anti",
                )
                .collect()
            ]
            self._catalog_remove(orphans)
            return orphans
