"""Structured Streaming ingestion — the incremental mode of Pipeline 1.

The reference is batch-only (both DAGs are manually triggered,
``pipeline1.py:920`` / ``pipeline2.py:375`` — SURVEY §2.9); its only
"streaming" is a cosmetic sleep loop. But the operator set is already
incremental-friendly, so this module runs the SAME chunk/embed
transforms continuously:

- **file-arrival source**: new document files land in a directory →
  ``readStream`` picks them up (checkpointed, exactly-once per file);
- **foreachBatch**: each micro-batch runs the identical batch
  operators (``pypdf_chunk_table`` → ``embed_column``) and appends to
  the chunk/embedding parquet table — one code path for batch and
  streaming, the core Spark-first win;
- **watermarked windowed aggs** over an event stream (tumbling
  windows, late-data tolerance);
- **custom stateful operator** via ``applyInPandasWithState``:
  per-user session tracking with explicit state (the gap-session
  analogue of the batch ``event_sessionization`` corpus query).

``Trigger.AvailableNow`` drains everything pending then stops — the
batch-parity mode used by the tests; production uses processingTime
triggers with the same code.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "DOC_STREAM_SCHEMA",
    "stream_documents",
    "stream_events_table",
    "run_streaming_ingest",
    "windowed_event_counts",
    "run_windowed_counts_available_now",
    "dedup_stream",
    "sessionize_stream",
    "sessionize_stream_native",
    "run_sessionize_native_available_now",
    "run_streaming_novelty_ingest",
    "stream_embeddings_table",
    "run_streaming_index_ingest",
    "drain_shuffle_partitions",
]

#: State-store partitioning for bounded AvailableNow drains. A
#: stateful operator materializes ONE state-store instance per shuffle
#: partition, and every micro-batch pays a per-store commit (snapshot
#: + delta file) regardless of how little data it carries — so a
#: bounded drain over a small backlog at the batch default of 32
#: partitions spends most of its wall clock on store bookkeeping
#: (measured at sf0.1: hourly 1.32→0.67 s, dedup 2.70→1.21 s going
#: 32→4). Production streams want the opposite trade — steady-state
#: key cardinality sized across executors — and state partitioning is
#: FIXED at the first checkpoint of a query's life, so the value is
#: env-overridable rather than derived from data.
_DRAIN_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_DRAIN_PARTITIONS", "4")
)


def _path_bytes(path: str) -> int:
    """Total parquet bytes at ``path`` (file or Spark-written dir)."""
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def adaptive_drain_partitions(source: DataFrame | None) -> int:
    """Default drain partition count: the fixed floor, REGARDLESS of
    source size. MEASURED (A/B/C at sf1, best-of-2 warm, same
    session): for the hash-agg/dedup/join drains the floor beat
    size-proportional scaling decisively (hourly 0.99 s at 4 parts vs
    2.94 s at ~10) — the scan stages already parallelize at the
    source's file splits; only the post-shuffle/state stages follow
    this count, and their per-store commit + task overhead grows with
    N faster than their small compute shrinks."""
    return _DRAIN_PARTITIONS


def sized_drain_partitions(source: DataFrame | None) -> int:
    """Size-proportional count (1 partition per ~2 MB of stamped
    source, floor.., cap cores) for SORT-DOMINATED stateful drains.
    The same A/B that crowned the floor for hash-agg drains measured
    the opposite for ``session_window`` (4.48 s at ~10 parts vs
    5.68 s at 4): its state stage sorts each partition's rows, real
    per-row compute that DOES scale with cores. Used explicitly by
    the native-sessionize runner; everything else keeps the floor."""
    n = _DRAIN_PARTITIONS
    src_bytes = (
        getattr(source, "_sgraft_source_bytes", 0) if source is not None else 0
    )
    if src_bytes:
        cores = source.sparkSession.sparkContext.defaultParallelism
        n = max(n, min(cores, int(src_bytes) // (2 << 20)))
    return n


@contextlib.contextmanager
def drain_shuffle_partitions(
    spark: SparkSession,
    n: int | None = None,
    *,
    source: DataFrame | None = None,
):
    """Scope ``spark.sql.shuffle.partitions`` for the duration of a
    bounded drain (must cover ``.start()`` — a streaming query pins
    the state partition count at start). Default is the measured
    floor (see :func:`adaptive_drain_partitions`); pass an explicit
    ``n`` (e.g. :func:`sized_drain_partitions` for sort-dominated
    state stages) to override. Restores the ambient value on exit;
    batch plans evaluated after exit are unaffected.

    (Round-9 A/B, interleaved 5x per shape at sf0.1: scoping
    ``spark.sql.files.minPartitionNum`` to 1 or 4 for the drain —
    fewer scan tasks per micro-batch — measured NO effect beyond host
    noise on hourly/sessionize/dedup drains; the default core-count
    scan-split floor stays.)"""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(n or adaptive_drain_partitions(source)),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

#: Per-(session, path) memo of the batch-inferred parquet schema used
#: to declare stream sources. Each drain used to pay a fresh
#: ``spark.read.parquet(path).schema`` (file listing + footer read,
#: ~0.3-0.4 s) — pure fixed cost on the gate's 7 drains (round-9
#: verdict ask #6). Keyed on the JVM session id like
#: sources.tables._DF_CACHE so a new session never reuses stale plans.
_STREAM_SCHEMA_CACHE: dict[tuple[int, str], StructType] = {}


def _source_schema(spark: SparkSession, path: str) -> StructType:
    key = (id(spark._jsparkSession), path)
    if key not in _STREAM_SCHEMA_CACHE:
        _STREAM_SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _STREAM_SCHEMA_CACHE[key]


#: Incoming document records (one json per line in the landing dir).
DOC_STREAM_SCHEMA = StructType(
    [
        StructField("FormName", StringType(), False),
        StructField("text", StringType(), True),
    ]
)

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", StringType(), True),
    ]
)


def stream_documents(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-arrival source: json-lines documents appearing in a dir."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(landing_dir)
    )


def run_streaming_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    token_limit: int = 1000,
    tokenizer: str = "ws",
    embedder=None,
    available_now: bool = True,
):
    """Streaming Pipeline-1: each micro-batch runs the batch operators.

    foreachBatch is the bridge: grouped-map chunk packing
    (applyInPandas) isn't allowed directly on a stream, but inside the
    batch callback the full batch API — and therefore ONE shared
    implementation — applies. Returns the started query.
    """
    from ..functions.embedding import HashingEmbedder, embed_column
    from ..operators.chunking import pypdf_chunk_table

    emb = embedder or HashingEmbedder(dim=64)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = pypdf_chunk_table(
            batch_df, token_limit=token_limit, tokenizer=tokenizer
        )
        embedded = embed_column(chunks, "Content", emb, out_col="Embeddings")
        embedded.write.mode("append").parquet(out_path)

    writer = (
        stream_documents(spark, landing_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_index_upsert(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    *,
    token_limit: int = 1000,
    tokenizer: str = "ws",
    embedder=None,
    available_now: bool = True,
    synced_indexes: Sequence | None = None,
):
    """Streaming Pipeline-1 + Pipeline-2 fused: documents landing in a
    dir flow straight into the vector index, one micro-batch at a time.

    Uses ``id_mode='stable'`` (title + per-title position) so a
    re-delivered/updated document REPLACES its own vectors instead of
    accumulating batch-composition-dependent ids — the incremental
    contract the reference approximates with manual delete + re-upsert
    DAG runs.

    ``synced_indexes``: same contract as
    :func:`run_streaming_index_ingest` — derived indexes on this
    ``index_path`` are ``refresh()``-ed after each micro-batch commit.
    """
    from ..functions.embedding import HashingEmbedder, embed_column
    from ..operators.chunking import pypdf_chunk_table
    from ..operators.index_maintenance import VectorIndex
    from ..plans.pipeline2 import upsert_from_chunks

    emb = embedder or HashingEmbedder(dim=64)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = pypdf_chunk_table(
            batch_df, token_limit=token_limit, tokenizer=tokenizer
        )
        embedded = embed_column(chunks, "Content", emb, out_col="Embeddings")
        upsert_from_chunks(
            VectorIndex(spark, index_path), embedded, id_mode="stable"
        )
        for synced in synced_indexes or ():
            synced.refresh()

    writer = (
        stream_documents(spark, landing_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The testdata events table as a file STREAM — same rows and the
    same nanosecond-timestamp handling as the batch ``load_table``
    (never read events.parquet with a bare reader; see sources.tables).
    """
    from ..sources.tables import _timestamp_columns

    path = f"{sf_dir}/events.parquet"
    nanos, ntz = _timestamp_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _source_schema(spark, path)  # post-nanosAsLong schema
    # FileStreamSource requires a DIRECTORY base path. A Spark-written
    # table IS a directory — stream it directly; a single-file table
    # (the driver testdata shape) streams its parent dir with a glob
    # selecting just the events file.
    import os

    if os.path.isdir(path):
        stream = spark.readStream.schema(schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    for colname in nanos:
        stream = stream.withColumn(
            colname, F.expr(f"timestamp_micros({colname} div 1000)")
        )
    for colname in ntz:
        # NTZ-annotated writers (isAdjustedToUTC=false) must not leak
        # TIMESTAMP_NTZ into watermarks — normalize like load_table does.
        stream = stream.withColumn(colname, F.col(colname).cast("timestamp"))
    stream._sgraft_source_bytes = _path_bytes(path)  # sizes drains
    return stream


def windowed_event_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with late-data watermark (streaming-safe
    aggregation; same result as the batch date_trunc agg once all data
    arrives)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
        )
    )


def run_windowed_counts_available_now(
    spark: SparkSession,
    events_stream: DataFrame,
    *,
    query_name: str = "stream_hourly_counts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow through the windowed
    aggregation into a memory sink and return the final result table.

    Complete output mode re-emits the whole aggregate on the last
    micro-batch, so the returned table equals the batch GROUP BY over
    the same rows — the batch-parity contract the correctness gate
    checks against a plain SQL oracle. (Append mode would withhold
    windows the final watermark hasn't closed; complete mode is the
    deterministic drain-and-stop shape.)
    """
    agg = windowed_event_counts(events_stream, window=window, watermark=watermark)
    with drain_shuffle_partitions(spark, source=events_stream):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(query_name)


def run_sessionize_available_now(
    spark: SparkSession,
    events_stream: DataFrame,
    *,
    query_name: str = "stream_sessions",
) -> DataFrame:
    """Drain the stream through the ``applyInPandasWithState``
    gap-sessionizer into a memory sink and return the FINAL per-user
    state (update mode emits one row per touched user per micro-batch;
    both counters are monotonic, so ``max`` per user is the final
    value). With a drained bounded stream this equals the batch
    gap-sessionization exactly — the custom-stateful-operator
    batch-parity contract, checkable against a plain SQL oracle."""
    sess = sessionize_stream(events_stream)
    # State-store partition count is fixed at query start from
    # shuffle.partitions. The pandas state stage is Python-CPU-bound
    # per group, so it wants one partition per core — unlike JVM-state
    # ops (dedup/window aggs), where fewer partitions win on task
    # overhead. Raise to core count for this query only (fresh
    # checkpoint per drain, so the partition count may differ per run).
    spark = events_stream.sparkSession
    old_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cores = spark.sparkContext.defaultParallelism
    with drain_shuffle_partitions(spark, max(old_sp, cores)):
        q = (
            sess.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").cast("bigint").alias("n_sessions"),
            F.max("n_events").cast("bigint").alias("n_events"),
        )
    )


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: at-least-once sources (kafka retries,
    file redelivery) → exactly-once rows downstream. State is bounded
    by the watermark: keys older than it are forgotten, so memory is
    O(keys per watermark window), not O(stream history) — the required
    shape for an unbounded 100 TB/day feed."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        [*key_cols, ts_col]
    )


_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_sessions", IntegerType(), False),
        StructField("n_events", LongType(), False),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("n_sessions", IntegerType(), True),
        StructField("n_events", LongType(), True),
    ]
)

_GAP_US = 1800 * 1_000_000  # 30 min, matching the batch sessionization

# Per-group output template: building a fresh 1-row DataFrame from a
# dict costs ~160µs; copying a dtype-correct template and poking values
# via .iat costs ~50µs. With one Python call per user per micro-batch
# (~15k groups at sf1) the constructor is a top-2 term in the whole
# drain, so this matters. Dtypes must match _SESSION_OUT_SCHEMA exactly
# (int64 / int32 / int64) or Arrow re-casts per group.
_OUT_TEMPLATE = pd.DataFrame(
    {
        "user_id": pd.array([0], dtype="int64"),
        "n_sessions": pd.array([0], dtype="int32"),
        "n_events": pd.array([0], dtype="int64"),
    }
)


def _session_fn(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful gap-sessionizer: carries (last_ts, session count, event
    count) across micro-batches for one user."""
    if state.exists:
        last_ts_us, n_sessions, n_events = state.get
    else:
        last_ts_us, n_sessions, n_events = None, 0, 0
    # applyInPandasWithState delivers one group as MULTIPLE Arrow chunks
    # (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k) in
    # shuffle order — sorting each chunk independently would compute
    # gaps over unordered timestamps once a user exceeds one chunk per
    # micro-batch. Materialize the whole group, then sort globally.
    # pd.concat costs ~130µs/call even for one chunk, so the (dominant)
    # single-chunk case skips it and concatenates bare µs arrays only
    # when a group really spans chunks.
    # Gap detection is vectorized (np.diff over the sorted µs array) —
    # the per-row pandas-scalar loop this replaced dominated the drain
    # (~2× the whole query at sf1). Session count is order-independent
    # under timestamp ties, so sorting the bare int array is exact.
    import numpy as np

    def _to_us(series: pd.Series) -> "np.ndarray":
        arr = series.to_numpy()
        # Arrow→pandas normally yields datetime64[ns], but be exact if a
        # future serializer hands datetime64[us] through; never sort a
        # raw .view() in place (it would scribble on the input frame).
        if np.datetime_data(arr.dtype)[0] == "us":
            return arr.view("int64").copy()
        return arr.view("int64") // 1000

    arrs = [_to_us(pdf["ts"]) for pdf in pdfs if len(pdf)]
    if arrs:
        ts_us = arrs[0] if len(arrs) == 1 else np.concatenate(arrs)
        ts_us.sort()
        n_sessions += int(last_ts_us is None or ts_us[0] - last_ts_us > _GAP_US)
        if len(ts_us) > 1:
            n_sessions += int((np.diff(ts_us) > _GAP_US).sum())
        last_ts_us = int(ts_us[-1])
        n_events += len(ts_us)
    state.update((last_ts_us, n_sessions, n_events))
    out = _OUT_TEMPLATE.copy()
    out.iat[0, 0] = key[0]
    out.iat[0, 1] = n_sessions
    out.iat[0, 2] = n_events
    yield out


def sessionize_stream_native(
    events: DataFrame,
    *,
    gap_us: int = _GAP_US,
    watermark: str | None = None,
) -> DataFrame:
    """JVM-native fixed-gap sessionization: ``groupBy(user_id,
    session_window(ts, gap))`` — one row per (user, session) with its
    event count, all session state merged in the JVM state store.

    The ``applyInPandasWithState`` sessionizer exists for logic the
    built-in can't express (custom carry-over counters, cross-session
    features); for the plain fixed-gap case it pays one Python call +
    state round-trip per ACTIVE USER per micro-batch (~270 µs/group —
    the round-4 steady-state knee at ~2k rows/s on 1 s triggers). This
    variant keeps everything in whole-stage-codegen + the state store:
    same shuffle key, zero Python, so throughput tracks the JVM
    stateful ops (≥100k rows/s at 1 s triggers, BASELINE.md).

    Boundary parity: the engine's gap rule is STRICTLY-greater (a gap
    of exactly 30 min stays in-session — `_session_fn` and the SQL
    oracle both use ``>``), and ``session_window`` MERGES an event
    landing exactly on the window end (verified empirically: gap
    1800 s keeps a 1800.000000 s-apart pair in one session and splits
    1800.000001 s — pytest ``test_native_session_window_gap_boundary``
    pins it), so the plain gap duration reproduces the rule exactly.

    ``watermark`` bounds state for continuous serving (append mode —
    session-window aggs don't support update); leave None for
    complete-mode bounded drains."""
    ev = events.select("user_id", "ts")
    if watermark is not None:
        ev = ev.withWatermark("ts", watermark)
    return ev.groupBy(
        "user_id",
        F.session_window("ts", f"{gap_us} microseconds").alias("sw"),
    ).agg(F.count(F.lit(1)).alias("n_events"))


def run_sessionize_native_available_now(
    spark: SparkSession,
    events_stream: DataFrame,
    *,
    query_name: str = "stream_sessions_native",
) -> DataFrame:
    """Drain the stream through the native ``session_window``
    sessionizer (complete mode — the bounded-drain shape: all session
    state retained and re-merged each micro-batch, so out-of-order
    events across batch boundaries coalesce exactly like batch) and
    roll up to per-user (n_sessions, n_events) — the same contract as
    ``run_sessionize_available_now``, so the same SQL oracle gates
    both implementations."""
    sess = sessionize_stream_native(events_stream)
    # session_window's state stage SORTS each partition — the one drain
    # shape where the size-scaled count measured faster than the floor
    with drain_shuffle_partitions(
        spark, sized_drain_partitions(events_stream)
    ):
        q = (
            sess.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: per-user session counts, updated per
    micro-batch — the custom-stateful-operator pattern (SURVEY §2.9's
    'not required for parity' op, provided anyway for the streaming
    mode).

    Projects to (user_id, ts) before the stateful shuffle: the
    sessionizer reads only timestamps, so the other event columns would
    just widen the exchange and every per-group Arrow transfer."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_novelty_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Streaming incremental-corpus ingest: only NOVEL documents pass.

    Each micro-batch keeps the documents whose normalized-content
    fingerprint occurs neither in the static corpus nor in anything
    already ingested by earlier batches, then appends them to
    ``out_path`` — the streaming face of ``operators.novelty``: the
    corpus-side Bloom filter resolves most of the batch without
    touching the corpus, the exact anti join cleans up the "maybe"
    residue, and re-deliveries (at-least-once sources) or re-posted
    documents in later batches are dropped because the output feeds
    back into the seen-set. Within-batch duplicates collapse via a
    fingerprint dropDuplicates before the novelty check.
    """
    from ..functions.textfns import exact_fingerprint
    from ..operators.novelty import novel_rows
    from ..runtime import release_caches

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.withColumn(
            "__fp", exact_fingerprint(F.col("text"))
        ).dropDuplicates(["__fp"])
        seen = spark.read.parquet(corpus_path).select(
            exact_fingerprint(F.col("text")).alias("__fp")
        )
        # existence check, NOT a bare try/except around the read: a
        # corrupt footer or transient store error must FAIL the batch
        # (streaming retries it) — silently degrading the seen-set to
        # corpus-only would re-ingest every earlier doc as a duplicate
        jvm = spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(out_path)
        fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hp):
            ingested = spark.read.parquet(out_path).select(
                exact_fingerprint(F.col("text")).alias("__fp")
            )
            seen = seen.unionByName(ingested)
        # same cost dispatch as the batch query: while the seen-set is
        # small (early stream life) the plain anti join beats the
        # bitmap build that would otherwise run EVERY micro-batch; the
        # bloom path takes over once the corpus earns it
        novel, _ = novel_rows(
            seen, batch, "__fp", with_stats=False,
            bloom_min_corpus_rows=2_000_000,
        )
        novel.drop("__fp").write.mode("append").parquet(out_path)
        # novel_rows registers its checkpoint + broadcast with the
        # shared release registry; a long-running stream must drain it
        # per batch or the registry pins blocks forever
        release_caches()

    writer = (
        stream_documents(spark, landing_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
def stream_embeddings_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The testdata embeddings table as a file STREAM (same
    directory-vs-single-file handling as ``stream_events_table``)."""
    import os

    path = f"{sf_dir}/embeddings.parquet"
    schema = _source_schema(spark, path)
    if os.path.isdir(path):
        stream = spark.readStream.schema(schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "embeddings.parquet")
            .parquet(sf_dir)
        )
    stream._sgraft_source_bytes = _path_bytes(path)  # sizes drains
    return stream


def run_streaming_index_ingest(
    spark: SparkSession,
    emb_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    title_col: str = "label",
    text_fmt: str = "vec %s",
    seq_col: str | None = None,
    available_now: bool = True,
    query_name: str = "stream_index_ingest",
    synced_indexes: Sequence | None = None,
):
    """Streaming RAW-VECTOR index ingest: each micro-batch of landed
    embeddings becomes ONE ``VectorIndex.upsert`` — a read-merge-publish
    manifest commit under the writer lock, so concurrent READERS keep
    their snapshot through every batch and never see a partial batch
    (the streaming face of the reference's poll-then-upsert loop,
    pipeline2.py:163-187, re-expressed as Structured Streaming +
    the versioned-manifest commit protocol).

    The document-feed sibling is ``run_streaming_index_upsert`` (JSON
    docs → chunk → embed → index); this one takes vectors already
    computed — the contract of a feature-store/embedding-service feed —
    which is what makes its final state expressible as plain SQL over
    the input table (the ``stream_index_ingest`` gate oracle).

    Exactly-once effect without sink-side dedup bookkeeping: upsert
    MERGES by id, so a replayed micro-batch (crash between commit and
    checkpoint advance) re-merges the same rows into the same logical
    state — the manifest version moves, the row-set does not.

    ``VectorIndex.upsert`` expects UNIQUE ids per call, but one
    micro-batch can carry several versions of an id (a restarted
    stream coalesces multiple landed files into one batch). Each batch
    therefore resolves to one row per id before the upsert: the row
    with the max ``seq_col`` wins when the feed carries a sequence /
    version column (the CDC contract), else the lexicographically
    latest source FILE wins (deterministic for ordered landing names;
    an id must not repeat within one file).

    ``synced_indexes``: derived indexes (:class:`SyncedIvfpqIndex` /
    :class:`SyncedTextIndex` handles constructed on a ``VectorIndex``
    at this same ``index_path``) to ``refresh()`` inside foreachBatch
    after each commit — serving stays in lock-step with ingest, so a
    post-drain ``search(..., on_stale='error')`` succeeds and returns
    the streamed vectors. Refresh runs under the derived module's
    primary reader lease, so it composes with retention/vacuum; cost
    per batch is O(titles the batch touched), the incremental-refresh
    contract.

    Returns the ``VectorIndex`` handle once the drain finishes
    (``available_now=True``) or the running query otherwise.
    """
    from ..operators.index_maintenance import VectorIndex

    idx = VectorIndex(spark, index_path)

    from pyspark import StorageLevel

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # no isEmpty() probe: it costs a take(1) job on EVERY batch,
        # while upsert's first action (the per-title count aggregation)
        # already detects an empty batch and returns before any write,
        # and refresh() of an unchanged data version is a driver-side
        # no-op — so the probe only duplicated work on the common
        # non-empty path
        seq = F.col(seq_col) if seq_col else F.input_file_name()
        rows = (
            batch_df.select(
                F.col(id_col).cast("string").alias("id"),
                F.col(vec_col).alias("vector"),
                F.col(title_col).cast("string").alias("title"),
                F.format_string(
                    text_fmt, F.col(id_col).cast("string")
                ).alias("text"),
                seq.alias("__seq"),
            )
            .groupBy("id")
            .agg(
                F.max_by(
                    F.struct("vector", "title", "text"), F.col("__seq")
                ).alias("__s")
            )
            .select("id", "__s.vector", "__s.title", "__s.text")
        )
        # upsert runs several actions over the batch (touched-title
        # collect, dimension guard, merge write); without a persist
        # each one re-reads the source files of the micro-batch
        rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            idx.upsert(rows)
            # idx.exists() (driver-side manifest check) keeps an empty
            # FIRST batch from bootstrapping a build over an empty
            # primary; an empty LATER batch reaches refresh(), which is
            # a driver-side no-op at an unchanged data version
            if idx.exists():
                for synced in synced_indexes or ():
                    # first non-empty batch bootstraps (refresh of an
                    # unbuilt index builds); later batches re-encode
                    # only the touched titles' rows
                    synced.refresh()
        finally:
            rows.unpersist()

    writer = (
        emb_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        # bounded drain: scope the shuffle/state partitioning down so
        # the per-batch merge repartition doesn't pay 32 near-empty
        # tasks (see drain_shuffle_partitions; production streams keep
        # the session default)
        with drain_shuffle_partitions(spark, source=emb_stream):
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        return idx
    return writer.start()
