"""External vector-index egress — the pluggable S12 sink.

The reference bulk-upserts every batch into a hosted Pinecone index
(``airflow-pipeline/dags/pipeline2.py:144-149``, 300-vector batches
via ``df_batcher``). This engine's canonical store is the parquet
``VectorIndex`` (operators/index_maintenance.py) — a deliberate design
decision: index maintenance stays a Spark job with no external
consistency window. Deployments that must ALSO mirror vectors into an
external ANN service (Pinecone, Milvus, pgvector, …) plug a sender
into this hook instead of the engine hard-coding any vendor client.

Shape: ``foreachPartition`` — each executor partition opens its own
sender session and pushes ``batch_size``-row batches, so egress runs
cluster-parallel with no driver bottleneck and no full-table collect.
The sender callable must be picklable (top-level function or
closure over simple config), receives ``list[dict]`` rows, and is
responsible for its own retries; raising lets Spark's task retry
re-send the partition (senders should therefore be idempotent-by-id,
which vector upserts are).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

__all__ = ["push_to_external_index"]


def push_to_external_index(
    records: DataFrame,
    sender: Callable[[list[dict]], None],
    *,
    batch_size: int = 300,
) -> None:
    """Stream ``records`` to an external index via ``sender``.

    ``records`` is any DataFrame whose rows the sender understands —
    for reference parity, ``VectorIndex`` records ``(id, vector,
    title, text)``; the sender sees each row as a plain dict, matching
    the (vector_id, content_vector, metadata) triple zipped at
    pipeline2.py:146. ``batch_size`` defaults to the reference's
    300-vector batching (pipeline2.py:107-112).
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")

    def _push(rows) -> None:
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict())
            if len(batch) >= batch_size:
                sender(batch)
                batch = []
        if batch:
            sender(batch)

    records.foreachPartition(_push)
