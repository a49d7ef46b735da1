"""Parquet timestamp-annotation robustness of the table loader.

The testdata generator is outside our control and has shipped the SAME
logical column under different parquet annotations across rounds:
int64 nanoseconds, micro/milli with isAdjustedToUTC=false (Spark 4
infers TIMESTAMP_NTZ), and micro with isAdjustedToUTC=true.  Every
variant must surface as a session-tz TIMESTAMP with identical
wall-clock values, or downstream `unix_micros` / watermarks / oracle
comparisons silently diverge (this broke 4 queries when the driver
regenerated the data with NTZ annotations).
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
    load_table,
)
from assignment3_qachatapplication_vectorembeddings_spark.streaming.ingest import (
    stream_events_table,
)

WALL = [
    datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999000),
]


def _write(dir_path, arrow_type):
    ts = pa.array(WALL, type=arrow_type)
    ids = pa.array([1, 2], type=pa.int64())
    pq.write_table(
        pa.table({"event_id": ids, "ts": ts}),
        str(dir_path / "events.parquet"),
    )


VARIANTS = {
    "nanos_int64": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "millis_ntz": pa.timestamp("ms"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_load_table_normalizes_timestamp_annotation(spark, tmp_path, name):
    _write(tmp_path, VARIANTS[name])
    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{name}: expected session-tz TIMESTAMP, got {df.schema['ts'].dataType}"
    )
    # render wall clock JVM-side (session tz = UTC) — collect() converts
    # timestamps via the PYTHON process tz, which would make a naive-
    # datetime comparison fail spuriously on non-UTC machines
    got = [
        r["s"]
        for r in df.select(
            "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")
        )
        .orderBy("event_id")
        .collect()
    ]
    want_dt = WALL if name != "millis_ntz" else [
        w.replace(microsecond=(w.microsecond // 1000) * 1000) for w in WALL
    ]
    want = [w.strftime("%Y-%m-%d %H:%M:%S.%f") for w in want_dt]
    assert got == want, f"{name}: wall-clock drifted: {got}"
    # the normalized column must feed micros/watermark arithmetic
    micros = df.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()
    assert micros[0]["us"] == int(want_dt[0].replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


@pytest.mark.parametrize("name", ["nanos_int64", "micros_ntz"])
def test_streaming_source_normalizes_timestamp_annotation(spark, tmp_path, name):
    _write(tmp_path, VARIANTS[name])
    stream = stream_events_table(spark, str(tmp_path))
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    # a watermark over the normalized column must be accepted end-to-end
    out = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .count()
        .writeStream.format("memory")
        .queryName(f"ts_norm_{name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    rows = spark.sql(f"select count(*) c from ts_norm_{name}").collect()
    assert rows[0]["c"] >= 1
