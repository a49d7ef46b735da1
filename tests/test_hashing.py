"""Parity pin for the driver-side xxhash64 twin: the synced text
index prunes postings buckets by hashing query terms CLIENT-side
(round-5 verdict perf-weak #1 — one Spark collect job per query just
to learn bucket ids), which is only sound if the Python hash equals
the JVM's ``F.xxhash64`` bit-for-bit on every string it will ever see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.functions.hashing import (
    term_bucket,
    xxhash64,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.text_search import (
    _term_bucket,
)

# every length class of the algorithm (tail byte/int/long paths, the
# 32-byte stripe loop), plus multi-byte UTF-8 and realistic terms
CASES = (
    [""]
    + ["x" * n for n in range(1, 40)]
    + ["a" * 100, "b" * 1000]
    + [
        "hello",
        "Hello World",
        "héllo",
        "naïve café",
        "日本語テキスト",
        "тест",
        "🚀🔥",
        "mixed 日本 ascii",
        "spark",
        "join",
        "quantum",
        "the",
        "1099-c",
        "w-2",
        "7",
        "-7",
        " 7",
        "tab\tand\nnewline",
    ]
)


def test_xxhash64_matches_jvm(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in CASES:
        assert xxhash64(s) == got[s], f"xxhash64 parity broke for {s!r}"


def test_term_bucket_matches_jvm(spark):
    df = spark.createDataFrame([(s,) for s in CASES if s], "s string")
    for buckets in (8, 64):
        got = {
            r["s"]: r["b"]
            for r in df.select(
                "s", _term_bucket(F.col("s"), buckets).alias("b")
            ).collect()
        }
        for s, b in got.items():
            assert term_bucket(s, buckets) == b


def test_xxhash64_matches_jvm_randomized(spark):
    """300 seeded pseudo-random strings across byte/char alphabets —
    the broad-net companion to the structured CASES."""
    import random

    rng = random.Random(0xC0FFEE)
    alphabets = [
        "abcdefghijklmnopqrstuvwxyz0123456789 _-",
        "".join(chr(c) for c in range(0x20, 0x7F)),
        "áéíóúñçßøæœ日本語中文한국어русский",
        "".join(chr(c) for c in range(0x1F300, 0x1F340)),  # emoji block
    ]
    cases = [
        "".join(rng.choice(alphabets[i % len(alphabets)]) for _ in range(rng.randint(1, 120)))
        for i in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in cases:
        assert xxhash64(s) == got[s]
