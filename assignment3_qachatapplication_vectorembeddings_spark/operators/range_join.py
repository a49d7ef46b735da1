"""Range ("interval") join and as-of join — temporal operators the
reference never needed (SURVEY §2.3: none required for parity) but a
general engine must provide; both expressed scale-first.

**Range join**: pairs (l, r) with ``r.ts ∈ (l.ts, l.ts + window]`` on
the same key. A naive theta-join is O(n²) per key; instead both sides
are bucketed by ``floor(ts / window)`` and each left bucket joins only
its own and the NEXT bucket — every qualifying pair lands in one of
those two buckets (window-sized intervals can span at most one bucket
boundary), so the equi-join prunes everything else and the final
inequality filter makes the result exact.

**As-of join** (nearest prior event): implemented as a union + window
``last(value, ignoreNulls)`` carry-forward — one sort-based window per
key, no join at all. This is the standard Spark shape for
point-in-time correctness joins (feature stores, trade/quote).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["range_join_next_window", "asof_join_prior"]


def range_join_next_window(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    window_seconds: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Exact pairs (l, r) with same key and ``l.ts < r.ts <= l.ts + W``.

    Bucketed equi-join: join on (key, bucket) for the left row's bucket
    and bucket+1, then the exact inequality filter. Shuffle volume is
    2× rows on narrow keys — never the quadratic pair space.
    """
    w_us = window_seconds * 1_000_000
    lb = left.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__lts"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
    )
    rb = right.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__rts"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    lb = lb.withColumn("__b", F.floor(F.col("__lts") / w_us))
    rb = rb.withColumn("__rb", F.floor(F.col("__rts") / w_us))
    # left bucket b joins right buckets {b, b+1}
    lb2 = lb.withColumn("__probe", F.explode(F.array(F.col("__b"), F.col("__b") + 1)))
    out = (
        lb2.join(rb, (lb2.__k == rb.__k) & (lb2.__probe == rb.__rb))
        .filter(
            (F.col("__rts") > F.col("__lts"))
            & (F.col("__rts") <= F.col("__lts") + w_us)
        )
        .drop("__k", "__b", "__probe", "__rb", "__lts", "__rts")
    )
    return out


def asof_join_prior(
    events: DataFrame,
    *,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    value_col: str,
    condition,
    out_col: str = "asof_value",
) -> DataFrame:
    """For every row, the most recent PRIOR value of ``value_col`` among
    rows satisfying ``condition`` (a Column predicate), per key.

    No join: mark matching rows' values, then carry the last non-null
    over a (unbounded, -1] window — one sort per key partition.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = F.when(condition, F.col(value_col))
    return events.withColumn(
        out_col, F.last(marked, ignorenulls=True).over(w)
    )
