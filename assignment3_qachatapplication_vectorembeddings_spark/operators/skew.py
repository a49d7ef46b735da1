"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one viral document's shingles, one
power user's events) can pin a whole stage on one reducer. AQE's skew
join handles sort-merge cases; these helpers cover the two patterns
AQE doesn't: hot-key GROUP BY and broadcast-replicated joins against a
skewed probe side.

Both are *exact* — salting only changes the shuffle topology:

- **salted_agg**: stage 1 aggregates (key, salt) partials (the hot key
  fans out over ``num_salts`` reducers), stage 2 merges partials per
  key. Works for any algebraic aggregate (sum/count/min/max — the
  merge function is declared per column).
- **salted_join**: the small side is replicated ``num_salts``× with an
  explicit salt column; the big side picks a uniform pseudo-random
  salt per row (hash of all columns — deterministic, no rand()), so
  each hot join key spreads over ``num_salts`` tasks. Inner/left
  semantics preserved exactly; result equality is tested.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]

#: merge functions for algebraic aggregates: final(key) <- merge(partials)
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _row_salt(df: DataFrame, num_salts: int) -> Column:
    """Deterministic per-row salt: hash of the whole row (no rand() —
    retries/speculative tasks must agree)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    *,
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage exact aggregation for skewed grouping keys.

    ``aggs``: out_col → (fn, in_col) with fn ∈ sum|count|min|max.
    Example: ``salted_agg(events, ["user_id"], {"n": ("count", "*"),
    "total": ("sum", "value")})``.
    """
    salt = _row_salt(df, num_salts)
    stage1_exprs = [
        F.count(F.lit(1)).alias(out)
        if fn == "count"
        else getattr(F, fn)(F.col(col)).alias(out)
        for out, (fn, col) in aggs.items()
    ]
    partials = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*stage1_exprs)
    )
    finals = [
        _MERGES[fn](F.col(out)).alias(out) for out, (fn, _col) in aggs.items()
    ]
    return partials.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Exact join with the hot keys of ``big`` spread over num_salts
    tasks. ``small`` is replicated num_salts× (keep it broadcast-sized
    × num_salts); supported how: inner, left."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salted_big = big.withColumn("__salt", _row_salt(big, num_salts))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted_big.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")
