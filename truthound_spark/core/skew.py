"""Skew mitigation helpers: salted joins + AQE guidance.

At 100 TB a handful of hot keys (one customer with millions of orders,
one null-ish default FK) turn a hash join's one reducer into the whole
job's critical path. Two tools:

* AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``) splits oversized
  partitions at runtime — the first line of defense, zero code changes;
* explicit salting (below) for the joins AQE can't fix (broadcast-ineligible
  anti-joins, aggregations ON the skewed key itself).

``salted_left_join`` replicates the (small, deduplicated) right side
``salt`` times and scatters the left side uniformly across the salt space:
each hot key's rows spread over ``salt`` reducers. Works for inner / left /
left_anti joins because every left row still sees exactly one copy of its
matching right row (its salt replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "left_semi",
    salt: int = 16,
) -> DataFrame:
    """KEY-MEMBERSHIP join with the left side's hot keys scattered over
    ``salt`` buckets.

    The right side is reduced to its deduplicated join keys and replicated
    ``salt`` times (an explode of a literal range — cheap when right is the
    small side); the left side gets a uniform pseudo-random salt from a
    hash of ALL its columns, so the same key's rows land on different
    reducers.

    Scope: this is a membership filter, not a general join — the result
    carries ONLY left columns (``left_semi``: rows whose key exists in
    right; ``left_anti``: rows whose key does not; ``inner`` is accepted
    as an alias of ``left_semi`` since the key-only replicated right side
    makes them equivalent). Right-side payload columns and right-side key
    multiplicity are intentionally out of scope — a general salted inner
    join would have to replicate payload too and is a different trade.
    """
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_left_join supports left_semi/left_anti membership joins "
            f"(and 'inner' as a semi alias), not how={how!r}"
        )
    if how == "inner":
        how = "left_semi"
    salt_col = "__salt"
    left_s = left.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    right_s = (
        right.select(*on)
        .dropDuplicates(on)
        .withColumn(salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .withColumn(salt_col, F.col(salt_col).cast(left_s.schema[salt_col].dataType))
    )
    out = left_s.join(right_s, on=[*on, salt_col], how=how)
    return out.drop(salt_col)
