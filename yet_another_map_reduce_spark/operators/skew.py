"""Skew mitigation: salted aggregation and salted (replicated) joins.

At 100 TB a handful of hot keys (the reference's md5-mod-W placement has
the same failure mode, ``/root/reference/Worker/worker.py:213-214``)
turn one reducer into the whole job's critical path.  Two standard
counter-moves, expressed as result-identical DataFrame rewrites:

- **salted aggregation**: split each hot group into ``salt`` subgroups
  (phase 1: shuffle on (key, salt) — parallel), then merge subaggregates
  (phase 2: shuffle on key — tiny).  Works for any algebraic aggregate
  (sum/count/min/max and anything with a merge function).
- **salted join**: salt the big side deterministically; replicate each
  small-side row to every salt bucket.  The join key becomes
  (key, salt) — hot keys fan out over ``salt`` tasks.

AQE's skew-join splitting handles many cases automatically; these
explicit forms cover aggregations (where AQE doesn't re-split) and
joins whose skew is known up front.

Salts are derived from existing columns (xxhash64), not ``rand()`` —
deterministic results, replay-safe, oracle-checkable.  The salt never
appears in the output, so it needs determinism, not cross-engine
portability: the JVM-native hash beats an md5-over-string round-trip by
an order of magnitude per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate -> (phase-1 partial fn, phase-2 merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted groups.

    ``aggs`` is a list of (column, fn, alias) with fn in
    {sum, count, min, max}.  ``salt_col`` is any reasonably-distributed
    existing column used to derive the deterministic salt.
    """
    for _, fn, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn} is not algebraic-mergeable; use plain groupBy")
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(salt)))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_ALGEBRAIC[fn][0](c).alias(f"__p_{alias}") for c, fn, alias in aggs]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](f"__p_{alias}").alias(alias) for _, fn, alias in aggs]
    )
    return phase2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_col: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicated salted join: big side salted on an existing column,
    small side exploded onto all ``salt`` buckets.

    Result-identical to ``big.join(small, big_key == small_key)``; the
    shuffle key (key, salt) spreads each hot key over ``salt`` tasks at
    the cost of replicating the small side ``salt`` times.
    """
    b = big.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(salt)))
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    # per-side attribute references (b[...]/s[...]) — a bare F.col() is
    # AMBIGUOUS_REFERENCE whenever both sides share the key column name,
    # which is the normal equi-join case
    joined = b.join(
        s,
        on=[b[big_key] == s[small_key], b["__salt"] == s["__salt"]],
        how=how,
    )
    return joined.drop(b["__salt"]).drop(s["__salt"])


def skew_stats(df: DataFrame, key: str | Column, top: int = 10) -> DataFrame:
    """Key-frequency diagnostic: the lookahead you run BEFORE deciding
    to salt.  Returns the ``top`` heaviest keys with row counts and
    share of total.

    ONE scan: the total comes from an unpartitioned window sum over the
    (already tiny) grouped counts, not a separate ``df.count()`` pass —
    the grouped relation is O(keys), so the single-partition window is
    on the small side of the plan, never the raw data."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    from pyspark.sql import Window

    return (
        counts.withColumn(
            "share",
            F.round(F.col("n_rows") / F.sum("n_rows").over(Window.partitionBy()), 6),
        )
        # key-value tiebreak: the top-k boundary is deterministic even
        # when several keys share the cutoff count
        .orderBy(F.col("n_rows").desc(), F.col(counts.columns[0]).asc())
        .limit(top)
    )
