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
    {sum, count, min, max}.  ``salt_col`` must VARY WITHIN a hot group
    (any row-level column not functionally determined by ``keys``):
    the salt is ``hash(salt_col) % salt``, so a salt column that is
    constant per group — e.g. one of the grouping keys — gives every
    row of the hot group the SAME salt, and the salting is a silent
    no-op (results stay correct, the hot task stays hot).  Rejected
    loudly for the directly-detectable case.
    """
    for _, fn, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn} is not algebraic-mergeable; use plain groupBy")
    if salt_col in keys:
        raise ValueError(
            f"salted_group_agg: salt_col {salt_col!r} is a grouping key — "
            "constant within every group, so the salt cannot spread a hot "
            "group (silent no-op); pass a row-varying column instead"
        )
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

    Result-identical to ``big.join(small, big_key == small_key)`` for
    the SUPPORTED join types (inner and the left-preserving family).
    ``how='right'/'full'`` is rejected: the exploded small side would
    emit every unmatched small row ``salt`` times (plus null-padded
    phantoms for replicas whose salt never matched) — silently corrupt
    under the result-identical claim.

    ``salt_col`` must VARY WITHIN a hot key: a salt derived from the
    join key itself is constant per key, so the hot key still lands on
    one task while the small side is replicated for nothing — rejected
    loudly (the salting-no-op trap).
    """
    if how.replace("_", "") not in ("inner", "left", "leftouter", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded small "
            "side would duplicate small-preserved rows across salt "
            "replicas; use a plain join (optionally with AQE skew "
            "handling) for right/full outer"
        )
    if salt_col == big_key:
        raise ValueError(
            f"salted_join: salt_col {salt_col!r} equals the join key — the "
            "salt is then constant within each hot key and spreads "
            "nothing (silent no-op); pass a row-varying big-side column"
        )
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
