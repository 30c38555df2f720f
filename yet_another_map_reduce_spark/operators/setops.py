"""Relational set operators (ABSENT in the reference — the chunk concat
during READ-merge at ``/root/reference/Client/client.py:99-101`` is
physical file concatenation, not a relational union).

Bag vs set semantics are explicit: ``*_all`` keeps duplicates (no
shuffle for union_all; intersect/except shuffle on the full row).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column name — narrow (no shuffle)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """UNION (set) — one shuffle to dedup."""
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT (set semantics)."""
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
