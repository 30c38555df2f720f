"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``yet_another_map_reduce_spark.queries`` — the full
registry lives there so the package, tests, and bench share one source
of truth.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yet_another_map_reduce_spark.queries import ORACLES, QUERIES, ordered_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's golden aggregation
    (max cost per key, /root/reference/reducer.py:16-40) transposed to
    the lineitem table."""
    return QUERIES["flagship_max_price"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Visit order is the explicit ``ordered_queries`` policy (previously-
    failed first, then never-verified, then green oldest-first) so a
    time-budgeted correctness pass re-checks fixes and rotates stale
    rows; the package-level ``QUERIES`` registry itself keeps fixed
    source order."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins.  Since round 10 EVERY registered
    query has one (the last rows-only row, text_bpe_tokenize_8k, got an
    encode-half recursive-CTE oracle over its frozen merge table); a
    future query absent here would fall back to the driver's rows-only
    check and be flagged by test_registry_invariants."""
    return dict(ORACLES)
