"""Streaming joins beyond the stateful stream-stream case (which lives
in stateful.py): stream-static enrichment.

Reference parity: the reference has no streaming at all (SURVEY.md §2.3)
— its closest shape is re-running a batch job per input drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame, static: DataFrame, keys: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static join: every micro-batch hash-joins against the
    static dimension — stateless (no state store, no watermark), the
    standard streaming-enrichment shape.  Broadcasting the static side
    keeps each micro-batch map-only; cache the static side upstream so
    it is not re-scanned per batch."""
    return stream.join(F.broadcast(static), keys, how)
