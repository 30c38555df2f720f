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


def foreach_batch_upsert(
    stream: DataFrame,
    snapshot_path: str,
    keys: list[str],
    checkpoint_path: str,
    seq_col: str | None = None,
):
    """Streaming CDC apply: each micro-batch MERGEs into a parquet
    snapshot via :func:`operators.upsert.upsert` (broadcast path — a
    micro-batch is exactly the small-delta shape).

    Classic read-modify-write via ``foreachBatch``: the batch is deduped
    to one row per key before merging, and the snapshot is rewritten
    atomically per batch.  ``seq_col`` names the change log's sequence /
    LSN column and should be set whenever one exists: "last writer wins"
    then means highest sequence value.  Without it the fallback ordinal
    is ``monotonically_increasing_id``, whose HIGH BITS are the
    partition index — so for a multi-partition batch "last" degrades to
    "row in the highest-numbered partition", which is fine for
    single-source micro-batches but NOT a total arrival order.  At
    100 TB the rewrite becomes partition-targeted dynamic overwrite
    (writers.py) or a format with row-level MERGE; the dataflow shape
    is identical.

    Returns the started ``StreamingQuery``.
    """
    from pyspark.sql import functions as F

    from yet_another_map_reduce_spark.operators.upsert import upsert

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        non_keys = [c for c in batch.columns if c not in keys]
        # one surviving row per key: max_by on the real sequence column
        # when the log has one, else the partition-ordinal fallback
        # (agg-position last() would ignore row order entirely)
        if seq_col is not None:
            ordered = batch.withColumn("__ord", F.col(seq_col))
        else:
            ordered = batch.withColumn("__ord", F.monotonically_increasing_id())
        delta = ordered.groupBy(*keys).agg(
            *[F.max_by(c, F.col("__ord")).alias(c) for c in non_keys]
        ).select(*batch.columns)
        try:
            base = spark.read.parquet(snapshot_path)
        except Exception:  # first batch: snapshot does not exist yet
            base = None
        if base is None:
            merged = delta
        elif seq_col is not None:
            # seq-aware MERGE: highest sequence wins across batches too,
            # so late-arriving stale changes (replays, out-of-order
            # files) can never clobber a newer snapshot row.  Requires
            # seq to be unique per key (the LSN property).
            merged = (
                base.unionByName(delta)
                .groupBy(*keys)
                .agg(*[F.max_by(c, F.col(seq_col)).alias(c) for c in non_keys])
                .select(*batch.columns)
            )
        else:
            merged = upsert(base, delta, keys, broadcast_updates=True)
        # materialize BEFORE overwriting the path the plan reads from
        # (localCheckpoint stores the rows and truncates lineage, so the
        # write cannot re-scan the files it is replacing)
        staged = merged.localCheckpoint(eager=True)
        staged.write.mode("overwrite").parquet(snapshot_path)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
