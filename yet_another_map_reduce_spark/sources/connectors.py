"""External connectors: JDBC and Kafka.

Thin declarative wrappers over Spark's built-in connectors.  This
container has no database server, JDBC driver jar, or Kafka broker, so
these are exercised only up to plan construction; the read paths raise
Spark's own clear errors when the external system is absent.  The one
network connector the container CAN execute end to end is the TCP
socket source (``streaming.sources.socket_stream``, loopback-pinned by
test) — it shares the downstream ``value``-column contract with the
Kafka wrappers here.  The shapes below are the scale-correct ones:

- JDBC reads MUST be partitioned (``partition_column`` + bounds) — an
  unpartitioned JDBC read funnels the whole table through one task;
- Kafka streams carry (key, value) as binary — schema is applied
  explicitly downstream (``from_json``), never inferred.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan.  Predicates pushed by Catalyst reach the
    remote database as WHERE clauses."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka micro-batch source: binary key/value + topic/partition/
    offset/timestamp metadata columns."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_kafka(df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str):
    """Streaming Kafka sink; ``df`` must have string/binary ``key`` and
    ``value`` columns."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
