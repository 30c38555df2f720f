"""Generic MapReduce surface (reference F3-F7) — the fidelity layer.

The reference's core feature is running arbitrary Hadoop-Streaming-style
map/reduce programs (read lines on stdin, write lines on stdout) over a
partitioned text dataset:

    map:     ``/root/reference/Worker/worker.py:72-101``  (Popen pipe :88)
    shuffle: ``/root/reference/Worker/worker.py:111-169`` (md5(key) % W :213-214)
    sort:    ``/root/reference/Worker/worker.py:179-183`` (lexicographic)
    reduce:  ``/root/reference/Worker/worker.py:173-208`` (Popen pipe :193)
    barrier scheduling: ``/root/reference/Master/master_handler.py:130-259``

Spark equivalences used here:

    map     → ``rdd.pipe(cmd)``            (byte-exact external program)
    shuffle → ``partitionBy(W, hash(key))``  (key = text before first ',',
              exactly ``Worker/worker.py:122``'s framing)
    sort    → ``repartitionAndSortWithinPartitions`` (lexicographic on the
              full line, matching ``data.sort()`` at ``worker.py:182``)
    reduce  → ``rdd.pipe(cmd)`` over the sorted partition
    barriers→ Spark stage scheduling (automatic)

Deliberate non-reproductions (reference bugs, SURVEY.md §7):
- the fire-and-forget shuffle race (``worker.py:157-161``) — Spark's
  shuffle is ack'd;
- md5 placement parity — Spark's portable hash places keys on different
  partitions than md5%W, but per-key co-location (the actual contract,
  and explicitly "modular" per the spec PDF) is preserved.

``run_inprocess`` is the idiomatic fast path: the same contract with
Python callables instead of subprocesses (no pipe / fork overhead), for
users migrating reference jobs incrementally.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.rdd import portable_hash
from pyspark.sql import DataFrame, SparkSession


def _key_of(line: str) -> str:
    # the framework-imposed framing: key = text before the first comma
    # (/root/reference/Worker/worker.py:122)
    return line.split(",", 1)[0]


def run_streaming_job(
    spark: SparkSession,
    input_path: str,
    mapper_cmd: str,
    reducer_cmd: str,
    num_reducers: int,
    output_path: str | None = None,
) -> DataFrame:
    """Run external mapper/reducer programs byte-exactly, Hadoop-Streaming
    style (e.g. ``mapper_cmd='python /path/mapper.py'``).

    Returns the reduced lines as a ``value: string`` DataFrame; also
    writes text part-files when ``output_path`` is given (the analog of
    the reference's ``<file>_part-00000.<ext>`` output, F10).
    """
    lines = spark.read.text(input_path).rdd.map(lambda r: r[0])
    mapped = lines.pipe(mapper_cmd)
    # hash-partition on the key, sort lexicographically on the whole line
    # within each partition: exactly F4 + F5.
    shuffled = (
        mapped.map(lambda line: (line, None))
        .repartitionAndSortWithinPartitions(
            numPartitions=num_reducers,
            partitionFunc=lambda line: portable_hash(_key_of(line)),
        )
        .map(lambda kv: kv[0])
    )
    reduced = shuffled.pipe(reducer_cmd)
    out = reduced.map(lambda v: (v,)).toDF(["value"])
    if output_path is not None:
        out.write.mode("overwrite").text(output_path)
    return out


def run_inprocess(
    spark: SparkSession,
    input_path: str,
    mapper: Callable[[str], Iterable[str]],
    reducer: Callable[[str, Iterator[str]], Iterable[str]],
    num_reducers: int,
    output_path: str | None = None,
) -> DataFrame:
    """Same dataflow contract, in-process (no subprocess pipes).

    ``mapper(line) -> iterable of 'key,value' lines``;
    ``reducer(key, values_iterator) -> iterable of output lines`` —
    i.e. the streaming reducer's per-key-group fold with the
    sort/group bookkeeping done by the framework instead of user code.
    """
    lines = spark.read.text(input_path).rdd.map(lambda r: r[0])
    mapped = lines.flatMap(mapper)

    keyed = mapped.map(lambda line: (_key_of(line), line.split(",", 1)[1] if "," in line else ""))
    grouped = keyed.repartitionAndSortWithinPartitions(
        numPartitions=num_reducers,
        partitionFunc=portable_hash,
    )

    def reduce_partition(items: Iterator[tuple[str, str]]) -> Iterator[str]:
        current_key: str | None = None
        buf: list[str] = []
        for k, v in items:
            if k != current_key:
                if current_key is not None:
                    yield from reducer(current_key, iter(buf))
                current_key, buf = k, [v]
            else:
                buf.append(v)
        if current_key is not None:
            yield from reducer(current_key, iter(buf))

    reduced = grouped.mapPartitions(reduce_partition, preservesPartitioning=True)
    out = reduced.map(lambda v: (v,)).toDF(["value"])
    if output_path is not None:
        out.write.mode("overwrite").text(output_path)
    return out
