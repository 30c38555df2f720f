"""BPE-at-realistic-vocabulary measurement (BASELINE.md §"BPE at
realistic vocabulary", r8 verdict item 1).

Two claims, both previously asserted-not-measured:

1. TRAIN cost is driven by vocabulary words, not merge count — the
   incremental heap/delta trainer touches only words containing the
   merged pair (Zipf tail: few), so 16k merges costs about the same as
   8k on the same word table.
2. ENCODE cost tracks DISTINCT words per batch, not merge count — the
   Arrow tier's per-task memo means a 16k-merge table tokenizes the
   same corpus in about the time of a 48-merge table, and a 10× corpus
   costs ~10× (corpus-linear, as tokenization must be).

Protocol mirrors scale_check.py: noop-write force, warmup + median of
3, one warm local[32] session.  The encoder is pinned to the ARROW
tier at every merge count (bpe_tokens_arrow directly, not dispatch) so
the comparison isolates merge-table size.

Usage: python scripts/bpe_scale.py [replica_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from yet_another_map_reduce_spark.operators import text  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402
from yet_another_map_reduce_spark.sources.readers import read_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
MERGE_COUNTS = (48, 8192, 16384)
N_WORDS = 20000


def encode_median(spark, sf_dir: str, merges: list, runs: int = 3) -> float:
    d = read_table(spark, sf_dir, "documents")
    tok = text.bpe_tokens_arrow(merges)

    def force():
        (
            d.select(
                F.explode(tok(F.col("text"))).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    force()  # warmup
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        force()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica"
    t0 = time.perf_counter()
    wc = text.synthetic_word_counts(N_WORDS)
    print(f"vocab gen: {N_WORDS} words in {time.perf_counter() - t0:.2f}s")

    tables: dict[int, list] = {}
    for nm in MERGE_COUNTS:
        t0 = time.perf_counter()
        tables[nm] = text.bpe_train_merges(wc, nm)
        print(
            f"train {nm:>6} merges / {N_WORDS} words: "
            f"{time.perf_counter() - t0:6.2f}s  (got {len(tables[nm])})"
        )

    spark = build_session()
    base: float | None = None
    for nm in MERGE_COUNTS:
        sec = encode_median(spark, SF01, tables[nm])
        flat = f"  ({sec / base:.2f}x the 48-merge time)" if base else ""
        if base is None:
            base = sec
        print(f"encode sf0.1   @ {nm:>6} merges: {sec:6.2f}s{flat}")

    if os.path.isdir(replica):
        sec1 = encode_median(spark, SF01, tables[8192])
        sec10 = encode_median(spark, replica, tables[8192])
        print(
            f"encode 10x     @   8192 merges: {sec10:6.2f}s "
            f"(ratio {sec10 / sec1:.2f}x on 10x docs)"
        )
    else:
        print(f"replica dir {replica} missing - skipped 10x row")


if __name__ == "__main__":
    main()
