"""Measure the exact near-dup tier's quadratic-burn guard actually
saving the burn at scale (r8 verdict item 4).

At 100× the label blocks are ~20k rows — under the default
``max_block_rows=32768`` cap, so the registered query stays exact.  To
measure the guard ENGAGED we lower the cap to 8192 at the 100× replica:
every block then sub-splits in-task by the 3-plane sign signature
(up to 8 sub-blocks), cutting per-block pair-scan flops ~8×.  Rows:

1. exact, unguarded (``max_block_rows=None``) — the inherent
   within-block quadratic (r7: 57.5× at 100×);
2. guard ENGAGED (``max_block_rows=8192``) — the burn should collapse
   toward the LSH sibling's corpus-scaling;
3. the LSH variant (3 planes) — the advertised scale path, for
   reference.

Same protocol as scale_check.py: noop force, warmup + median of 3,
warm local[32].  Results → BASELINE.md §"BPE/guard" round-9 section.

Usage: python scripts/guard_burn.py [replica_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
sys.path.insert(0, ".")

from yet_another_map_reduce_spark.operators import dedup  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402
from yet_another_map_reduce_spark.sources.readers import read_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
KW = dict(id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35)


def median_time(make_df, spark, sf_dir, runs=3) -> tuple[float, int]:
    emb = read_table(spark, sf_dir, "embeddings")
    rows = make_df(emb).count()  # warmup + row count for the record

    def force():
        make_df(emb).write.format("noop").mode("overwrite").save()

    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        force()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), rows


VARIANTS = {
    "exact_unguarded": lambda e: dedup.embedding_near_dup_pairs_gram(
        e, max_block_rows=None, **KW
    ),
    "guard_engaged_8192": lambda e: dedup.embedding_near_dup_pairs_gram(
        e, max_block_rows=8192, guard_planes=3, **KW
    ),
    "lsh_3planes": lambda e: dedup.embedding_near_dup_pairs_lsh(
        e, num_planes=3, **KW
    ),
}


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_replica"
    spark = build_session()
    base: dict[str, float] = {}
    for name, mk in VARIANTS.items():
        sec, n = median_time(mk, spark, SF01)
        base[name] = sec
        print(f"sf0.1  {name:>20}: {sec:7.2f}s  ({n} pairs)")
    for name, mk in VARIANTS.items():
        sec, n = median_time(mk, spark, replica)
        print(
            f"100x   {name:>20}: {sec:7.2f}s  ({n} pairs, "
            f"ratio {sec / base[name]:.1f}x)"
        )


if __name__ == "__main__":
    main()
