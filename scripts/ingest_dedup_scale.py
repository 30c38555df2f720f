"""Measure incremental_dedup's per-batch cost vs SEEN-relation size —
the scale claim behind the r11 join inversion: a micro-batch dedup
against a 100×-larger accumulated corpus should cost only the extra
map-only columnar scan of the fingerprint relation (no shuffle of
seen, no broadcast of seen), i.e. grow far slower than 100×.

Builds two on-disk fingerprint relations (sf0.1 documents; the same
replicated 100×) and times the SAME 500-doc batch dedup against each.

Usage: python scripts/ingest_dedup_scale.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yet_another_map_reduce_spark.operators import dedup  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402
from yet_another_map_reduce_spark.sources.readers import read_table  # noqa: E402


def main() -> None:
    load = os.getloadavg()[0]
    if load > 4.0:
        print(f"WARNING: loadavg {load:.1f} — readings may be contaminated")
    spark = build_session(app_name="ingest-dedup-scale")
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    batch = docs.where(F.col("doc_id") < 500)

    seen1 = "/tmp/ingest_seen_1x"
    seen100 = "/tmp/ingest_seen_100x"
    if not os.path.exists(seen1):
        dedup.batch_fingerprints(docs, "text").write.parquet(seen1)
    if not os.path.exists(seen100):
        # 100 replicas of the fp relation, salted so the relation is
        # genuinely 100x distinct rows (not a dedupable copy)
        fps = spark.read.parquet(seen1)
        reps = spark.range(100).select(F.col("id").alias("rep"))
        (
            fps.crossJoin(reps)
            .select(
                F.when(F.col("rep") == 0, F.col("fp"))
                .otherwise(F.md5(F.concat_ws(":", "fp", "rep")))
                .alias("fp")
            )
            .write.parquet(seen100)
        )

    for name, path in (("1x", seen1), ("100x", seen100)):
        seen = spark.read.parquet(path)
        n = seen.count()

        def run():
            t0 = time.perf_counter()
            dedup.incremental_dedup(
                batch, seen, "text", "doc_id", seen_fp_col="fp"
            ).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run()  # warm
        ts = [run() for _ in range(5)]
        print(
            f"seen={name} rows={n}: median {statistics.median(ts):.3f}s "
            f"(runs {[round(t, 3) for t in ts]})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
