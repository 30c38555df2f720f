"""Measure the pyavro DataSource against parquet at sf0.1 — honest
numbers for BASELINE.md: pyavro is a Python DataSource (every row
crosses the JVM->Python boundary through the codec), so it is NOT
expected to match parquet's columnar scan; what must hold is
(a) linear-ish write/read scaling, (b) split reads actually fanning a
single container across tasks, and (c) correctness at table scale.

Usage: python scripts/avro_scale.py [sf_dir] (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yet_another_map_reduce_spark.session import build_session  # noqa: E402
from yet_another_map_reduce_spark.sources import avro_format  # noqa: E402
from yet_another_map_reduce_spark.sources.readers import read_table  # noqa: E402


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        sys.exit(f"usage: avro_scale.py [sf_dir]; not a directory: {sf_dir}")
    spark = build_session()
    avro_format.register(spark)
    tmp = tempfile.mkdtemp(prefix="avro_scale_")
    try:
        # lineitem is the largest table (~11 MB parquet / ~600k rows at
        # sf0.1) — a row-shaped workload with numerics, dates, strings
        li = read_table(spark, sf_dir, "lineitem")
        n = li.count()

        res: dict = {"sf_dir": sf_dir, "rows": n}

        for codec in ("deflate", "null"):
            out = os.path.join(tmp, f"li_{codec}")
            t, _ = timed(
                lambda: li.write.format("pyavro")
                .option("codec", codec)
                .mode("overwrite")
                .save(out)
            )
            size = sum(
                os.path.getsize(os.path.join(out, f))
                for f in os.listdir(out)
                if f.endswith(".avro")
            )
            res[f"write_{codec}_s"] = round(t, 3)
            res[f"size_{codec}_mb"] = round(size / 1e6, 2)

        pq_out = os.path.join(tmp, "li_parquet")
        t, _ = timed(
            lambda: li.write.mode("overwrite").parquet(pq_out)
        )
        res["write_parquet_s"] = round(t, 3)

        # full-scan read + aggregate (forces decode of every row)
        src = os.path.join(tmp, "li_deflate")
        t, got = timed(
            lambda: spark.read.format("pyavro")
            .load(src)
            .agg(F.sum("l_quantity"), F.count("*"))
            .collect()
        )
        res["read_full_s"] = round(t, 3)
        assert got[0][1] == n, f"row loss: {got[0][1]} != {n}"

        t, _ = timed(
            lambda: spark.read.parquet(pq_out)
            .agg(F.sum("l_quantity"), F.count("*"))
            .collect()
        )
        res["read_parquet_s"] = round(t, 3)

        # split fan-out: ONE container, tiny split size -> many tasks
        one = os.path.join(tmp, "li_one")
        li.coalesce(1).write.format("pyavro").option("codec", "null").mode(
            "overwrite"
        ).save(one)
        whole = spark.read.format("pyavro").load(one)
        res["unsplit_partitions"] = whole.rdd.getNumPartitions()
        t, _ = timed(lambda: whole.agg(F.count("*")).collect())
        res["read_one_unsplit_s"] = round(t, 3)
        split = (
            spark.read.format("pyavro")
            .option("split_bytes", 4 * 1024 * 1024)
            .load(one)
        )
        res["split_partitions"] = split.rdd.getNumPartitions()
        t, got = timed(lambda: split.agg(F.count("*")).collect())
        res["read_one_split_s"] = round(t, 3)
        assert got[0][0] == n
        res["split_speedup"] = round(
            res["read_one_unsplit_s"] / max(res["read_one_split_s"], 1e-9), 2
        )
        print(json.dumps(res))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
