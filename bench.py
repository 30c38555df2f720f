"""Benchmark harness (BASELINE.md protocol).

Times every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``: 1 warm-up + N
timed runs (median), forcing full execution through the noop sink (a
plain ``count()`` would let Catalyst skip computing projected columns).

Prints ONE JSON line:
    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yet_another_map_reduce_spark.queries import QUERIES  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402

TIMED_RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="yamr-bench")

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        try:
            _force(fn(spark, sf_dir))  # warm-up (plan compile, file listing)
            samples = []
            for _ in range(TIMED_RUNS):
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as exc:  # noqa: BLE001
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    result = {
        "metric": "suite_seconds",
        "value": round(sum(t for t in timings.values() if t > 0), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "config": {
            "master": f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
            "timed_runs": TIMED_RUNS,
            "spark_version": spark.version,
        },
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
