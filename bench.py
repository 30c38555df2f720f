"""Benchmark harness (BASELINE.md protocol).

Times every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``: 1 warm-up + N
timed runs (median), forcing full execution through the noop sink (a
plain ``count()`` would let Catalyst skip computing projected columns).

Output contract (driver-capture-safe — r1's single ~4 KB JSON line was
tail-truncated into ``parsed: null``):

1. stdout line 1: a SHORT summary JSON line
   ``{"metric": "suite_seconds", "value": <total>, "unit": "sec",
   "sf": ..., "nqueries": ..., "config": {...}}``
2. then one compact JSON line per query: ``{"q": <name>, "sec": <t>}``
   — each independently parseable, so any tail window of stdout still
   yields usable per-query data;
3. stdout LAST line: the same short summary repeated, so a tail-only
   capture ends with a complete parseable JSON line;
4. the full result (summary + complete queries map) is also written to
   ``BENCH_LOCAL.json`` next to this script.

Set ``BENCH_GATE=1`` to additionally diff fresh timings against the
frozen per-query baselines in BASELINE.json and exit nonzero if any
query exceeds 2x its baseline (the judge's perf gate, run locally).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from yet_another_map_reduce_spark.queries import QUERIES  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402

TIMED_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
GATE_RATIO = 2.0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _load_baseline() -> dict[str, float]:
    """Frozen per-query medians from BASELINE_QUERIES.json (one row per query)."""
    path = os.path.join(REPO_ROOT, "BASELINE_QUERIES.json")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        data = json.load(fh)
    return {k: float(v) for k, v in data["queries"].items()}


def _summary(timings: dict[str, float], sf: str) -> dict:
    return {
        "metric": "suite_seconds",
        "value": round(sum(t for t in timings.values() if t > 0), 4),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "nqueries": len(timings),
        "errors": sorted(n for n, t in timings.items() if t < 0),
        "config": {
            "master": f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
            "timed_runs": TIMED_RUNS,
        },
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = [q for q in sys.argv[1:] if not q.startswith("-")]
    spark = build_session(app_name="yamr-bench")
    load = os.getloadavg()[0]
    if load > 4.0:
        print(
            f"BENCH WARN: loadavg {load:.1f} - co-tenant process running; "
            "gate readings from this run are upper bounds, re-measure idle "
            "before freezing or diagnosing drift",
            file=sys.stderr,
        )

    # global warmup: absorb JVM/JIT + parquet-reader cold start so the
    # FIRST registry entry's timed runs aren't inflated by shared-infra
    # compilation (per-query warmups don't cover cross-query JIT; the
    # first-listed query otherwise reads ~2x its steady-state time
    # purely from registry position)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _force(li.groupBy("l_returnflag").count())
    _force(li.orderBy("l_orderkey").limit(10))
    _force(li.join(li.limit(100), "l_orderkey"))

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
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

    spark.stop()
    summary = _summary(timings, sf)
    summary_line = json.dumps(summary, separators=(",", ":"))

    full = dict(summary)
    full["queries"] = timings
    if not only:  # subset runs must not clobber the full-suite record
        with open(os.path.join(REPO_ROOT, "BENCH_LOCAL.json"), "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)

    print(summary_line)
    for name, sec in timings.items():
        print(json.dumps({"q": name, "sec": sec}, separators=(",", ":")))
    print(summary_line)

    if os.environ.get("BENCH_GATE") == "1":
        baseline = _load_baseline()
        over = {
            n: (t, baseline[n], round(t / baseline[n], 2))
            for n, t in timings.items()
            if t > 0 and n in baseline and baseline[n] > 0 and t / baseline[n] > GATE_RATIO
        }
        missing = sorted(n for n in timings if n not in baseline)
        for n, (t, b, r) in sorted(over.items(), key=lambda kv: -kv[1][2]):
            print(f"GATE FAIL {n}: {t:.3f}s vs baseline {b:.3f}s ({r}x)", file=sys.stderr)
        if missing:
            print(f"GATE WARN no baseline row for: {', '.join(missing)}", file=sys.stderr)
        if over:
            sys.exit(1)


if __name__ == "__main__":
    main()
