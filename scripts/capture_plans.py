"""Capture .explain("formatted") for named queries into plans/r16/.

Usage:
    python scripts/capture_plans.py before <query> [query ...]
    python scripts/capture_plans.py after  <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from yet_another_map_reduce_spark import plans  # noqa: E402
from yet_another_map_reduce_spark.queries import QUERIES  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT, exist_ok=True)
    spark = build_session(app_name="capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = plans.formatted_plan(df)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
