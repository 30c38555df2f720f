"""Re-freeze (or first-freeze) named per-query baseline rows from the
latest full-suite BENCH_LOCAL.json, appending the cause to the
provenance note — the BASELINE.md §2 protocol's mechanical step, so a
deliberate plan change is re-frozen the same session it lands instead
of rotting into fake gate drift (the r6 verdict's protocol-debt
finding).

Usage: python scripts/freeze_rows.py "<cause note>" query [query ...]
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    note, names = sys.argv[1], sys.argv[2:]
    fresh = json.loads((REPO / "BENCH_LOCAL.json").read_text())["queries"]
    bq_path = REPO / "BASELINE_QUERIES.json"
    bq = json.loads(bq_path.read_text())
    missing = [n for n in names if n not in fresh]
    if missing:
        sys.exit(f"not in BENCH_LOCAL.json: {missing}")
    for n in names:
        old = bq["queries"].get(n)
        bq["queries"][n] = fresh[n]
        print(f"{n}: {old if old is not None else '(first freeze)'} -> {fresh[n]}")
    bq["frozen"] = bq["frozen"] + f"; {note}"
    bq_path.write_text(json.dumps(bq, indent=1, sort_keys=True) + "\n")
    print(f"froze {len(names)} rows")


if __name__ == "__main__":
    main()
