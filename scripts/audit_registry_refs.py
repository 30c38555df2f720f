"""Audit: operator functions never referenced by queries.py, with their
test-reference counts — the r11 scan that caught a registry row inlining
its own logic (dedup_incremental) instead of calling the operator the
pipeline runs, plus five wrapper functions with zero coverage anywhere.

Interpretation guide:
- tests=0 AND not referenced by other operator source => dead surface:
  cover it or delete it;
- tests>0 but no registry reference => decide whether the operator is
  SQL-expressible and deserves an oracle row (the strongest check), or
  is legitimately pytest-only (side effects, streaming, model training).

Usage: python scripts/audit_registry_refs.py
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPS = os.path.join(ROOT, "yet_another_map_reduce_spark", "operators")


def main() -> None:
    queries_src = open(
        os.path.join(ROOT, "yet_another_map_reduce_spark", "queries.py")
    ).read()
    rows = []
    for mod in sorted(os.listdir(OPS)):
        if not mod.endswith(".py") or mod.startswith("_"):
            continue
        tree = ast.parse(open(os.path.join(OPS, mod)).read())
        for node in tree.body:
            # identifier-boundary match, not substring: a name that is a
            # prefix of another identifier (hash_embed vs
            # hash_embed_dense) must not count as covered (r11 ADVICE)
            if (
                isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not node.name.startswith("_")
                and not re.search(rf"\b{re.escape(node.name)}\b", queries_src)
            ):
                n_tests = subprocess.run(
                    ["grep", "-rlw", node.name, os.path.join(ROOT, "tests")],
                    capture_output=True, text=True,
                ).stdout.count("\n")
                rows.append((f"{mod[:-3]}.{node.name}", n_tests))
    rows.sort(key=lambda r: (r[1], r[0]))
    bad = 0
    for name, n_tests in rows:
        flag = "  <-- ZERO coverage" if n_tests == 0 else ""
        if n_tests == 0:
            bad += 1
        print(f"{name:45s} tests={n_tests}{flag}")
    print(f"\n{len(rows)} operator functions unreferenced by the registry; "
          f"{bad} with zero test references")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
