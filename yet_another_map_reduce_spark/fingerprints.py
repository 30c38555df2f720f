"""Source fingerprints for the verification rotation.

The driver verifies a rotating window of queries each round; a query
whose plan was REWRITTEN after its last driver-green row is silently
stale — builder-side parity covers it, but the driver's DuckDB oracle
(the hard signal) has not seen the new plan.  A pure
oldest-green-first rotation ranks such a query BEHIND merely-stale
rows and can miss it for several rounds (round-7 verdict, item 1).

``query_fingerprint(name)`` hashes the query function's source plus
the source of every package-local function it transitively references
(through module attributes, nested code objects, and closure cells)
plus its oracle SQL.  ``scripts/record_fingerprints.py`` snapshots the
fingerprint of each query that went green in the latest CORRECTNESS
round — run it FIRST THING each round, before editing, while HEAD is
still exactly the code the driver verified.  ``ordered_queries()``
then ranks any green query whose CURRENT fingerprint differs from its
recorded green-time fingerprint (or that has no record at all) ahead
of merely-stale greens.

Over-approximation is deliberate: a whitespace edit to a shared
helper flips every caller's fingerprint and triggers re-verification
of them all.  That errs toward checking, never toward missing a
rewrite.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import types

_PKG = "yet_another_map_reduce_spark"

FINGERPRINTS_FILE = "QUERY_FINGERPRINTS.json"


def _transitive_sources(fn: types.FunctionType) -> list[str]:
    """Source of ``fn`` plus every package-local function it
    (transitively) references, deterministically ordered by qualified
    name.  References are found via code-object ``co_names`` (globals
    and module-attribute calls like ``dedup.minhash_lsh_pairs``),
    nested code objects (inner functions / lambdas), and closure
    cells."""
    sources: dict[str, str] = {}
    stack: list[types.FunctionType] = [fn]
    while stack:
        f = stack.pop()
        key = f"{f.__module__}.{f.__qualname__}"
        if key in sources:
            continue
        try:
            sources[key] = inspect.getsource(f)
        except (OSError, TypeError):
            sources[key] = f"<nosource:{key}>"
        g = getattr(f, "__globals__", {})
        names: set[str] = set()
        codes = [f.__code__]
        while codes:
            c = codes.pop()
            names.update(c.co_names)
            codes.extend(
                k for k in c.co_consts if isinstance(k, types.CodeType)
            )
        referenced: list[object] = [g.get(n) for n in sorted(names)]
        for cell in getattr(f, "__closure__", None) or ():
            try:
                referenced.append(cell.cell_contents)
            except ValueError:
                pass  # empty cell
        for obj in referenced:
            if isinstance(obj, types.FunctionType) and (
                obj.__module__ or ""
            ).startswith(_PKG):
                stack.append(obj)
            elif isinstance(obj, types.ModuleType) and (
                obj.__name__ or ""
            ).startswith(_PKG):
                # attribute-style call: include every function of the
                # module whose name also appears in co_names
                for an in sorted(names):
                    a = getattr(obj, an, None)
                    if isinstance(a, types.FunctionType) and (
                        a.__module__ or ""
                    ).startswith(_PKG):
                        stack.append(a)
    return [sources[k] for k in sorted(sources)]


def query_fingerprint(
    name: str,
    queries: dict | None = None,
    oracles: dict | None = None,
) -> str:
    """Stable hex digest of a registered query's transitive source +
    oracle SQL.  Changes iff the query's plan-producing code or its
    oracle contract changed."""
    if queries is None or oracles is None:
        from yet_another_map_reduce_spark.queries import ORACLES, QUERIES

        queries = queries if queries is not None else QUERIES
        oracles = oracles if oracles is not None else ORACLES
    h = hashlib.sha256()
    for part in _transitive_sources(queries[name]):
        h.update(part.encode("utf-8", "replace"))
        h.update(b"\0")
    sql = oracles.get(name)
    if sql is not None:
        h.update(sql.encode("utf-8", "replace"))
    return h.hexdigest()


def load_recorded(root: str) -> dict[str, dict]:
    """``{query: {"fingerprint": hex|None, "round": N}}`` as committed
    by scripts/record_fingerprints.py; empty dict if absent."""
    try:
        with open(os.path.join(root, FINGERPRINTS_FILE)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def rewritten_since_green(
    root: str,
    green_queries: list[str],
    queries: dict | None = None,
    oracles: dict | None = None,
) -> set[str]:
    """Subset of ``green_queries`` whose current fingerprint differs
    from the recorded green-time fingerprint — including queries with
    no record (conservative: unverified provenance == rewritten)."""
    recorded = load_recorded(root)
    out: set[str] = set()
    for q in green_queries:
        rec = recorded.get(q)
        if not rec or not rec.get("fingerprint"):
            out.add(q)
            continue
        if query_fingerprint(q, queries, oracles) != rec["fingerprint"]:
            out.add(q)
    return out
