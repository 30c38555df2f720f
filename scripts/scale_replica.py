"""Build an N× fact-replica of a testdata sf directory for scaling
measurements (BASELINE.md §"Second-scale validation").

The driver only generates up to sf0.1; the 100 TB design claims
("shuffles move only summary rows", "corpus read exactly once") are
about SCALING BEHAVIOR, so we validate them by re-running the most
expensive queries on a 10× replica and checking the time ratio.

Replication rule: fact tables (customer supplier part orders lineitem
events documents embeddings) are unioned N times with every key column
offset by ``copy * (max_key + 1)`` — the SAME base for a key wherever
it appears (l_orderkey and o_orderkey share the orders base, o_custkey
shares the customer base, ...), so join fan-outs and group
cardinalities scale exactly N× with no cross-copy edges.  Dimension
tables (region nation) are copied as-is; nationkey references stay
valid.  Text/vector payloads are duplicated verbatim — dedup operators
see N× duplicate mass, which is the honest stress for them.

Usage: python scripts/scale_replica.py [src_sf_dir] [out_dir] [N]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_replica"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> (table that defines its base). Every occurrence of the
# key column (in any table) is offset by the same base.
KEY_BASE_TABLE = {
    "c_custkey": "customer",
    "o_custkey": "customer",
    "s_suppkey": "supplier",
    "l_suppkey": "supplier",
    "p_partkey": "part",
    "l_partkey": "part",
    "o_orderkey": "orders",
    "l_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}
BASE_KEY_OF_TABLE = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
FACTS = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
DIMS = ["region", "nation"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    bases: dict[str, int] = {}
    for t, key in BASE_KEY_OF_TABLE.items():
        (mx,) = con.execute(
            f"SELECT max({key}) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()
        bases[t] = int(mx) + 1
    # user_id lives in events but is not events' primary key; give it
    # its own base so per-user densities stay constant across copies
    (mx_uid,) = con.execute(
        f"SELECT max(user_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    user_base = int(mx_uid) + 1

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t in FACTS:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(N):
            exprs = []
            for c in cols:
                if c == "user_id":
                    exprs.append(f"user_id + {i * user_base} AS user_id")
                elif c in KEY_BASE_TABLE:
                    exprs.append(
                        f"{c} + {i * bases[KEY_BASE_TABLE[c]]} AS {c}"
                    )
                else:
                    exprs.append(c)
            selects.append(
                "SELECT "
                + ", ".join(exprs)
                + f" FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        (n,) = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows ({N}x)")


if __name__ == "__main__":
    main()
