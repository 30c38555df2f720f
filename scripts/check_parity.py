"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names/order-insensitive
sorted values.  Exits nonzero on any mismatch.

Usage:
    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from yet_another_map_reduce_spark.queries import ORACLES, QUERIES  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402
from yet_another_map_reduce_spark.sources.readers import TABLES  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize timestamp resolutions (duckdb: us, spark: ns)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        errs.append(f"columns spark={s_cols} duck={d_cols}")
        return errs
    if errs:
        return errs
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver hashes raw dtypes, so an int64-vs-float64 (or object)
        # skew fails its gate even when values compare equal here — e.g.
        # duckdb sum(BIGINT) -> HUGEINT -> float64.  Flag kind mismatches.
        if sv.dtype.kind != dv.dtype.kind and not (
            sv.dtype.kind in "iu" and dv.dtype.kind in "iu"
        ):
            errs.append(
                f"col {c}: dtype kind mismatch spark={sv.dtype} duck={dv.dtype} "
                "(driver value-hash would differ even if values agree)"
            )
            continue
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sa = sv.astype(float).to_numpy()
            da = dv.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(da)
            neq = ~(both_nan | (sa == da))
            if neq.any():
                i = int(np.argmax(neq))
                errs.append(
                    f"col {c}: {int(neq.sum())} value diffs, first at row {i}: "
                    f"spark={sa[i]!r} duck={da[i]!r} (maxabs="
                    f"{np.nanmax(np.abs(np.where(both_nan, 0, sa - da)))})"
                )
        else:
            neq = ~(sv.eq(dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                errs.append(
                    f"col {c} ({sv.dtype}/{dv.dtype}): {int(neq.sum())} diffs, "
                    f"first at row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
                )
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures[name] = [f"SPARK ERROR: {type(exc).__name__}: {exc}"]
            print(f"FAIL  {name}: spark error {exc}")
            continue
        t1 = time.time()
        if name not in ORACLES:
            print(f"ok*   {name}: rows={len(spark_pdf)} (rows-only, {t1-t0:.1f}s)")
            if len(spark_pdf) == 0:
                failures[name] = ["rows-only query returned 0 rows"]
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures[name] = [f"DUCKDB ERROR: {type(exc).__name__}: {exc}"]
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        t2 = time.time()
        errs = compare(name, spark_pdf, duck_pdf)
        if errs:
            failures[name] = errs
            print(f"FAIL  {name}: rows={len(spark_pdf)} ({t1-t0:.1f}s/{t2-t1:.1f}s)")
            for e in errs:
                print(f"      {e}")
        else:
            print(f"ok    {name}: rows={len(spark_pdf)} ({t1-t0:.1f}s spark, {t2-t1:.1f}s duck)")

    print(f"\n{len(failures)} failures / {len(QUERIES) if not only else len(only)} queries")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
