"""round_half_up: the one rounding rule shared by all three engines.

The numpy operator paths quantize with :func:`round_half_up`; the
oracle replays with DuckDB ``round()`` and the expression paths with
Spark ``F.round``.  These tests pin three-engine agreement exactly on
the half-boundary dyadics where ``np.round`` (banker's) diverges —
the round-7 ADVICE failure mode."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from yet_another_map_reduce_spark.operators.quantize import round_half_up

# (value, digits): doubles exactly on a decimal half-boundary, where
# half-even and half-up disagree
HALF_BOUNDARY = [
    (0.0078125, 6),   # 2^-7 -> ...2.5e-6; banker's gives 0.007812
    (-0.0078125, 6),
    (0.0625, 3),      # 62.5 -> banker's 0.062, half-up 0.063
    (-0.0625, 3),
    (2.5, 0),
    (-2.5, 0),
    (0.5, 0),
    (0.328125, 5),    # 21/64 -> 32812.5
]


@pytest.mark.parametrize("x,d", HALF_BOUNDARY)
def test_half_up_diverges_from_bankers_and_matches_duckdb(x, d):
    got = float(round_half_up(x, d))
    # sanity: these cases genuinely exercise the tie rule
    assert got != float(np.round(x, d)) or abs(x) in (0.5,), (x, d)
    (duck,) = duckdb.sql(
        f"SELECT round(CAST({x!r} AS DOUBLE), {d})"
    ).fetchone()
    assert got == duck, (x, d, got, duck)


def test_half_up_matches_spark_f_round(spark):
    rows = [(x, d) for x, d in HALF_BOUNDARY]
    for x, d in rows:
        (got,) = spark.range(1).select(
            F.round(F.lit(x), d).alias("r")
        ).first()
        assert float(round_half_up(x, d)) == got, (x, d, got)


def test_half_up_off_boundary_matches_np_round():
    rng = np.linspace(-1.0, 1.0, 4001)  # typical cosine range
    a = round_half_up(rng, 6)
    b = np.round(rng, 6)
    # off-boundary values agree with np.round (half-boundary hits in a
    # linspace of irrational-step floats are measure-zero)
    assert np.allclose(a, b, atol=1e-12)


def test_half_up_ulp_below_half_rounds_down_like_duckdb():
    """r8 ADVICE regression: with the old ``floor(y + 0.5)`` scheme, a
    scaled value one ulp BELOW a half boundary was rounded up (the
    addition lands exactly on 1.0), diverging from DuckDB/C round.
    The exact-fraction tie test must round it down."""
    cases = [
        (np.nextafter(0.5, 0.0), 0, 0.0),     # 0.49999999999999994
        (-np.nextafter(0.5, 0.0), 0, -0.0),
        (np.nextafter(2.5, 0.0), 0, 2.0),
        (np.nextafter(0.0000005, 0.0), 6, 0.0),
    ]
    for x, d, want in cases:
        got = float(round_half_up(x, d))
        assert got == want, (x, d, got)
        (duck,) = duckdb.sql(
            f"SELECT round(CAST({x!r} AS DOUBLE), {d})"
        ).fetchone()
        assert got == duck, (x, d, got, duck)


def test_spark_shortest_repr_half_divergence_is_the_documented_class(spark):
    """0.285's double is strictly below the 2-digit half boundary, but
    its SHORTEST DECIMAL REPR is "0.285", so Spark's BigDecimal-based
    F.round rounds UP while numpy and DuckDB — both rounding the scaled
    double — round DOWN.  This pins the module docstring's residual
    divergence class as real (and pins that we side with the DuckDB
    oracle on it): if a Spark upgrade changes this, the docstring and
    this test should be revisited together."""
    x = 0.285
    ours = float(round_half_up(x, 2))
    (duck,) = duckdb.sql("SELECT round(CAST(0.285 AS DOUBLE), 2)").fetchone()
    (spark_r,) = spark.range(1).select(F.round(F.lit(x), 2).alias("r")).first()
    assert ours == duck == 0.28
    assert spark_r == 0.29


def test_half_up_propagates_nan_inf():
    out = round_half_up(np.array([np.nan, np.inf, -np.inf, 0.0]), 6)
    assert np.isnan(out[0]) and out[1] == np.inf and out[2] == -np.inf
    assert out[3] == 0.0


def test_temperature_pow_weights_off_rounding_boundary(spark):
    """corpus_mixture_temperature puts pow(n, 0.7) inside a
    hash-verified path; pow is not required to be correctly rounded,
    and on THIS platform Java Math.pow and DuckDB's libm already
    differ by ~2 ulp (pow(82, 0.7): ...812 vs ...816) — the query
    hashes green only because no weight sits near a round(·, 6)
    boundary.  Pin that margin against the LIVE corpus language
    counts, engine by engine: (a) the engines' pows agree within a
    few ulps, (b) both engines' weights round to the SAME 6-digit
    value, (c) every weight's distance from the nearest 0.5e-6
    rounding boundary is > 1e6 ulp-equivalents, so a few-ulp libm
    change cannot flip the rounded value silently — it would have to
    show up here first."""
    import math

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        duck_rows = duckdb.sql(
            "SELECT n, pow(n, 0.7) FROM (SELECT count(*) AS n FROM "
            f"read_parquet('{sf}/documents.parquet') GROUP BY lang)"
        ).fetchall()
        assert duck_rows
        counts = [int(n) for n, _ in duck_rows]
        spark_pows = {
            int(r["n"]): r["p"]
            for r in spark.createDataFrame([(n,) for n in counts], "n long")
            .select("n", F.pow(F.col("n"), F.lit(0.7)).alias("p"))
            .collect()
        }
        nn = sum(counts)
        z_duck = sum(p for _, p in duck_rows)
        z_spark = sum(spark_pows[n] for n in counts)
        for n, duck_pow in duck_rows:
            n = int(n)
            ulp = math.ulp(duck_pow)
            assert abs(duck_pow - spark_pows[n]) <= 4 * ulp, (
                n, duck_pow, spark_pows[n],
            )
            w_duck = (duck_pow / z_duck) / (n / nn)
            w_spark = (spark_pows[n] / z_spark) / (n / nn)
            assert float(round_half_up(w_duck, 6)) == float(
                round_half_up(w_spark, 6)
            ), (n, w_duck, w_spark)
            for w in (w_duck, w_spark):
                frac = (w * 1e6) % 1.0
                dist = abs(frac - 0.5)  # distance from the half boundary
                # 1 ulp of w*1e6 is ~2^-52 * w * 1e6; demand 1e6× margin
                assert dist > 1e6 * (2.0**-52) * max(w * 1e6, 1.0), (
                    n, w, dist,
                )
