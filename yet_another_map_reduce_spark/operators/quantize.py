"""Shared numpy quantizer matching the oracle's rounding rule.

The numpy fast paths (cosine_topk scores, IVF probe ranking, k-means
assignment, the gram prefilter, SemDeDup's cell prune) quantize
similarities before ranking/thresholding so the DuckDB oracle can
replay them despite accumulation-order drift.  ``np.round`` is
round-half-to-EVEN, while DuckDB's ``round()`` is half-AWAY-FROM-ZERO
on the scaled double — on a double exactly on a decimal half-boundary
(dyadics such as 0.0078125) the engines would disagree and a quantized
argmax/threshold could flip vs the oracle (round-7 ADVICE, item 1).

Implementation note: the tie test compares the EXACT fractional part
(``y - floor(y)`` is exact in float64 for ``|y| < 2^52``) against 0.5
rather than computing ``floor(y + 0.5)`` — the addition would round a
value one ulp BELOW a half boundary (e.g. ``nextafter(0.5, 0)``) up to
the boundary and mis-round it upward where DuckDB/C ``round`` rounds
down (round-8 ADVICE; regression-pinned in test_quantize.py).

Residual divergence class, documented not fixed: Spark's ``F.round``
is NOT a double-domain rounding — it converts through
``BigDecimal.valueOf(double)``, i.e. the SHORTEST DECIMAL
REPRESENTATION of the double, then applies HALF_UP in decimal.  A
non-dyadic double that prints as an exact half (``0.285`` at 2 digits:
the double is 0.28499999999999998..., but its shortest repr is
"0.285") therefore rounds UP in Spark while numpy/DuckDB — both
operating on the scaled double, which is strictly below the half —
round DOWN.  :func:`round_half_up` deliberately matches the DuckDB
oracle side; the package's hot paths quantize values produced by
float arithmetic (cosines, dot products), for which landing exactly on
a shortest-repr half is the measure-zero case, and the three-engine
agreement tests pin every dyadic boundary where it matters.

All numpy quantization in this package MUST go through
:func:`round_half_up`; tests pin its agreement with Spark and DuckDB
on half-boundary dyadics, and with DuckDB on ulp-below-half cases.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, digits: int):
    """Element-wise round-half-away-from-zero to ``digits`` decimals.

    Matches DuckDB ``round()`` on every finite double (same scaled
    double, same tie rule, and — unlike ``floor(y + 0.5)`` — no
    spurious round-up one ulp below a half boundary), and Spark
    ``F.round`` everywhere except the shortest-decimal-repr half class
    documented in the module docstring.  NaN/±inf propagate unchanged.
    """
    scale = 10.0 ** digits
    x = np.asarray(x, dtype=np.float64)
    y = np.abs(x) * scale
    with np.errstate(invalid="ignore"):
        f = np.floor(y)
        # y - f is exact (|y| < 2^52 for any plausible quantization),
        # so the tie test sees the true fractional part of the scaled
        # double; NaN/inf yield NaN here, making the condition False
        # and leaving f (NaN/inf) to propagate through the result
        up = (y - f) >= 0.5
        return np.sign(x) * np.where(up, f + 1.0, f) / scale
