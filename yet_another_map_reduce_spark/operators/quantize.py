"""Shared numpy quantizer matching the oracle's rounding rule.

The numpy fast paths (cosine_topk scores, IVF probe ranking, k-means
assignment, the gram prefilter, SemDeDup's cell prune) quantize
similarities before ranking/thresholding so the DuckDB oracle can
replay them despite accumulation-order drift.  ``np.round`` is
round-half-to-EVEN, while Spark's ``F.round`` (java HALF_UP on the
exact BigDecimal of the double) and DuckDB's ``round()`` are
half-AWAY-FROM-ZERO — on a double exactly on a decimal half-boundary
(dyadics such as 0.0078125) the three engines would disagree and a
quantized argmax/threshold could flip vs the oracle (round-7 ADVICE,
item 1).  Cosines and unit dot products are bounded in [-1, 1], so the
scaled ``|x| * 10^d + 0.5`` stays far inside exact float range and
``floor`` implements half-up without overflow concerns.

All numpy quantization in this package MUST go through
:func:`round_half_up`; tests pin its agreement with Spark and DuckDB
on half-boundary dyadics.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, digits: int):
    """Element-wise round-half-away-from-zero to ``digits`` decimals.

    Matches ``F.round`` (Spark, HALF_UP) and ``round()`` (DuckDB) on
    every double whose scaled value is exactly representable — in
    particular all dyadic half-boundary cases where ``np.round``'s
    banker's rounding diverges.  NaN/±inf propagate unchanged.
    """
    scale = 10.0 ** digits
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
