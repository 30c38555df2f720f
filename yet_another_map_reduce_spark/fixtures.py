"""Shared deterministic benchmark/test fixtures.

These generators exist so a measurement script and the test that pins
its claims draw from the SAME geometry — a tweak to one cannot
silently decouple the frozen BASELINE.md numbers from the pinned
assertions.  Everything is seeded; no wall-clock or os randomness.
"""

from __future__ import annotations


def planted_anisotropic(spark, n_clusters: int, per: int, dim: int, seed: int = 7):
    """Overlapping ANISOTROPIC clusters — the geometry where IVF
    recall slopes with the probed fraction (used by
    ``scripts/probe_fraction_recall.py`` and
    ``tests/test_plans.py::test_probe_fraction_slopes_recall_on_overlapping_clusters``):
    centers drawn with sigma comparable to the within-cluster spread
    (N(0, 0.4)) and per-axis scales U(0.05, 1), so a vector's true
    cosine neighborhood straddles several IVF cells.

    Returns ``(vec_id long, embedding array<double>)`` with values
    6-rounded for cross-engine replayability."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 0.4, (n_clusters, dim))
    scales = rng.uniform(0.05, 1.0, (n_clusters, dim))
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(0.0, 1.0, (per, dim)) * scales[c]
        for p in pts:
            rows.append((vid, [round(float(x), 6) for x in p]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")
