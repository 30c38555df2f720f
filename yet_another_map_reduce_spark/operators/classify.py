"""Distributed classifier training over DataFrame aggregates.

A training-data pipeline doesn't just APPLY quality filters — it
trains them (fastText-style quality classifiers fitted on labeled
web-text samples).  The training loop here is the batch perceptron:
per iteration, ONE corpus-wide aggregate computes the summed gradient
of the misclassified set, and the model update happens driver-side on
a feature-count-sized vector.  This is the same distributed-iterative
shape as `similarity.kmeans_train` (reference semantics: the
reference repo has no ML surface; this extends the engine's
LLM-pipeline operators):

- the corpus never leaves the executors — each iteration shuffles ONE
  row per partition (the partial sums of `sum(CASE misclassified)`
  fold map-side, exactly like any hash aggregate);
- the driver holds only the weight vector (KB-scale; the documented
  `.collect()` bound every trainer in this repo observes);
- with integer features and unit learning rate the arithmetic is
  EXACT (no float summation-order drift), so training is bit-for-bit
  reproducible across engines and partitionings — a DuckDB oracle can
  replay the whole loop as nested CTEs and hash-match the weights.

Scale notes (100 TB): per-iteration cost is one scan of the (narrow,
integer) feature relation.  Callers should materialize features once
(`materialize=True` local-checkpoints the projected relation) so the
text-parsing work isn't re-run per iteration; the checkpoint holds
`1 + len(feature_cols)` longs per document.  Weight magnitudes grow
with corpus mass (w ~ sum of feature values), so margins fit int64
for ~3-5 iterations at 10^9+ docs with raw count features; production
runs at larger iteration counts scale features down and score with
the AVERAGED model (:func:`perceptron_train_averaged` — integer-exact
cumulative weight sums, same per-iteration cost and the same
nested-CTE oracle pattern), which damps the late-iteration
oscillation the raw final weights suffer on non-separable corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from yet_another_map_reduce_spark.localrel import local_relation


def perceptron_train(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    iterations: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Batch (parallel-update) perceptron: per iteration, every
    currently-misclassified example contributes ``y * x`` to one summed
    update, applied once — the textbook batch variant, chosen over the
    sequential online rule because a per-row sequential update cannot
    be expressed as a parallel aggregate (it is order-dependent),
    while the batch update is a plain ``sum`` with map-side partials.

    ``label_col`` must be +1 / -1; feature columns must be integral
    (cast to long here).  A constant bias feature is prepended.  The
    zero-initialized model classifies everything as misclassified in
    iteration 1 (margin 0 counts as a miss, per the perceptron
    convention), so iteration 1's update is ``sum(y*x)`` over the
    whole corpus.

    Returns a model-sized DataFrame: one row per iteration with the
    misclassified count BEFORE the update and the weights AFTER it —
    the full training trajectory, not just the final model.  EAGER:
    training runs ``iterations`` Spark jobs at call time (the same
    documented contract as ``similarity.cosine_topk`` and
    ``kmeans_train`` — the result is derived from collected
    model-sized aggregates, not a lazy plan over the input).

    Implementation: delegates to :func:`perceptron_train_averaged`
    (identical per-iteration aggregate; the running-sum bookkeeping it
    adds is driver-side integer adds on a feature-count-sized vector,
    i.e. free) and drops the ``s*`` columns — so a fix to the training
    loop can never apply to one trainer and silently miss the other.
    """
    n = len(feature_cols)
    return perceptron_train_averaged(
        df, label_col, feature_cols, iterations, materialize
    ).select("iteration", "n_mis", *[f"w{k}" for k in range(n + 1)])


def perceptron_train_averaged(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    iterations: int = 5,
    materialize: bool = True,
) -> DataFrame:
    """Averaged batch perceptron (Freund & Schapire 1999): train
    exactly like :func:`perceptron_train`, but ALSO accumulate the
    running sum of the post-update weight vectors; scoring with that
    sum is sign-equivalent to scoring with the average ``sum/T`` and
    stays INTEGER-exact (no division anywhere), so the full trajectory
    — per-iteration weights AND cumulative sums — replays as nested
    CTEs in any SQL engine.

    This is the documented production arm for realistic iteration
    counts (module docstring): the raw perceptron's final ``w`` is
    whatever the last update left — late iterations ping-pong on a
    non-separable corpus and the model's variance grows with the
    iteration count — while the average damps those oscillations
    (each intermediate model votes once).  The per-iteration cost and
    shuffle shape are IDENTICAL to the plain trainer: one corpus-wide
    aggregate with map-side partials; the driver additionally holds
    one more feature-count-sized integer vector.

    Returns one row per iteration: ``n_mis`` before the update,
    weights ``w{k}`` after it, and cumulative sums ``s{k}`` =
    Σ_{t<=it} w{k}(t) — score production traffic with the LAST row's
    ``s`` vector.
    """
    n = len(feature_cols)
    feats = df.select(
        F.col(label_col).cast("long").alias("y"),
        F.lit(1).cast("long").alias("x0"),
        *[
            F.col(c).cast("long").alias(f"x{i + 1}")
            for i, c in enumerate(feature_cols)
        ],
    )
    if materialize:
        feats = feats.localCheckpoint(eager=False)

    w = [0] * (n + 1)
    s = [0] * (n + 1)
    trajectory: list[tuple] = []
    for it in range(1, iterations + 1):
        margin = sum(
            (F.lit(w[k]) * F.col(f"x{k}") for k in range(1, n + 1)),
            F.lit(w[0]) * F.col("x0"),
        )
        mis = (F.col("y") * margin) <= 0
        row = feats.agg(
            F.sum(F.when(mis, 1).otherwise(0)).alias("n_mis"),
            *[
                F.sum(F.when(mis, F.col("y") * F.col(f"x{k}")).otherwise(0)).alias(
                    f"g{k}"
                )
                for k in range(n + 1)
            ],
        ).collect()[0]
        w = [w[k] + (row[f"g{k}"] or 0) for k in range(n + 1)]
        s = [s[k] + w[k] for k in range(n + 1)]
        trajectory.append((it, row["n_mis"] or 0, *w, *s))

    schema = (
        "iteration long, n_mis long, "
        + ", ".join(f"w{k} long" for k in range(n + 1))
        + ", "
        + ", ".join(f"s{k} long" for k in range(n + 1))
    )
    return local_relation(df.sparkSession, trajectory, schema)


def _margin(weights: list[int], feature_cols: list[str]):
    """Shared margin expression (bias first) for the scorer and the
    gate — ONE definition so a fix can never apply to one and silently
    miss the other (the perceptron_train delegation rationale).  The
    length check matters: zip silently truncates, so a weights list
    missing the bias would apply the first feature weight AS the bias
    and drop the last feature — every margin silently wrong."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"expected {len(feature_cols) + 1} weights (bias first) for "
            f"{len(feature_cols)} features, got {len(weights)}"
        )
    return sum(
        (F.lit(w) * F.col(c).cast("long") for w, c in zip(weights[1:], feature_cols)),
        F.lit(weights[0]),
    )


def perceptron_score(
    df: DataFrame,
    weights: list[int],
    feature_cols: list[str],
    id_col: str,
) -> DataFrame:
    """Score rows with a trained weight vector (bias first): returns
    (id, margin, predicted ±1).  Map-only — the model ships as plan
    literals, same as k-means assignment; no shuffle, no Python."""
    margin = _margin(weights, feature_cols)
    return df.select(
        F.col(id_col),
        margin.alias("margin"),
        F.when(margin > 0, 1).otherwise(-1).alias("predicted"),
    )


def quality_gate(
    df: DataFrame,
    weights: list[int],
    feature_cols: list[str],
    threshold: int = 0,
) -> DataFrame:
    """The production shape of a trained quality filter in an ingestion
    pipeline: append ``margin``/``predicted`` from frozen weights (bias
    first) and keep rows with ``margin > threshold``.

    Stateless select + filter with the model as plan literals, so the
    SAME call works on a batch DataFrame and on a ``readStream``
    (micro-batch scoring needs no state store, no watermark, no
    shuffle — each arriving row is gated independently; pinned by
    tests/test_streaming.py::test_streaming_quality_gate_matches_batch).
    Unlike :func:`perceptron_score` it keeps the full payload, since a
    gate's consumers want the documents, not just the verdicts."""
    margin = _margin(weights, feature_cols)
    return df.withColumns(
        {
            "margin": margin,
            "predicted": F.when(margin > 0, 1).otherwise(-1),
        }
    ).where(F.col("margin") > F.lit(int(threshold)))
